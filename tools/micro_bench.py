#!/usr/bin/env python
"""Micro-benchmarks of pipeline primitives on the real TPU.

Methodology (see tools/devtime.py): the axon tunnel has a ~30 ms sync
round-trip and a non-blocking block_until_ready, so each op runs `iters`
times inside one jitted fori_loop with i-dependent input perturbation and
full-output consumption (sum), synced once; floor-subtracted wall / iters.
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp


def measure_floor(reps=7):
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


FLOOR = None


def dt(name, fn, *args, iters=10):
    """Device ms/call: fn's full output is summed into the loop carry."""
    def body(i, acc):
        eps = i.astype(jnp.float32) * jnp.float32(1e-30)
        args_i = [
            a + eps.astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a
            for a in args
        ]
        out = fn(*args_i)
        s = sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(out)
        )
        return acc + s

    loop = jax.jit(lambda: jax.lax.fori_loop(0, iters, body, jnp.float32(0.0)))
    float(loop())  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop())
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = max(statistics.median(ts) - FLOOR, 0.0) / iters
    print(f"{name:44s} {ms:9.3f} ms")
    return ms


def main():
    global FLOOR
    print("devices:", jax.devices(), file=sys.stderr)
    FLOOR = measure_floor()
    print(f"sync floor: {FLOOR:.1f} ms")
    key = jax.random.PRNGKey(0)

    # sanity: known-FLOP matmul
    a = jax.random.normal(key, (8192, 8192), dtype=jnp.bfloat16)
    ms = dt("matmul 8192 bf16 (SOL ~5.6ms @197TF)", lambda a: a @ a, a, iters=5)
    if ms > 0:
        print(f"  -> {2*8192**3/ms/1e9:.0f} TFLOP/s")

    for C in (1_000_000, 4_000_000, 8_000_000):
        cname = f"{C//1_000_000}M"
        k1 = jax.random.randint(key, (C,), 0, 8100, dtype=jnp.int32)
        k2 = jax.random.normal(key, (C,), dtype=jnp.float32)
        vid = jnp.arange(C, dtype=jnp.int32)
        dt(f"sort {cname} 2key+id", lambda a, b: jax.lax.sort((a, b, vid), num_keys=2), k1, k2, iters=5)
        dt(f"sort {cname} 1key stable +id", lambda a: jax.lax.sort((a, vid), num_keys=1, is_stable=True), k1, iters=5)

    C = 4_000_000
    k1 = jax.random.randint(key, (C,), 0, 8100, dtype=jnp.int32)
    k2 = jax.random.normal(key, (C,), dtype=jnp.float32)
    vid = jnp.arange(C, dtype=jnp.int32)
    vals8 = [jax.random.normal(key, (C,), dtype=jnp.float32) for _ in range(8)]
    dt("sort 4M 2key+8xf32 payload", lambda a, b: jax.lax.sort((a, b, *vals8), num_keys=2), k1, k2, iters=3)

    for N, C in ((100_000, 800_000), (3_000_000, 6_000_000)):
        feats = jax.random.normal(key, (N, 16), dtype=jnp.float32)
        ids = jax.random.randint(key, (C,), 0, N, dtype=jnp.int32)
        dt(f"row gather ({N},16)[{C}]", lambda f: f[ids], feats, iters=5)
        col = feats[:, 0].copy()
        dt(f"1-D gather ({N},)[{C}]", lambda f: f[ids], col, iters=5)

    # scatter + cummax expansion building blocks
    N, C = 3_000_000, 6_000_000
    g = jnp.arange(N, dtype=jnp.int32)
    pos = jnp.sort(jax.random.randint(key, (N,), 0, C, dtype=jnp.int32))
    dt("scatter 3M ids into 6M", lambda z: z.at[pos].max(g), jnp.zeros((C,), jnp.int32), iters=5)
    x = jax.random.randint(key, (C,), 0, 100, dtype=jnp.int32)
    dt("cummax 6M int32", lambda x: jax.lax.cummax(x, axis=0), x, iters=5)
    xf = jax.random.normal(key, (C,), dtype=jnp.float32)
    dt("cumsum 6M f32", lambda x: jnp.cumsum(x), xf, iters=5)

    # VPU throughput: fused elementwise chain on (P,K)-ish 2-D data
    big = jax.random.normal(key, (4096, 2048), dtype=jnp.float32)  # 8.4M
    dt("exp 8.4M f32", lambda x: jnp.exp(x), big, iters=10)
    dt("10-op elementwise chain 8.4M f32", lambda x: ((x * 1.1 + 0.3) * (x - 0.2) + x * x) * (x + 0.7) - x * 0.5 + 1.0, big, iters=10)

    # searchsorted variants (the current expansion)
    N, C = 100_000, 800_000
    incl = jnp.cumsum(jnp.maximum(jax.random.randint(key, (N,), 0, 8), 0)).astype(jnp.int32)
    slots = jnp.arange(C, dtype=jnp.int32)
    dt("searchsorted scan 800k in 100k", lambda inc: jnp.searchsorted(inc, slots, side="right"), incl, iters=3)
    dt("searchsorted sort 800k in 100k", lambda inc: jnp.searchsorted(inc, slots, side="right", method="sort"), incl, iters=3)


if __name__ == "__main__":
    main()
