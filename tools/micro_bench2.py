#!/usr/bin/env python
"""Round 2: gather index patterns, 1-key sort payloads, scatter-add, scans."""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


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


def dt(name, fn, *args, iters=8):
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
    float(loop())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop())
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = max(statistics.median(ts) - FLOOR, 0.0) / iters
    print(f"{name:48s} {ms:9.3f} ms", flush=True)
    return ms


def main():
    global FLOOR
    print("devices:", jax.devices(), file=sys.stderr)
    FLOOR = measure_floor()
    print(f"sync floor: {FLOOR:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    N, C = 3_000_000, 6_000_000
    feats = jax.random.normal(key, (N, 16), dtype=jnp.float32)

    ids_rand = jnp.asarray(rng.integers(0, N, C, dtype=np.int32))
    ids_mono = jnp.sort(ids_rand)
    # clustered: random base per 512-window + small offsets (Morton-like)
    base = rng.integers(0, N - 4096, -(-C // 512), dtype=np.int32)
    ids_clust = jnp.asarray(
        (np.repeat(base, 512)[:C] + rng.integers(0, 4096, C, dtype=np.int32))
    )

    # dt("row gather 3Mx16 [6M random]", lambda f: f[ids_rand], feats, iters=3)
    # dt("row gather 3Mx16 [6M monotonic]", lambda f: f[ids_mono], feats, iters=3)
    # dt("row gather 3Mx16 [6M clustered4k]", lambda f: f[ids_clust], feats, iters=3)

    col = feats[:, 0].copy()
    # dt("1-D gather 3M [6M monotonic]", lambda f: f[ids_mono], col, iters=3)

    # 1-key sorts: key dtype and payload scaling
    k_i32 = jnp.asarray(rng.integers(0, 2**31 - 1, C, dtype=np.int32))
    k_u32 = k_i32.view(jnp.uint32) if hasattr(k_i32, "view") else k_i32.astype(jnp.uint32)
    k_f32 = jax.random.normal(key, (C,), dtype=jnp.float32)
    vid = jnp.arange(C, dtype=jnp.int32)
    vals = [jax.random.normal(key, (C,), dtype=jnp.float32) for _ in range(16)]

    dt("sort 6M 1key i32 +id", lambda k: jax.lax.sort((k, vid), num_keys=1, is_stable=True), k_i32, iters=3)
    dt("sort 6M 1key u32 +id", lambda k: jax.lax.sort((k, vid), num_keys=1, is_stable=True), k_u32, iters=3)
    dt("sort 6M 1key f32 +id", lambda k: jax.lax.sort((k, vid), num_keys=1, is_stable=True), k_f32, iters=3)
    dt("sort 6M 1key i32 +4 f32", lambda k: jax.lax.sort((k, *vals[:4]), num_keys=1, is_stable=True), k_i32, iters=3)
    dt("sort 6M 1key i32 +8 f32", lambda k: jax.lax.sort((k, *vals[:8]), num_keys=1, is_stable=True), k_i32, iters=3)
    dt("sort 6M 1key i32 +16 f32", lambda k: jax.lax.sort((k, *vals[:16]), num_keys=1, is_stable=True), k_i32, iters=2)

    # scatter-add histogram (bincount) with random indices
    tid = jnp.asarray(rng.integers(0, 2040, C, dtype=np.int32))
    dt("bincount 6M into 2040", lambda z: z.at[tid].add(1), jnp.zeros((2040,), jnp.int32), iters=3)

    # segment-start scatter + forward-fill via associative_scan (8 fields)
    npos = rng.choice(C, N, replace=False).astype(np.int32)
    npos.sort()
    pos = jnp.asarray(npos)
    fields = [jax.random.normal(key, (N,), dtype=jnp.float32) for _ in range(8)]

    def ffill8(fs):
        written = jnp.zeros((C,), jnp.float32).at[pos].set(1.0)
        scat = [jnp.zeros((C,), jnp.float32).at[pos].set(f) for f in fs]

        def comb(a, b):
            bw = b[0]
            return (jnp.maximum(a[0], bw),) + tuple(
                jnp.where(bw > 0, y, x) for x, y in zip(a[1:], b[1:])
            )

        out = jax.lax.associative_scan(comb, (written, *scat))
        return out[1:]

    dt("scatter+ffill scan 8 fields 6M", ffill8, fields, iters=2)

    # fast exp approximation vs jnp.exp
    big = jax.random.uniform(key, (4096, 2048), dtype=jnp.float32, minval=-20, maxval=0)

    def fast_exp(x):
        # 2^(x*log2e) via int bit trick + cubic correction
        y = x * 1.4426950408889634
        yi = jnp.floor(y)
        yf = y - yi
        # 2^yf ~ poly
        p = 1.0 + yf * (0.6931471 + yf * (0.2401597 + yf * 0.0558027))
        ex = (yi.astype(jnp.int32) + 127) << 23
        ex = jnp.where(yi < -126, 0, ex)
        return p * jax.lax.bitcast_convert_type(
            jnp.clip(ex, 0, 254 << 23), jnp.float32
        )

    dt("jnp.exp 8.4M", lambda x: jnp.exp(x), big, iters=8)
    dt("fast_exp 8.4M", fast_exp, big, iters=8)
    err = float(jnp.max(jnp.abs(fast_exp(big) - jnp.exp(big))))
    print(f"  fast_exp max abs err on [-20,0]: {err:.2e}", flush=True)

    # exp in bf16
    bigb = big.astype(jnp.bfloat16)
    dt("jnp.exp 8.4M bf16", lambda x: jnp.exp(x), bigb, iters=8)


if __name__ == "__main__":
    main()
