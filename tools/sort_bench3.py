#!/usr/bin/env python
"""Round-2 decisive sort measurements (tunnel-safe, args-as-params dt).

Three numbers that pick the sort redesign (docs/sort_plan.md):
  A  9-row stable sort @12.8M  — the production shape, clean methodology
     (round-1's 118 ms was measured with closure-baked inputs).
  B  9-row BATCHED sort (8, 1.6M) — the per-depth-slab partitioned shape.
  C  9-row single sort @1.6M — the knee point B amortizes against.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/sort_bench3.py [N_mega]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from gaussianrenderer_tpu.utils.timing import measure_floor  # noqa: E402


FLOOR = None


def dt(name, fn, *args, iters=6):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            bit = (i & 1).astype(jnp.uint32)
            args_i = [a[0] ^ bit] + list(a[1:])
            out = fn(*args_i)
            s = sum(
                jnp.sum(l.astype(jnp.float32)[..., :8])
                for l in jax.tree_util.tree_leaves(out)
            )
            return acc + s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(loop(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = max(statistics.median(ts) - FLOOR, 0.0) / iters
    log(f"{name:52s} {ms:9.3f} ms   (compile {compile_s:.0f}s)")
    return ms


def main():
    global FLOOR
    log(f"devices: {jax.devices()}")
    FLOOR = measure_floor()
    log(f"floor: {FLOOR:.1f} ms")

    rng = np.random.default_rng(0)
    C = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 12_800_000

    def mk(rows, *shape):
        return jnp.asarray(
            rng.integers(0, 2**32, size=(rows, *shape), dtype=np.uint64).astype(
                np.uint32
            )
        )

    def sort9(x):
        return jax.lax.sort(
            tuple(x[i] for i in range(9)), dimension=-1, num_keys=1, is_stable=True
        )

    # C: knee point first (fastest compile — fail fast if methodology breaks)
    xc = mk(9, C // 8)
    dt(f"C 9-row single @ {C/8e6:.2f}M", sort9, xc)

    # B: batched per-slab shape
    xb = mk(9, 8, C // 8)
    dt(f"B 9-row batched 8 x {C/8e6:.2f}M", sort9, xb)

    # A: production shape
    xa = mk(9, C)
    dt(f"A 9-row single @ {C/1e6:.1f}M", sort9, xa)

    # D: the Gaussian-scale depth sort a depth-slab pipeline would add
    # (key + 14 payload rows: rows10 + packed tile-rect/aux).
    N = 3_200_000
    xd = mk(15, N)

    def sort15(x):
        return jax.lax.sort(
            tuple(x[i] for i in range(15)), dimension=-1, num_keys=1, is_stable=True
        )

    dt(f"D 15-row single @ {N/1e6:.1f}M (gaussian depth sort)", sort15, xd)


if __name__ == "__main__":
    main()
