#!/usr/bin/env python
"""Selection-gather shape experiments (the 120 ms emission surprise, r2).

The wide-tier selection gathers 16 per-Gaussian arrays by a k_sel-long
index vector. Measured cost blew up with fine ladders (k_sel ~1M →
~120 ms), consistent with the ~8 ns/element scalar-core gather rule.
Questions:
  G1  16 separate 1-D gathers (the current emission shape)
  G2  ONE (N, 16) row gather by the same indices (contiguous 64 B rows —
      per-row or per-element cost?)
  G3  ONE (16, N) lane-axis gather a[:, idx] (vectorized over the 16
      sublanes?)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/gather_bench.py
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


def dt(name, fn, *args, iters=8):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            idx = (a[0] + i) % a[0].shape[0]  # perturb indices per iter
            out = fn(idx, *a[1:])
            s = sum(
                jnp.sum(l.astype(jnp.float32)[..., :8].astype(jnp.float32))
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
    log(f"{name:44s} {ms:9.3f} ms   (compile {compile_s:.0f}s)")
    return ms


def main():
    global FLOOR
    log(f"devices: {jax.devices()}")
    FLOOR = measure_floor()
    log(f"floor: {FLOOR:.1f} ms")

    rng = np.random.default_rng(0)
    N = 3_000_000
    K = 1_000_000
    idx = jnp.asarray(rng.permutation(N)[:K].astype(np.int32))
    cols = [
        jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
        for _ in range(16)
    ]
    mat_rows = jnp.stack(cols, axis=1)  # (N, 16)
    mat_lanes = jnp.stack(cols, axis=0)  # (16, N)

    def g1(idx, *cols):
        return tuple(c[idx] for c in cols)

    def g2(idx, m):
        return m[idx, :]

    def g3(idx, m):
        return m[:, idx]

    dt(f"G2 (N,16) row gather   k={K/1e6:.1f}M", g2, idx, mat_rows)
    dt(f"G3 (16,N) lane gather  k={K/1e6:.1f}M", g3, idx, mat_lanes)
    dt(f"G1 16x 1-D gathers     k={K/1e6:.1f}M", g1, idx, *cols)


if __name__ == "__main__":
    main()
