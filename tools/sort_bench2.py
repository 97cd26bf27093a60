#!/usr/bin/env python
"""Round-2 sort experiments on the real chip (tunnel-safe timing).

Questions this answers (PERF_NOTES.md / docs/sort_plan.md):
  E1  does `is_stable=False` make lax.sort cheaper?
  E2  does one BATCHED sort over (B, C/B) segments beat one (C,) sort?
      (quantifies the sub-4M knee for partitioned designs)
  E3  row-count scaling refresh (1 key + {0, 1, 3, 8} payload rows).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/sort_bench2.py
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
    """Loop fn in one jitted fori_loop, perturbing the key row per iter.

    args are threaded through the jit as PARAMETERS (closing over concrete
    arrays bakes them into the HLO as constants: 460 MB protos → remote
    compile HTTP 413, and payload rows become foldable constants)."""

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
    C = 12_800_000

    def mk(rows, c):
        return jnp.asarray(
            rng.integers(0, 2**32, size=(rows, c), dtype=np.uint64).astype(
                np.uint32
            )
        )

    # --- E3: row scaling at full size -------------------------------------
    for rows in (1, 2, 4, 9):
        x = mk(rows, C)

        def sort_rows(x):
            return jax.lax.sort(tuple(x[i] for i in range(x.shape[0])), num_keys=1, is_stable=True)

        dt(f"E3 stable sort  {rows} rows @ {C/1e6:.1f}M", sort_rows, x)

    # --- E1: stability ------------------------------------------------------
    x9 = mk(9, C)

    def sort_unstable(x):
        return jax.lax.sort(tuple(x[i] for i in range(9)), num_keys=1, is_stable=False)

    dt(f"E1 UNstable sort 9 rows @ {C/1e6:.1f}M", sort_unstable, x9)

    # --- E2: batched/partitioned ------------------------------------------
    for b in (4, 8, 16, 32):
        seg = C // b
        xb = mk(9, C).reshape(9, b, seg)

        def sort_batched(x):
            return jax.lax.sort(
                tuple(x[i] for i in range(9)), dimension=-1, num_keys=1, is_stable=True
            )

        dt(f"E2 batched stable sort 9 rows {b} x {seg/1e6:.2f}M", sort_batched, xb)

    # small single sorts for the knee curve
    for c in (400_000, 800_000, 1_600_000, 3_200_000):
        xs = mk(9, c)

        def sort_rows(x):
            return jax.lax.sort(tuple(x[i] for i in range(9)), num_keys=1, is_stable=True)

        dt(f"E2 single stable sort 9 rows @ {c/1e6:.2f}M", sort_rows, xs)


if __name__ == "__main__":
    main()
