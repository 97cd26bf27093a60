#!/usr/bin/env python
"""Sub-stage profile of build_packed_instances (the ~95 ms residual, r2).

After the (17,N) selection-gather fix, the c4 frame still measures
~212 ms against a ~135 ms component model; the gap sits inside emission.
This times each emission sub-stage in isolation on the real chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_emit.py
"""

import functools
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
    from gaussianrenderer_tpu.utils.timing import device_time

    t0 = time.perf_counter()
    ms = device_time(fn, *args, iters=iters, floor=FLOOR, perturb_ints=False)
    log(f"{name:46s} {ms:9.3f} ms   ({time.perf_counter()-t0:.0f}s)")
    return ms


def main():
    global FLOOR
    from gaussianrenderer_tpu.ops.instances import (
        _emit_tier,
        _f32_bits,
        build_packed_instances,
    )
    from gaussianrenderer_tpu.ops.projection import ProjectedGaussians

    log(f"devices: {jax.devices()}")
    FLOOR = measure_floor()
    log(f"floor: {FLOOR:.1f} ms")

    N = 3_000_000
    rng = np.random.default_rng(0)
    # Realistic c4-like distribution: mostly 1-2 tile areas.
    tmin_x = rng.integers(0, 58, N).astype(np.int32)
    tmin_y = rng.integers(0, 32, N).astype(np.int32)
    w = np.minimum(1 + (rng.random(N) < 0.45) + (rng.random(N) < 0.08), 3).astype(np.int32)
    h = np.minimum(1 + (rng.random(N) < 0.45) + (rng.random(N) < 0.05), 3).astype(np.int32)
    valid = rng.random(N) < 0.97
    area = np.where(valid, w * h, 0)
    depth_q = rng.integers(0, 1 << 20, N).astype(np.uint32)
    rows9_np = [
        rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)
        for _ in range(9)
    ]
    # rows 0/1 are f32-bit centers — make them decode to sane floats
    rows9_np[0] = np.float32(rng.uniform(0, 1900, N)).view(np.uint32)
    rows9_np[1] = np.float32(rng.uniform(0, 1000, N)).view(np.uint32)
    r2max = np.float32(rng.uniform(10, 5000, N))

    d = jnp.asarray
    rows9 = tuple(d(r) for r in rows9_np)
    args_np = dict(
        tmin_x=d(tmin_x), tmin_y=d(tmin_y), w=d(w), h=d(h),
        valid=d(valid), area=d(area.astype(np.int32)),
        depth_q=d(depth_q), r2max=d(r2max),
    )

    # E-f: full emission (skip_sort) with the c4 ladder, real pipeline
    proj = ProjectedGaussians(
        valid=args_np["valid"],
        depth=d(rng.uniform(0.3, 50, N).astype(np.float32)),
        center_px=d(rng.uniform(0, 1900, (N, 2)).astype(np.float32)),
        conic=d(np.abs(rng.normal(0.1, 0.05, (N, 3))).astype(np.float32)),
        color=d(rng.random((N, 3)).astype(np.float32)),
        opacity=d(rng.random(N).astype(np.float32)),
        aabb_px=d(rng.integers(0, 1900, (N, 4)).astype(np.int32)),
        tile_min=d(np.stack([tmin_x, tmin_y], 1)),
        tile_max=d(np.stack([tmin_x + w - 1, tmin_y + h - 1], 1)),
    )
    tiers = ((2, 0), (3, 2048), (4, 917504), (6, 24576), (12, 3072))

    def build_skip(*skip):
        return functools.partial(
            build_packed_instances,
            tiles_x=60, tiles_y=34, tile_w=32, tile_h=32,
            tiers=tiers, skip_sort=True, _skip=tuple(skip),
        )

    dt("f0: FULL emission (skip_sort)", build_skip(), proj)
    dt("f1: emission minus hist", build_skip("hist"), proj)
    dt("f2: emission minus wide tiers", build_skip("wide"), proj)
    dt("f3: emission minus ellipse prune", build_skip("prune"), proj)
    dt("f4: emission minus all three", build_skip("hist", "wide", "prune"), proj)

    # h: the wide-selection primitives with PERTURBABLE f32 inputs (int-only
    # args get hoisted out of the timing loop — the a-e probes of the first
    # revision measured ~0 for exactly that reason).
    iota = jnp.arange(N, dtype=jnp.int32)
    area_f = args_np["area"].astype(jnp.float32)
    # v3 select matrix: depth + 6 packed rows (ops/instances.py).
    mat7 = jnp.stack([args_np["depth_q"]] + list(rows9[:6]), axis=0)

    def sel_sort_only(area_f, iota):
        a = area_f.astype(jnp.int32)
        k, idx = jax.lax.sort((-a, iota), num_keys=1, is_stable=True)
        return idx[:947_200]

    dt("h1: selection sort alone @3M", sel_sort_only, area_f, iota)

    def sel_sort_gather(area_f, iota, mat):
        a = area_f.astype(jnp.int32)
        _, idx = jax.lax.sort((-a, iota), num_keys=1, is_stable=True)
        return mat[:, idx[:947_200]]

    dt("h2: selection sort + (7,N) gather", sel_sort_gather, area_f, iota, mat7)

    build_sorted = functools.partial(
        build_packed_instances,
        tiles_x=60, tiles_y=34, tile_w=32, tile_h=32, tiers=tiers,
    )
    dt("g: FULL build (emit+sort+bounds)", build_sorted, proj)


if __name__ == "__main__":
    main()
