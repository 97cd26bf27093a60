#!/usr/bin/env python
"""Per-stage device timing of the packed pipeline (real TPU, loop-in-jit)."""

import argparse
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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


def dt(name, fn, *args, iters=8, perturb_ints=True):
    # Arrays MUST be jit arguments (not closures): at 3M-gaussian scale a
    # closed-over scene bakes >1 GB of constants into the HLO and the
    # remote compiler rejects it (HTTP 413).
    from gaussianrenderer_tpu.utils.timing import device_time

    t0 = time.perf_counter()
    ms = device_time(
        fn, *args, iters=iters, floor=FLOOR, perturb_ints=perturb_ints
    )
    log(f"{name:40s} {ms:9.3f} ms   (measured in {time.perf_counter()-t0:.0f}s)")
    return ms


def main():
    global FLOOR
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--instance-multiplier", type=float, default=8.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tiers", type=str, default=None,
                    help="m:k,m:k ladder (bench wire format)")
    args = ap.parse_args()

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import composite_tiles_packed
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene

    log(f"devices: {jax.devices()}")
    FLOOR = measure_floor()
    log(f"floor: {FLOOR:.1f} ms")

    tiers = None
    if args.tiers:
        from gaussianrenderer_tpu.render import parse_tiers

        tiers = parse_tiers(args.tiers)
    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor="packed",
        instance_multiplier=args.instance_multiplier,
        tiers=tiers,
    )
    scene = make_random_scene(args.gaussians, seed=0).prepared()
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(args.width / args.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    params = cam.params(cfg.k_sigma)
    capacity = cfg.instance_capacity(scene.num_gaussians)
    log(
        f"cfg: {cfg.width}x{cfg.height} tiles {cfg.tiles_x}x{cfg.tiles_y} "
        f"({cfg.tile_w}x{cfg.tile_h}) capacity={capacity}"
    )

    pre = functools.partial(
        preprocess_gaussians,
        width=cfg.width,
        height=cfg.height,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y,
        sh_degree=cfg.sh_degree,
    )
    dt("preprocess", pre, scene, params, iters=args.iters)
    proj = jax.jit(pre)(scene, params)
    proj = jax.tree_util.tree_map(lambda x: x.copy(), proj)

    build = functools.partial(
        build_packed_instances,
        tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        capacity=capacity,
        near=0.2,
        far=100.0,
        tiers=cfg.tiers,
    )
    # Emission-only (skip_sort): attributes build time to emission vs the
    # C-lane sort + tile boundaries (full build minus this).
    dt(
        "emit only (skip_sort)",
        functools.partial(build, skip_sort=True),
        proj,
        iters=args.iters,
        perturb_ints=False,
    )
    # perturb_ints=False: XOR on tile rects / packed bits would change the
    # emission workload; the float fields (centers, conics) still perturb.
    dt(
        "build_packed (expand+sort)",
        build,
        proj,
        iters=args.iters,
        perturb_ints=False,
    )
    inst = jax.jit(build)(proj)

    comp = functools.partial(
        composite_tiles_packed,
        tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        width=cfg.width,
        height=cfg.height,
        chunk=cfg.packed_chunk,
    )
    dt(
        "composite packed",
        comp,
        inst.packed_feats,
        inst.tile_start,
        inst.tile_count,
        iters=args.iters,
    )
    log(f"instances={int(inst.total_instances)} overflow={bool(inst.overflow)}")


if __name__ == "__main__":
    main()
