#!/usr/bin/env python
"""Per-stage device timing of the render pipeline (real TPU).

Times each pipeline stage in isolation with block_until_ready, mirroring the
reference's cudaEvent per-kernel timing (SURVEY.md §5 tracing).
"""

import argparse
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--compositor", default="pallas")
    ap.add_argument("--instance-multiplier", type=float, default=8.0)
    args = ap.parse_args()

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.ops.compositing import (
        build_features,
        composite_tiles_xla,
        gather_sorted_features,
    )
    from gaussianrenderer_tpu.ops.pallas.tile_render import composite_tiles_pallas
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
    from gaussianrenderer_tpu.ops.tiling import build_sorted_instances
    from gaussianrenderer_tpu.render import render_frame
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene

    log(f"devices: {jax.devices()}")
    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor=args.compositor,
        instance_multiplier=args.instance_multiplier,
    )
    scene = make_random_scene(args.gaussians, seed=0).to_device()
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
        f"({cfg.tile_w}x{cfg.tile_h}), capacity={capacity}"
    )

    # Stage 1: preprocess
    pre = jax.jit(
        functools.partial(
            preprocess_gaussians,
            width=cfg.width,
            height=cfg.height,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            sh_degree=cfg.sh_degree,
        )
    )
    t_pre, proj = timeit(pre, scene, params)
    log(f"preprocess:        {t_pre:8.3f} ms")

    # Stage 2: tiling + sort
    tile_fn = jax.jit(
        functools.partial(
            build_sorted_instances,
            tiles_x=cfg.tiles_x,
            num_tiles=cfg.num_tiles,
            capacity=capacity,
            depth_scale=cfg.depth_scale,
        )
    )
    t_tile, assignment = timeit(tile_fn, proj)
    log(f"tiling+sort:       {t_tile:8.3f} ms  (instances={int(assignment.total_instances)})")

    # Stage 3: features + gather
    feat_fn = jax.jit(build_features)
    t_feat, feats = timeit(feat_fn, proj)
    log(f"build_features:    {t_feat:8.3f} ms")

    gather_fn = jax.jit(
        functools.partial(gather_sorted_features, chunk_size=cfg.chunk_size)
    )
    t_gather, sorted_feats = timeit(gather_fn, feats, assignment)
    log(f"gather_sorted:     {t_gather:8.3f} ms")

    # Stage 4: compositor
    if args.compositor == "pallas":
        comp = functools.partial(
            composite_tiles_pallas,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            width=cfg.width,
            height=cfg.height,
            chunk_size=cfg.chunk_size,
        )
    else:
        comp = jax.jit(
            functools.partial(
                composite_tiles_xla,
                tiles_x=cfg.tiles_x,
                tiles_y=cfg.tiles_y,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
                width=cfg.width,
                height=cfg.height,
                chunk_size=cfg.chunk_size,
            )
        )
    t_comp, fb = timeit(comp, sorted_feats, assignment.tile_start, assignment.tile_count)
    log(f"compositor({args.compositor}): {t_comp:8.3f} ms")

    # Full fused frame
    t_full, _ = timeit(
        lambda s, p: render_frame(s, p, cfg), scene, params
    )
    log(f"full frame:        {t_full:8.3f} ms  (sum of stages {t_pre+t_tile+t_feat+t_gather+t_comp:.3f})")


if __name__ == "__main__":
    main()
