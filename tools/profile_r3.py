#!/usr/bin/env python
"""Round-3 frame-time decomposition at the c4 headline shape.

One stage per process (the tunneled backend destabilizes after several
large executables in one process — PERF_NOTES methodology): the driver
shell loop runs ``--stage X`` for each X and appends one JSON line per
stage to profile_r3.jsonl. All stages use bench.py's exact scene
(3M Morton, seed 0), camera, and HEAD calibrated ladder, measured with
the in-jit perturbing fori_loop (utils.timing.device_time).

Stages:
  pre        preprocess_gaussians
  emit       build_packed_instances(skip_sort=True)  — prepack + hist +
             area sort + windows + emission, no frame sort/bounds
  emit_nohist  emit with the 17-bucket area histogram skipped
  build      full build (emit + frame sort + tile bounds)
  comp       composite_tiles_packed on the built instances
  full       full _render_impl
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# HEAD c4 calibrated ladder (bench_details.json) — 7.55M sort lanes.
C4_TIERS = "1:1015808,2:1441792,3:1856,4:851968,6:25600,12:6144,16:256,32:256"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True)
    ap.add_argument("--gaussians", type=int, default=3_000_000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tiers", default=C4_TIERS)
    ap.add_argument("--chunk", type=int, default=0, help="0 = cfg default")
    ap.add_argument("--precision", default="highest",
                    choices=["default", "high", "highest"])
    ap.add_argument("--no-mxu-q", action="store_true",
                    help="direct VPU quadratic instead of the basis matmul")
    ap.add_argument("--term-stride", type=int, default=1,
                    help="early-term check cadence (0 = never check)")
    ap.add_argument("--dma-depth", type=int, default=2)
    ap.add_argument("--ply", default=None,
                    help="profile a scene FILE (e.g. data/trained_100k.ply"
                    " for the c7 shape) instead of the synthetic c4 scene")
    ap.add_argument("--sh-degree", type=int, default=2)
    ap.add_argument("--pos", default="0,1,8",
                    help="camera position x,y,z (c7 uses 3.9,1.5,3.9)")
    ap.add_argument("--out", default="profile_r3.jsonl")
    args = ap.parse_args()

    import jax

    from gaussianrenderer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
        composite_tiles_packed,
    )
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
    from gaussianrenderer_tpu.render import _render_impl, parse_tiers
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.utils.timing import device_time, measure_floor

    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor="packed",
        sh_degree=args.sh_degree,
        tiers=parse_tiers(args.tiers),
        **({"packed_chunk": args.chunk} if args.chunk else {}),
    )
    if args.ply:
        from gaussianrenderer_tpu.scene.io import load_ply

        scene = load_ply(
            args.ply, max_sh_degree=args.sh_degree
        ).morton_sorted().prepared()
    else:
        scene = make_random_scene(
            args.gaussians, seed=0, extent=4.0, scale_range=(0.004, 0.03)
        ).morton_sorted().prepared()
    cam = Camera()
    cam.set_position([float(v) for v in args.pos.split(",")])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(args.width / args.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cam.orbit(360.0 / 24, 0.0)  # first measured orbit pose, like bench.py
    params = cam.params(cfg.k_sigma)

    floor = measure_floor()
    log(f"floor: {floor:.1f} ms")

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
    build = functools.partial(
        build_packed_instances,
        tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        near=0.2,
        far=100.0,
        tiers=cfg.tiers,
    )

    t0 = time.time()
    stage = args.stage
    extra = {}
    if stage == "pre":
        ms = device_time(pre, scene, params, iters=args.iters, floor=floor)
    elif stage == "prebuild":
        # pre + build fused in ONE jit, exactly as the real frame graph
        # composes them — full − prebuild = the compositor's true
        # in-graph cost (standalone comp measurements are perturbation-
        # artifact-prone: all-int inputs).
        def prebuild(scene, params):
            return build(pre(scene, params))

        ms = device_time(prebuild, scene, params, iters=args.iters, floor=floor)
    elif stage == "chunkstats":
        import numpy as np

        proj = jax.jit(pre)(scene, params)
        inst = jax.jit(build)(proj)
        tc = np.asarray(inst.tile_count)
        k = args.chunk or cfg.packed_chunk
        extra = {
            "sum_count": int(tc.sum()),
            "max_count": int(tc.max()),
            "mean_count": float(tc.mean()),
            "sum_chunks": int(np.ceil(tc / k).sum()),
            "tiles_nonzero": int((tc > 0).sum()),
        }
        ms = 0.0
    elif stage in ("emit", "emit_nohist", "build"):
        proj = jax.jit(pre)(scene, params)
        proj = jax.tree_util.tree_map(lambda x: x.copy(), proj)
        kw = {}
        if stage == "emit":
            kw = dict(skip_sort=True)
        elif stage == "emit_nohist":
            kw = dict(skip_sort=True, _skip=("hist",))
        fn = functools.partial(build, **kw)
        ms = device_time(
            fn, proj, iters=args.iters, floor=floor, perturb_ints=False
        )
    elif stage in ("comp", "comp_check"):
        proj = jax.jit(pre)(scene, params)
        inst = jax.jit(build)(proj)
        feats = inst.packed_feats.copy()
        ts = inst.tile_start.copy()
        tc = inst.tile_count.copy()
        common = dict(
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            width=cfg.width,
            height=cfg.height,
        )
        comp = functools.partial(
            composite_tiles_packed,
            chunk=args.chunk or cfg.packed_chunk,
            precision=getattr(jax.lax.Precision, args.precision.upper()),
            mxu_q=not args.no_mxu_q,
            term_stride=args.term_stride,
            dma_depth=args.dma_depth,
            **common,
        )
        if stage == "comp_check":
            # On-device max |candidate − baseline| (scalars only fetched).
            import jax.numpy as jnp

            base = functools.partial(composite_tiles_packed, **common)

            @jax.jit
            def check(feats, ts, tc):
                a = comp(feats, ts, tc)
                b = base(feats, ts, tc)
                return jnp.max(jnp.abs(a - b)), jnp.mean(jnp.abs(a - b))

            mx, mean = check(feats, ts, tc)
            extra = {"max_abs_diff": float(mx), "mean_abs_diff": float(mean)}
            ms = 0.0
        else:
            ms = device_time(
                comp, feats, ts, tc, iters=args.iters, floor=floor
            )
    elif stage == "full":
        fn = functools.partial(_render_impl, cfg=cfg)
        ms = device_time(fn, scene, params, iters=args.iters, floor=floor)
    else:
        raise SystemExit(f"unknown stage {stage}")

    rec = {
        "stage": stage,
        "ms": round(ms, 3),
        "iters": args.iters,
        "floor_ms": round(floor, 2),
        "wall_s": round(time.time() - t0, 1),
        "tiers": args.tiers,
        "chunk": args.chunk or None,
        "precision": args.precision,
        "mxu_q": not args.no_mxu_q,
        "term_stride": args.term_stride,
        "dma_depth": args.dma_depth,
        **extra,
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
