#!/usr/bin/env python
"""HBM footprint of a render executable via XLA's memory analysis.

``device.memory_stats()`` returns None through the dev tunnel, but the
compiled executable's ``memory_analysis()`` works — and it is the more
useful number anyway (peak buffer assignment, not a point-in-time
sample). Lowers the packed render at a given scene size / resolution /
ladder from ShapeDtypeStructs (no host->device upload of a real scene)
and prints the argument / output / temp / code byte split plus the
implied peak.

Usage (the c4 headline shape):
  python tools/hbm_budget.py --gaussians 3000000 --height 1080 \
      --width 1920 --tiers 1:1376256,2:1441792,...
"""

import argparse
import functools
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=3_000_000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--tiers", required=True)
    ap.add_argument("--out", default="hbm_budget.jsonl")
    args = ap.parse_args()

    import numpy as np
    import jax

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.render import _render_impl, parse_tiers
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # Tiny host-side scene → prepared() for the LAYOUT, then scale every
    # N-sized leading axis up to the requested count as ShapeDtypeStructs
    # (lowering needs shapes only; no 3M-splat host or device array).
    small_n = 4096
    small = make_random_scene(small_n, seed=0).morton_sorted().prepared()

    def scale(x):
        arr = np.asarray(x)
        shape = tuple(
            args.gaussians if d == small_n else d for d in arr.shape
        )
        return jax.ShapeDtypeStruct(shape, arr.dtype)

    shapes_scene = jax.tree_util.tree_map(scale, small)

    cam = Camera()
    cam.set_position([0.0, 1.0, 8.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(args.width / args.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor="packed",
        tiers=parse_tiers(args.tiers),
    )
    shapes_params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(np.asarray(x)), np.asarray(x).dtype),
        cam.params(cfg.k_sigma),
    )

    compiled = (
        jax.jit(functools.partial(_render_impl, cfg=cfg))
        .lower(shapes_scene, shapes_params)
        .compile()
    )
    ma = compiled.memory_analysis()
    rec = {
        "probe": "hbm_budget",
        "gaussians": args.gaussians,
        "resolution": f"{args.width}x{args.height}",
        "tiers": args.tiers,
        "argument_mb": round(ma.argument_size_in_bytes / 1e6, 1),
        "output_mb": round(ma.output_size_in_bytes / 1e6, 1),
        "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
        "code_mb": round(ma.generated_code_size_in_bytes / 1e6, 1),
        "peak_mb": round(
            (
                ma.argument_size_in_bytes
                + ma.output_size_in_bytes
                + ma.temp_size_in_bytes
                + ma.generated_code_size_in_bytes
            )
            / 1e6,
            1,
        ),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
