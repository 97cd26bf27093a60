#!/usr/bin/env python
"""Headline benchmark: ms/frame at 1080p on a 3M-Gaussian scene (1 chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` is the BASELINE.md target (8 ms/frame) divided by the
measured frame time — ≥ 1.0 means the target is met, higher is better.

All human-readable progress goes to stderr; stdout carries only the JSON.
Extra per-stage timings land in bench_details.json (the JSONL-style perf
sink mirroring the reference's radix_test harness, SURVEY.md §4).
"""

import argparse
import json
import statistics
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=3_000_000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--compositor", default="pallas")
    ap.add_argument("--scene", default=None, help="optional PLY path")
    ap.add_argument("--instance-multiplier", type=float, default=4.0)
    ap.add_argument("--no-morton", action="store_true")
    ap.add_argument("--baseline-ms", type=float, default=8.0)
    args = ap.parse_args()

    import jax

    log(f"devices: {jax.devices()}")

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.render import make_renderer
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import load_ply, make_random_scene

    if args.scene:
        scene = load_ply(args.scene)
    else:
        # Synthetic stand-in for the MipNeRF-360 scale (bicycle ≈ 3M splats):
        # small anisotropic splats over a bounded volume.
        scene = make_random_scene(
            args.gaussians, seed=0, extent=4.0, scale_range=(0.004, 0.03)
        )
    if not args.no_morton:
        scene = scene.morton_sorted()
    log(f"scene: {scene.num_gaussians} gaussians")

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
        compositor=args.compositor,
        instance_multiplier=args.instance_multiplier,
    )
    render = make_renderer(scene, cfg)

    t0 = time.time()
    fb, stats = render(cam.params(cfg.k_sigma))
    fb.block_until_ready()
    log(
        f"compile+first frame: {time.time()-t0:.1f}s; "
        f"instances={int(stats.num_instances)} culled={int(stats.num_culled)} "
        f"overflow={bool(stats.overflow)}"
    )

    params = cam.params(cfg.k_sigma)
    for _ in range(args.warmup):
        fb, _ = render(params)
    fb.block_until_ready()

    # Camera orbit across the run (reference cull_sort_test's interactive
    # loop with EMA frame timing, cull_sort_test.cpp:52-64); params are
    # precomputed so the measurement isolates device time.
    frame_params = []
    for _ in range(args.frames):
        cam.orbit(3.0, 0.0)
        frame_params.append(cam.params(cfg.k_sigma))

    times = []
    for p in frame_params:
        t0 = time.perf_counter()
        fb, _ = render(p)
        fb.block_until_ready()
        times.append((time.perf_counter() - t0) * 1000.0)

    ms = statistics.median(times)
    log(
        f"frames={args.frames} median={ms:.3f} ms  mean={statistics.mean(times):.3f} "
        f"p90={sorted(times)[int(0.9*len(times))]:.3f} min={min(times):.3f}"
    )

    details = {
        "metric": "ms_per_frame",
        "resolution": f"{args.width}x{args.height}",
        "gaussians": scene.num_gaussians,
        "compositor": args.compositor,
        "median_ms": ms,
        "mean_ms": statistics.mean(times),
        "min_ms": min(times),
        "times_ms": times,
    }
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": f"ms/frame {args.width}x{args.height} {scene.num_gaussians/1e6:.1f}M gaussians",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(args.baseline_ms / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
