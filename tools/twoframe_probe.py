#!/usr/bin/env python
"""Cross-frame overlap probe: F frames inside ONE jit executable.

PERF_NOTES "round-4 candidate levers": the three frame components (area
sort, frame sort, compositor) are each at a measured structural floor for
the single-frame graph; the remaining unexplored angle is whether XLA
overlaps INDEPENDENT frames' stages when both live in one executable
(frame t's VPU/MXU-bound compositor against frame t+1's memory-bound
sorts). This probe builds a jit that renders ``--frames-per-exec``
independent frames (distinct camera params, no data dependence between
them beyond the shared scene) and consumes each framebuffer into a
scalar, then times chained dispatch exactly like bench.py.

Run once with --frames-per-exec 1 and once with 2 (separate processes —
one large executable per process, PERF_NOTES methodology); compare
ms/frame. Equal numbers = the scheduler serializes frames (lever closed);
lower at 2 = real cross-frame overlap.

Usage (the c4 headline shape):
  python tools/twoframe_probe.py --frames-per-exec 1 --tiers <ladder>
  python tools/twoframe_probe.py --frames-per-exec 2 --tiers <ladder>
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
    ap.add_argument("--frames", type=int, default=24, help="orbit poses")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames-per-exec", type=int, default=2)
    ap.add_argument(
        "--chain-frames",
        type=int,
        default=4,
        help="frames per sync (dispatches per chain = this / frames-per-exec)",
    )
    ap.add_argument("--tiers", required=True, help="explicit ladder m:k,...")
    ap.add_argument("--out", default="twoframe_probe.jsonl")
    args = ap.parse_args()
    if args.chain_frames % args.frames_per_exec:
        ap.error("--chain-frames must be a multiple of --frames-per-exec")

    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.render import _render_impl, parse_tiers
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.utils import enable_compilation_cache
    from gaussianrenderer_tpu.utils.timing import measure_floor

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    scene = make_random_scene(
        args.gaussians, seed=0, extent=4.0, scale_range=(0.004, 0.03)
    ).morton_sorted().prepared()

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

    floor = measure_floor()
    log(f"sync floor: {floor:.1f} ms")

    F = args.frames_per_exec

    @functools.partial(jax.jit, static_argnames=())
    def render_multi(scene, *params):
        acc = jnp.float32(0.0)
        for p in params:
            fb, _ = _render_impl(scene, p, cfg)
            acc = acc + fb[0, 0, 0]
        return acc

    frame_params = []
    for _ in range(args.frames):
        cam.orbit(360.0 / args.frames, 0.0)
        frame_params.append(
            jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x)),
                cam.params(cfg.k_sigma),
            )
        )

    t0 = time.time()
    float(render_multi(scene, *frame_params[:F]))
    log(f"first dispatch (compile+run, {F} frames/exec): {time.time()-t0:.1f}s")

    # Group poses into executions of F frames, executions into chains of
    # chain_frames total frames, one sync per chain (bench.py methodology).
    execs = [
        frame_params[i : i + F] for i in range(0, len(frame_params) - F + 1, F)
    ]
    per_chain = args.chain_frames // F
    chains = [execs[i : i + per_chain] for i in range(0, len(execs), per_chain)]

    def run_chain(ch):
        out = None
        for group in ch:
            out = render_multi(scene, *group)
        return float(out)

    run_chain(chains[0][:1])  # warm
    walls = []
    for _ in range(args.reps):
        for ch in chains:
            nf = sum(len(g) for g in ch)
            t0 = time.perf_counter()
            run_chain(ch)
            walls.append(((time.perf_counter() - t0) * 1e3 - floor) / nf)
    ms = statistics.median(walls)
    log(
        f"frames/exec={F} chain={args.chain_frames} frames/sync: "
        f"median {ms:.3f} ms/frame (n={len(walls)})"
    )

    rec = {
        "probe": "twoframe",
        "frames_per_exec": F,
        "chain_frames": args.chain_frames,
        "ms_per_frame": round(ms, 3),
        "walls_ms": [round(w, 2) for w in walls],
        "sync_floor_ms": round(floor, 2),
        "tiers": args.tiers,
        "resolution": f"{args.width}x{args.height}",
        "gaussians": args.gaussians,
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
