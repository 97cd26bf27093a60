#!/usr/bin/env python
"""Sustained frame-rate measurement on the real TPU.

The axon tunnel has a ~28 ms sync round-trip and a non-blocking
block_until_ready, so per-frame wall timing is meaningless. Here `frames`
jitted steps are chained on-device inside one fori_loop (camera params
perturbed per iteration so XLA cannot hoist) and synced once; the floor is
subtracted.
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--compositor", default="packed")
    ap.add_argument("--instance-multiplier", type=float, default=8.0)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tier-boost", type=int, default=0)
    args = ap.parse_args()

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.render import _render_impl
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene

    log(f"devices: {jax.devices()}")
    floor = measure_floor()
    log(f"sync floor: {floor:.1f} ms")

    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor=args.compositor,
        instance_multiplier=args.instance_multiplier,
        chunk_size=args.chunk,
        tier_boost=args.tier_boost,
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

    log(
        f"cfg: {cfg.width}x{cfg.height} tiles {cfg.tiles_x}x{cfg.tiles_y} "
        f"({cfg.tile_w}x{cfg.tile_h}) compositor={cfg.compositor} "
        f"capacity={cfg.instance_capacity(scene.num_gaussians)}"
    )

    frames = args.frames

    def loop(scene, params):
        def body(i, acc):
            eps = i.astype(jnp.float32) * 1e-30
            p = params._replace(position=params.position + eps)
            fb, stats = _render_impl(scene, p, cfg)
            return acc + fb[0, 0, 0] + fb[0, -1, -1]

        return jax.lax.fori_loop(0, frames, body, jnp.float32(0.0))

    jl = jax.jit(loop)
    t0 = time.perf_counter()
    float(jl(scene, params))
    log(f"compile+first: {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jl(scene, params))
        ts.append((time.perf_counter() - t0) * 1e3)
    wall = statistics.median(ts)
    ms = max(wall - floor, 0.0) / frames
    log(f"wall={wall:.1f}ms floor={floor:.1f}ms frames={frames}")
    print(f"ms/frame: {ms:.3f}")

    # stats for one frame
    fb, stats = jax.jit(lambda s, p: _render_impl(s, p, cfg))(scene, params)
    log(
        f"instances={int(stats.num_instances)} culled={int(stats.num_culled)} "
        f"overflow={bool(stats.overflow)}"
    )


if __name__ == "__main__":
    main()
