#!/usr/bin/env python
"""The five BASELINE.json benchmark configs, JSONL output.

  1. single fixed-camera frame, 100k Gaussians, 800×800
  2. full tiled pipeline at 1080p (MipNeRF-garden stand-in, 1.5M splats)
  3. SH degree-3 color + dynamic resize over a 120-frame orbit
  4. Morton-ordered 3M-Gaussian sustained throughput (1080p)
  5. 4D spacetime-Gaussian time-sliced render

Synthetic scenes stand in for the MipNeRF captures (no datasets ship with
this environment); the geometry/scale distributions are chosen to match
splat-footprint statistics at the target resolutions.
"""

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_loop(render_impl, scene, stacked_params, cfg, frames, floor, time_values=None):
    from gaussianrenderer_tpu.render import _render_impl

    def loop(scene, stacked_params, time_values):
        def body(i, acc):
            p = jax.tree_util.tree_map(lambda a: a[i], stacked_params)
            tv = None if time_values is None else time_values[i]
            fb, _ = _render_impl(scene, p, cfg, tv)
            return acc + fb[0, 0, 0] + fb[2, -1, -1]

        return jax.lax.fori_loop(0, frames, body, jnp.float32(0.0))

    jl = jax.jit(loop, static_argnames=())
    float(jl(scene, stacked_params, time_values))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jl(scene, stacked_params, time_values))
        walls.append((time.perf_counter() - t0) * 1e3)
    return max(statistics.median(walls) - floor, 0.0) / frames


def orbit_params(cam, cfg, frames, deg=3.0):
    ps = []
    for _ in range(frames):
        cam.orbit(deg, 0.0)
        ps.append(cam.params(cfg.k_sigma))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="bench_suite.jsonl")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.render import _render_impl, render_frame
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.utils import JsonlWriter
    from gaussianrenderer_tpu.utils.timing import measure_floor

    which = {int(c) for c in args.configs.split(",")}
    writer = JsonlWriter(args.out)
    floor = measure_floor()
    log(f"floor {floor:.1f} ms")

    def cam_for(cfg, pos=(0.0, 1.0, 8.0), fov=70.0):
        cam = Camera()
        cam.set_position(list(pos))
        cam.set_look_at([0.0, 0.0, 0.0])
        cam.set_fov_y(fov)
        cam.set_aspect_ratio(cfg.width / cfg.height)
        cam.set_clipping_planes(0.2, 100.0)
        cam.update_camera_matrices()
        return cam

    def run(name, scene, cfg, frames=None, time_values=None, pos=(0.0, 1.0, 8.0)):
        frames = frames or args.frames
        scene = scene.to_device()
        cam = cam_for(cfg, pos)
        t0 = time.time()
        fb, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
        n_inst = int(stats.num_instances)
        overflow = bool(stats.overflow)
        compile_s = time.time() - t0
        stacked = orbit_params(cam, cfg, frames)
        ms = measure_loop(_render_impl, scene, stacked, cfg, frames, floor, time_values)
        writer.write(
            config=name,
            resolution=f"{cfg.width}x{cfg.height}",
            gaussians=scene.num_gaussians,
            sh_degree=cfg.sh_degree,
            instances=n_inst,
            overflow=overflow,
            compile_s=round(compile_s, 1),
            ms_per_frame=round(ms, 3),
            fps=round(1000.0 / ms, 1) if ms > 0 else None,
        )

    if 1 in which:
        log("config 1: 100k @ 800x800")
        run(
            "c1_single_frame_800",
            make_random_scene(100_000, seed=0),
            RenderConfig(height=800, width=800, tier_boost=1),
            pos=(0.0, 0.0, 6.0),
        )
    if 2 in which:
        log("config 2: garden stand-in 1.5M @ 1080p")
        run(
            "c2_garden_1080p",
            make_random_scene(1_500_000, seed=1, extent=4.0, scale_range=(0.004, 0.05)),
            RenderConfig(height=1080, width=1920),
        )
    if 3 in which:
        log("config 3: SH deg3 + resize orbit")
        scene3 = make_random_scene(500_000, seed=2, sh_degree=3, scale_range=(0.004, 0.05))
        for h, w in ((720, 1280), (1080, 1920)):
            run(
                f"c3_deg3_{w}x{h}",
                scene3,
                RenderConfig(height=h, width=w, sh_degree=3),
                frames=max(4, args.frames // 2),
            )
    if 4 in which:
        log("config 4: Morton 3M sustained @ 1080p")
        run(
            "c4_morton_3M_1080p",
            make_random_scene(3_000_000, seed=0, extent=4.0, scale_range=(0.004, 0.03)).morton_sorted(),
            RenderConfig(height=1080, width=1920),
        )
    if 5 in which:
        log("config 5: 4D spacetime time-sliced")
        scene5 = make_random_scene(500_000, seed=3, spacetime=True, scale_range=(0.004, 0.05))
        cfg5 = RenderConfig(height=720, width=1280)
        tvals = jnp.linspace(0.0, 1.0, args.frames)
        run("c5_4d_spacetime_720p", scene5, cfg5, time_values=tvals)


if __name__ == "__main__":
    main()
