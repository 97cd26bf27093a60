#!/usr/bin/env python
"""CPU probe: compositor pair-work vs sort lanes across tile shapes.

The packed compositor's vector work is P × (instances in the tile) for
EVERY (pixel, lane) pair — pixels outside a splat's AABB still burn VPU
slots. Smaller tiles cut dead pairs but emit more instances (splats
cross more tile boundaries), which the frame sort pays for. This probe
projects the c4 bench scene once on CPU and reports, per candidate tile
shape: emitted instances (= sort lanes, compacted), total pair-work
P·instances, and the "useful" pair count Σ clip(AABB ∩ tile) as the
lower bound any schedule could hit.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import functools

import numpy as np


def main():
    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene

    W, H = 1920, 1080
    scene = make_random_scene(
        3_000_000, seed=0, extent=4.0, scale_range=(0.004, 0.03)
    ).morton_sorted().prepared()
    cam = Camera()
    cam.set_position([0.0, 1.0, 8.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(W / H)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cam.orbit(360.0 / 24, 0.0)
    cfg = RenderConfig(height=H, width=W)
    proj = jax.jit(
        functools.partial(
            preprocess_gaussians,
            width=W, height=H,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            sh_degree=cfg.sh_degree,
        )
    )(scene, cam.params(cfg.k_sigma))

    valid = np.asarray(proj.valid) & (np.asarray(proj.opacity) >= 1e-3)
    ax4 = np.asarray(proj.aabb_px)[valid]  # (N, 4) xmin ymin xmax ymax
    xmin = np.clip(ax4[:, 0], 0, W - 1)
    ymin = np.clip(ax4[:, 1], 0, H - 1)
    xmax = np.clip(ax4[:, 2], 0, W - 1)
    ymax = np.clip(ax4[:, 3], 0, H - 1)
    useful = ((xmax - xmin + 1) * (ymax - ymin + 1)).sum()
    print(f"valid splats: {valid.sum()}  useful pixel-pairs: {useful/1e9:.3f}G")

    for tw, th in [(32, 32), (32, 16), (16, 16), (32, 8), (64, 16)]:
        tx0 = xmin // tw
        tx1 = xmax // tw
        ty0 = ymin // th
        ty1 = ymax // th
        count = ((tx1 - tx0 + 1) * (ty1 - ty0 + 1)).astype(np.int64)
        total = int(count.sum())
        p = tw * th
        pair = total * p
        print(
            f"tile {tw}x{th}: P={p} instances={total/1e6:.2f}M "
            f"pair-work={pair/1e9:.2f}G  dead-fraction="
            f"{1 - useful/pair:.2%}"
        )


if __name__ == "__main__":
    main()
