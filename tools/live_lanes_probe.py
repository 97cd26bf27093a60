#!/usr/bin/env python
"""CPU sizing probe for live-tile enumeration (round-3 sort-lane lever).

Today emission enumerates every tile of the splat's (tight) rect; lanes
the exact prune (_tile_dead) kills still occupy frame-sort lanes as
SENTINEL keys. If emission instead enumerated only LIVE tiles (class key
= live-tile count, lane j -> j-th live rect position via a precomputed
32-bit live mask), the frame sort would cover ~= sum(live) lanes.

Reports, per bench scene at the bench camera pose:
  - sum(rect area) (today's emission floor) vs sum(live count),
  - per-area-class live fraction (where the dead lanes live),
  - calibrated-ladder lanes for the area histogram vs live histogram.
"""
import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.ops.instances import packed_valid_np
from gaussianrenderer_tpu.ops.projection import ALPHA_EPS, preprocess_gaussians
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import (
    make_clustered_scene,
    make_random_scene,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def live_counts(proj, cfg, chunk=200_000):
    """Per-splat (rect_area, live_count) with the exact _tile_dead test
    (f64, gain margin matching the device kill threshold)."""
    valid = packed_valid_np(proj.valid, proj.opacity)
    conic = np.asarray(proj.conic, np.float64)
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    op = np.asarray(proj.opacity, np.float64)
    cpx = np.asarray(proj.center_px, np.float64)
    aabb = np.asarray(proj.aabb_px, np.float64)
    tmin = np.asarray(proj.tile_min, np.int64)
    tmax = np.asarray(proj.tile_max, np.int64)
    gain = np.maximum(2.0 * np.log(np.maximum(op, 1e-12) / ALPHA_EPS), 0.0)
    gain_m = gain * 1.05 + 0.05  # the device kill margin (_prune_params)

    n = len(valid)
    area = np.zeros(n, np.int64)
    live = np.zeros(n, np.int64)
    idx = np.nonzero(valid)[0]
    for s in range(0, len(idx), chunk):
        ii = idx[s : s + chunk]
        w = tmax[ii, 0] - tmin[ii, 0] + 1
        h = tmax[ii, 1] - tmin[ii, 1] + 1
        area[ii] = w * h
        m = int((w * h).max()) if len(ii) else 0
        lv = np.zeros(len(ii), np.int64)
        pbc = B[ii] / np.maximum(2.0 * C[ii], 1e-30)
        pba = B[ii] / np.maximum(2.0 * A[ii], 1e-30)
        for r in range(m):
            sel = r < (w * h)
            j = ii[sel]
            tx = tmin[j, 0] + r % np.maximum(w[sel], 1)
            ty = tmin[j, 1] + r // np.maximum(w[sel], 1)
            x0 = (tx * cfg.tile_w).astype(np.float64)
            y0 = (ty * cfg.tile_h).astype(np.float64)
            lx = np.maximum(x0, aabb[j, 0]) - cpx[j, 0]
            hx = np.minimum(x0 + cfg.tile_w - 1, aabb[j, 2]) - cpx[j, 0]
            ly = np.maximum(y0, aabb[j, 1]) - cpx[j, 1]
            hy = np.minimum(y0 + cfg.tile_h - 1, aabb[j, 3]) - cpx[j, 1]
            dxe = np.where(lx > 0, lx, hx)
            vx = (lx > 0) | (hx < 0)
            dy1 = np.clip(-pbc[sel] * dxe, ly, hy)
            mx = (A[j] * dxe + B[j] * dy1) * dxe + C[j] * dy1 * dy1
            dye = np.where(ly > 0, ly, hy)
            vy = (ly > 0) | (hy < 0)
            dx1 = np.clip(-pba[sel] * dye, lx, hx)
            my = (A[j] * dx1 + B[j] * dye) * dx1 + C[j] * dye * dye
            big = 3.0e38
            mn = np.minimum(np.where(vx, mx, big), np.where(vy, my, big))
            mn = np.where(vx | vy, mn, 0.0)
            empty = (hx < lx) | (hy < ly)
            dead = empty | (mn > gain_m[j])
            lv[sel] += ~dead
        live[ii] = lv
    return valid, area, live


def hist_of(counts, valid):
    from gaussianrenderer_tpu.ops.instances import AREA_BUCKETS

    edges = list(AREA_BUCKETS)
    hist = np.zeros(len(edges), np.int64)
    c = counts[valid & (counts > 0)]
    prev = 0
    for i, e in enumerate(edges):
        hist[i] = ((c > prev) & (c <= e)).sum()
        prev = e
    return hist


def scene_report(name, scene, cam, cfg):
    params = cam.params(cfg.k_sigma)
    proj = jax.jit(
        lambda s, p: preprocess_gaussians(
            s, p, width=cfg.width, height=cfg.height, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            sh_degree=cfg.sh_degree,
        )
    )(scene, params)
    valid, area, live = live_counts(proj, cfg)
    tot_a, tot_l = int(area.sum()), int(live.sum())
    # per-area-bucket live fraction
    buckets = [1, 2, 4, 8, 16, 32, 64, 10**9]
    rows = []
    prev = 0
    for b in buckets:
        sel = valid & (area > prev) & (area <= b)
        if sel.sum():
            rows.append(
                dict(
                    area_le=b,
                    splats=int(sel.sum()),
                    lanes=int(area[sel].sum()),
                    live=int(live[sel].sum()),
                )
            )
        prev = b
    out = dict(
        scene=name,
        splats=int(valid.sum()),
        rect_lanes=tot_a,
        live_lanes=tot_l,
        live_frac=round(tot_l / max(tot_a, 1), 4),
        buckets=rows,
    )
    print(json.dumps(out))
    return out


def main():
    cfg = RenderConfig(height=1080, width=1920, compositor="packed")
    # c4: bench.py scene + first orbit pose
    scene = make_random_scene(
        3_000_000, seed=0, extent=4.0, scale_range=(0.004, 0.03)
    ).morton_sorted()
    cam = Camera()
    cam.set_position([0.0, 1.0, 8.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(cfg.width / cfg.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cam.orbit(360.0 / 24, 0.0)
    scene_report("c4", scene, cam, cfg)

    scene = make_clustered_scene(2_000_000, seed=7)
    cam2 = Camera()
    cam2.set_position([0.0, 1.0, 8.0])
    cam2.set_look_at([0.0, 0.0, 0.0])
    cam2.set_fov_y(70.0)
    cam2.set_aspect_ratio(cfg.width / cfg.height)
    cam2.set_clipping_planes(0.2, 100.0)
    cam2.update_camera_matrices()
    cam2.orbit(360.0 / 24, 0.0)
    scene_report("c6", scene, cam2, cfg)


if __name__ == "__main__":
    main()
