#!/usr/bin/env python
"""CPU probe: how much does the threshold-ellipse tile rect shrink coverage?

Today the tile rect comes from the reference's rotated-eigen-box AABB
(projection.py, matching render.cu:704-759). But a pixel only contributes
when alpha = op·exp(−½md²) ≥ 1e-3, i.e. md² ≤ 2·ln(op/1e-3); the exact
pixel AABB of that ellipse is ±sqrt(2·ln(op/eps)·Σxx) (marginal variance),
which SHRINKS with opacity, while the k·σ box is opacity-blind. Tiles
outside the intersection contribute exactly zero (the kernel's alpha test
zeroes every pixel), so the per-splat tile rect can be the INTERSECTION
without changing a single output pixel.

This probe measures, per bench scene and orbit pose:
  - true instance count (Σ rect areas) with the current rect,
  - with the intersected tight rect (+1 px conservative margin),
  - splats whose threshold box misses their AABB entirely (area → 0),
  - calibrated-ladder sort lanes for both histograms.
"""
import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.ops.instances import AREA_BUCKETS, packed_valid_np
from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
from gaussianrenderer_tpu.render import calibrate_tiers, ladder_lanes
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import (
    load_ply,
    make_clustered_scene,
    make_random_scene,
)

ALPHA_EPS = 1e-3
MARGIN_PX = 1.0


def tile_areas(proj, cfg):
    tmin = np.asarray(proj.tile_min)
    tmax = np.asarray(proj.tile_max)
    valid = packed_valid_np(proj.valid, proj.opacity)
    w = tmax[:, 0] - tmin[:, 0] + 1
    h = tmax[:, 1] - tmin[:, 1] + 1
    area = np.where(valid, w * h, 0).astype(np.int64)
    return valid, area


def tight_areas(proj, cfg):
    valid = packed_valid_np(proj.valid, proj.opacity)
    conic = np.asarray(proj.conic, np.float64)
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    op = np.asarray(proj.opacity, np.float64)
    det_c = np.maximum(A * C - 0.25 * B * B, 1e-30)  # det(conic) = 1/det(Σ)
    sxx = C / det_c
    syy = A / det_c
    gain = 2.0 * np.log(np.maximum(op, 1e-12) / ALPHA_EPS)
    gain = np.maximum(gain, 0.0)
    ex = np.sqrt(gain * np.maximum(sxx, 0.0)) + MARGIN_PX
    ey = np.sqrt(gain * np.maximum(syy, 0.0)) + MARGIN_PX
    cpx = np.asarray(proj.center_px, np.float64)
    aabb = np.asarray(proj.aabb_px, np.float64)  # xmin ymin xmax ymax
    xmin = np.maximum(aabb[:, 0], cpx[:, 0] - ex)
    xmax = np.minimum(aabb[:, 2], cpx[:, 0] + ex)
    ymin = np.maximum(aabb[:, 1], cpx[:, 1] - ey)
    ymax = np.minimum(aabb[:, 3], cpx[:, 1] + ey)
    empty = (xmax < xmin) | (ymax < ymin)
    tminx = np.clip(np.floor(xmin).astype(np.int64) // cfg.tile_w, 0, cfg.tiles_x - 1)
    tmaxx = np.clip(np.floor(xmax).astype(np.int64) // cfg.tile_w, 0, cfg.tiles_x - 1)
    tminy = np.clip(np.floor(ymin).astype(np.int64) // cfg.tile_h, 0, cfg.tiles_y - 1)
    tmaxy = np.clip(np.floor(ymax).astype(np.int64) // cfg.tile_h, 0, cfg.tiles_y - 1)
    w = tmaxx - tminx + 1
    h = tmaxy - tminy + 1
    area = np.where(valid & ~empty, w * h, 0).astype(np.int64)
    return area, int((valid & empty).sum())


def exact_dead_fraction(proj, cfg, max_splats=4_000_000):
    """Among instances surviving (tight rect ∩ isotropic r² prune), what
    fraction have exact min md² over (tile rect ∩ pixel AABB) > gain —
    i.e. would an anisotropic per-lane prune additionally kill them?"""
    valid = packed_valid_np(proj.valid, proj.opacity)
    conic = np.asarray(proj.conic, np.float64)
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    op = np.asarray(proj.opacity, np.float64)
    cpx = np.asarray(proj.center_px, np.float64)
    aabb = np.asarray(proj.aabb_px, np.float64)
    tmin = np.asarray(proj.tile_min, np.int64)
    tmax = np.asarray(proj.tile_max, np.int64)
    gain = np.maximum(2.0 * np.log(np.maximum(op, 1e-12) / ALPHA_EPS), 0.0)
    # ROUND-2 isotropic prune radius² (lambda_min bound) — the baseline
    # this probe compares the exact test against; the render path itself
    # now uses the exact visible-face test (ops/instances._tile_dead).
    lam = 0.5 * (A + C) - np.sqrt(np.maximum(0.25 * (A - C) ** 2 + 0.25 * B * B, 0))
    r2max = np.where(lam > 1e-20, gain / np.maximum(lam, 1e-20), -1.0)

    idx = np.nonzero(valid)[0][:max_splats]
    kept = dead_iso = dead_exact = 0
    CH = 200_000
    for s in range(0, len(idx), CH):
        ii = idx[s : s + CH]
        w = tmax[ii, 0] - tmin[ii, 0] + 1
        h = tmax[ii, 1] - tmin[ii, 1] + 1
        m = int((w * h).max()) if len(ii) else 0
        for r in range(m):
            sel = r < (w * h)
            j = ii[sel]
            tx = tmin[j, 0] + r % np.maximum(w[sel], 1)
            ty = tmin[j, 1] + r // np.maximum(w[sel], 1)
            x0 = tx * cfg.tile_w
            y0 = ty * cfg.tile_h
            # isotropic prune (current behavior)
            ddx = np.clip(cpx[j, 0], x0, x0 + cfg.tile_w - 1) - cpx[j, 0]
            ddy = np.clip(cpx[j, 1], y0, y0 + cfg.tile_h - 1) - cpx[j, 1]
            d2 = ddx * ddx + ddy * ddy
            iso_dead = (r2max[j] >= 0) & (d2 > r2max[j])
            dead_iso += int(iso_dead.sum())
            live = ~iso_dead
            j = j[live]
            if not len(j):
                continue
            # exact min md² over (tile ∩ pixel AABB) rect
            lx = np.maximum(x0[live], aabb[j, 0]) - cpx[j, 0]
            hx = np.minimum(x0[live] + cfg.tile_w - 1, aabb[j, 2]) - cpx[j, 0]
            ly = np.maximum(y0[live], aabb[j, 1]) - cpx[j, 1]
            hy = np.minimum(y0[live] + cfg.tile_h - 1, aabb[j, 3]) - cpx[j, 1]
            a, b, c = A[j], B[j], C[j]

            def q(dx, dy):
                return a * dx * dx + b * dx * dy + c * dy * dy

            inside = (lx <= 0) & (0 <= hx) & (ly <= 0) & (0 <= hy)
            dy1 = np.clip(-b * lx / (2 * c), ly, hy)
            dy2 = np.clip(-b * hx / (2 * c), ly, hy)
            dx3 = np.clip(-b * ly / (2 * a), lx, hx)
            dx4 = np.clip(-b * hy / (2 * a), lx, hx)
            mn = np.minimum(
                np.minimum(q(lx, dy1), q(hx, dy2)),
                np.minimum(q(dx3, ly), q(dx4, hy)),
            )
            mn = np.where(inside, 0.0, mn)
            empty = (hx < lx) | (hy < ly)
            de = empty | (mn > gain[j] * 1.02)
            dead_exact += int(de.sum())
            kept += int((~de).sum())
    return kept, dead_iso, dead_exact


def hist_of(area, valid):
    hist = []
    prev = 0
    for edge in AREA_BUCKETS:
        hist.append(int(((area > prev) & (area <= edge) & valid).sum()))
        prev = edge
    hist.append(int(((area > prev) & valid).sum()))
    return np.asarray(hist, np.int64)


def probe(name, scene, cam, cfg, n_poses=4, orbit_step=90.0, exact=False):
    tot_cur = tot_tight = 0
    hist_cur = hist_tight = None
    dropped = 0
    exact_row = None
    for pose in range(n_poses):
        cam.orbit(orbit_step, 0.0)
        proj = preprocess_gaussians(
            scene, cam.params(cfg.k_sigma),
            width=cfg.width, height=cfg.height,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            sh_degree=cfg.sh_degree,
        )
        if exact and pose == 0:
            kept, d_iso, d_ex = exact_dead_fraction(proj, cfg)
            exact_row = {
                "scene": name, "kept": kept, "dead_isotropic": d_iso,
                "dead_exact_extra": d_ex,
                "extra_kill_frac": round(d_ex / max(kept + d_ex, 1), 4),
            }
            print(json.dumps(exact_row), flush=True)
        valid, area = tile_areas(proj, cfg)
        area_t, n_drop = tight_areas(proj, cfg)
        tot_cur += int(area.sum())
        tot_tight += int(area_t.sum())
        dropped += n_drop
        hc = hist_of(area, valid)
        ht = hist_of(area_t, valid & (area_t > 0))
        hist_cur = hc if hist_cur is None else np.maximum(hist_cur, hc)
        hist_tight = ht if hist_tight is None else np.maximum(hist_tight, ht)
    tiers_cur = calibrate_tiers(hist_cur, num_tiles=cfg.num_tiles)
    tiers_tight = calibrate_tiers(hist_tight, num_tiles=cfg.num_tiles)
    lanes_cur = ladder_lanes(tiers_cur, scene.num_gaussians)
    lanes_tight = ladder_lanes(tiers_tight, scene.num_gaussians)
    row = {
        "scene": name,
        "instances_cur": tot_cur // n_poses,
        "instances_tight": tot_tight // n_poses,
        "inst_ratio": round(tot_tight / max(tot_cur, 1), 4),
        "splats_fully_dropped": dropped // n_poses,
        "lanes_cur": lanes_cur,
        "lanes_tight": lanes_tight,
        "lane_ratio": round(lanes_tight / max(lanes_cur, 1), 4),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None

    def cam_c4(w, h):
        cam = Camera()
        cam.set_position([0.0, 1.0, 8.0])
        cam.set_look_at([0.0, 0.0, 0.0])
        cam.set_fov_y(70.0)
        cam.set_aspect_ratio(w / h)
        cam.set_clipping_planes(0.2, 100.0)
        cam.update_camera_matrices()
        return cam

    runs = []
    if only in (None, "c4"):
        scene = make_random_scene(
            3_000_000, seed=0, extent=4.0, scale_range=(0.004, 0.03)
        ).morton_sorted()
        cfg = RenderConfig(height=1080, width=1920, compositor="packed")
        runs.append(probe("c4_3M", scene, cam_c4(1920, 1080), cfg,
                          exact="exact" in sys.argv))
        del scene
    if only in (None, "c6"):
        scene = make_clustered_scene(2_000_000, seed=4, extent=4.0).morton_sorted()
        cfg = RenderConfig(height=1080, width=1920, compositor="packed")
        runs.append(probe("c6_2M_clustered", scene, cam_c4(1920, 1080), cfg,
                          exact="exact" in sys.argv))
        del scene
    if only in (None, "c7"):
        scene = load_ply("/root/repo/data/trained_100k.ply", max_sh_degree=1)
        scene = scene.morton_sorted()
        cfg = RenderConfig(height=1080, width=1920, compositor="packed")
        runs.append(probe("c7_trained100k", scene, cam_c4(1920, 1080), cfg,
                          exact="exact" in sys.argv))


if __name__ == "__main__":
    main()
