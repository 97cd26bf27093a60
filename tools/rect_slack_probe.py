#!/usr/bin/env python
"""2-D rect-strip slack probe (VERDICT r4 #3): does splitting strips in
tile-x beat the row-granularity wall past 16 chips?

The row-only partition's 16-chip slack is 1.31 (c4) / 1.49 (c6) —
row-granularity-bound (34 rows / 16 strips), not load-bound
(strip_slack_16.jsonl). This probe balances 2-D rects (row bands ×
column ranges, parallel.balance_strip_rects) on pose 0's per-tile
instance loads and measures the worst-pose slack over the same 12-pose
orbit the bench uses, with the rects FIXED from pose 0 (the production
calibration pattern). Per pose: slack = max over rects of the
instances intersecting the rect / (total / D).

Pure CPU (projection only). Appends JSONL to rect_slack.jsonl.
    python tools/rect_slack_probe.py [--configs 4,6] [--strips 8,16,32]
"""

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from gaussianrenderer_tpu.ops.instances import packed_valid_np  # noqa: E402
from gaussianrenderer_tpu.ops.projection import preprocess_gaussians  # noqa: E402
from gaussianrenderer_tpu.parallel.multichip import (  # noqa: E402
    balance_strip_rects,
    rect_geometry,
    tile_loads_from_rects,
)
from gaussianrenderer_tpu.scene.camera import Camera  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rect_counts(loads, rects):
    return np.asarray(
        [
            int(loads[y0 : y0 + rh, x0 : x0 + cw].sum())
            for (y0, rh, x0, cw) in rects
        ]
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="4,6")
    ap.add_argument("--strips", default="8,16,32")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="rect_slack.jsonl")
    args = ap.parse_args()

    from bench_suite import build
    from gaussianrenderer_tpu.utils import JsonlWriter

    out = JsonlWriter(args.out)
    for config in args.configs.split(","):
        scene, cfg, pos, _ = build(config, args.frames)
        cam = Camera()
        cam.set_position(list(pos))
        cam.set_look_at([0.0, 0.0, 0.0])
        cam.set_fov_y(70.0)
        cam.set_aspect_ratio(cfg.width / cfg.height)
        cam.set_clipping_planes(0.2, 100.0)
        cam.update_camera_matrices()

        pose_loads = []
        for _ in range(args.frames):
            cam.orbit(360.0 / args.frames, 0.0)
            p = cam.params(cfg.k_sigma)
            proj = preprocess_gaussians(
                scene, p,
                width=cfg.width, height=cfg.height,
                tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
                sh_degree=cfg.sh_degree,
                quantize_centers=cfg.quantize_centers,
                ewa_dilation=cfg.ewa_dilation,
                ewa_compensate=cfg.ewa_compensate,
            )
            valid = packed_valid_np(proj.valid, proj.opacity)
            pose_loads.append(
                tile_loads_from_rects(
                    proj.tile_min, proj.tile_max, valid,
                    cfg.tiles_x, cfg.tiles_y,
                )
            )
            log(f"[{config}] pose {len(pose_loads)-1} projected")

        for d in (int(s) for s in args.strips.split(",")):
            # Calibrate rects AND row-only bounds; measure the
            # worst-pose slack over the orbit with both FIXED. Rect
            # calibration uses the per-tile MAX over the probe poses —
            # single-pose column bounds are orbit-fragile (content
            # rotates horizontally through the screen), measured 1.67-
            # 1.74 worst-pose slack on c6 vs 1.28 for rows.
            agg = np.maximum.reduce(pose_loads)
            rects_spec, slack0 = balance_strip_rects(agg, d)
            rects, rows_max, cols_max = rect_geometry(
                rects_spec, d, cfg.tiles_y, cfg.tiles_x
            )
            from gaussianrenderer_tpu.parallel import balance_strip_bounds

            row_bounds = balance_strip_bounds(
                agg.sum(axis=1), d
            ) if d <= cfg.tiles_y else None
            worst_rect, worst_row = 0.0, 0.0
            for loads in pose_loads:
                ideal = max(loads.sum() / d, 1.0)
                worst_rect = max(
                    worst_rect, rect_counts(loads, rects).max() / ideal
                )
                if row_bounds is not None:
                    rowc = [
                        loads[row_bounds[s]: row_bounds[s + 1]].sum()
                        for s in range(d)
                    ]
                    worst_row = max(worst_row, max(rowc) / ideal)
            bands = len(rects_spec[0]) - 1
            row = dict(
                config=f"c{config}",
                strips=d,
                bands=bands,
                cols_per_band=d // bands,
                pose0_slack=round(float(slack0), 3),
                worst_rect_slack=round(float(worst_rect), 3),
                worst_row_slack=(
                    round(float(worst_row), 3) if row_bounds else None
                ),
                rows_max=rows_max,
                cols_max=cols_max,
            )
            out.write(**row)
            log(f"[{config}] D={d}: {row}")


if __name__ == "__main__":
    main()
