#!/usr/bin/env python
"""Strip-slack CPU probe: does tile-row strip parallelism really divide
the frame sort?

The multi-chip path (parallel/multichip.py) gives each chip a contiguous
strip of tile rows; each chip then emits + sorts only the instances
intersecting its strip. PERF_NOTES sells this as "each chip under the
sort knee" — which is only true if instances distribute evenly across
strips. The round-2 band-hull measurement (docs/sort_plan.md) showed
exactly this kind of assumption dying on contact (2.7-7× slack), so this
probe MEASURES the per-strip instance distribution on the benchmark
scenes over the same orbit poses the bench suite uses.

Per pose and strip count S: slack = max_strip_instances / (total / S) —
the factor by which the slowest chip's sort exceeds the ideal C/S split.
(Each chip also pays its strip's emission; the sort dominates, and lane
capacity must be provisioned at the MAX strip, so slack is the number.)

Pure CPU (projection only, no TPU claim). Usage:
    python tools/strip_slack_probe.py [--configs 4,6] [--frames 12]
Appends JSONL to strip_slack.jsonl and prints a summary table.
"""

import argparse
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from gaussianrenderer_tpu.ops.projection import preprocess_gaussians  # noqa: E402
from gaussianrenderer_tpu.parallel import balance_strip_bounds  # noqa: E402
from gaussianrenderer_tpu.scene.camera import Camera  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from gaussianrenderer_tpu.parallel import row_loads_from_rects as row_loads  # noqa: E402


def bounded_counts(tmin_y, tmax_y, rect_w, valid, bounds):
    """Instances per strip for explicit contiguous row boundaries."""
    counts = []
    for s in range(len(bounds) - 1):
        y0, y1 = bounds[s], bounds[s + 1] - 1
        if y0 > y1:
            counts.append(0)
            continue
        lo = np.maximum(tmin_y, y0)
        hi = np.minimum(tmax_y, y1)
        inter = valid & (lo <= hi)
        counts.append(int(np.sum(rect_w[inter] * (hi[inter] - lo[inter] + 1))))
    return np.asarray(counts)


def strip_counts(tmin_y, tmax_y, rect_w, valid, tiles_y, n_strips):
    """Instances per tile-row strip (multichip.py partition: ceil-div rows,
    a splat contributes its rect_w lanes to every strip its rect
    intersects — the per-chip emission duplicates boundary splats)."""
    rows_local = -(-tiles_y // n_strips)
    counts = []
    for s in range(n_strips):
        y0 = s * rows_local
        y1 = min((s + 1) * rows_local, tiles_y) - 1
        if y0 > y1:
            counts.append(0)
            continue
        lo = np.maximum(tmin_y, y0)
        hi = np.minimum(tmax_y, y1)
        inter = valid & (lo <= hi)
        counts.append(int(np.sum(rect_w[inter] * (hi[inter] - lo[inter] + 1))))
    return np.asarray(counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="4,6")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--strips", default="2,4,8",
                    help="comma list of strip/chip counts to measure")
    ap.add_argument("--out", default="strip_slack.jsonl")
    args = ap.parse_args()
    strip_ns = tuple(int(s) for s in args.strips.split(","))

    sys.path.insert(0, "/root/repo/tools")
    from bench_suite import build

    rows = []
    for config in args.configs.split(","):
        scene, cfg, pos, _ = build(config, args.frames)
        cam = Camera()
        cam.set_position(list(pos))
        cam.set_look_at([0.0, 0.0, 0.0])
        cam.set_fov_y(70.0)
        cam.set_aspect_ratio(cfg.width / cfg.height)
        cam.set_clipping_planes(0.2, 100.0)
        cam.update_camera_matrices()

        for f in range(args.frames):
            cam.orbit(360.0 / args.frames, 0.0)
            proj = preprocess_gaussians(
                scene,
                cam.params(cfg.k_sigma),
                width=cfg.width,
                height=cfg.height,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
                tiles_x=cfg.tiles_x,
                tiles_y=cfg.tiles_y,
                sh_degree=cfg.sh_degree,
                quantize_centers=cfg.quantize_centers,
            )
            from gaussianrenderer_tpu.ops.instances import packed_valid_np

            valid = packed_valid_np(proj.valid, proj.opacity)
            tmin = np.asarray(proj.tile_min)
            tmax = np.asarray(proj.tile_max)
            rect_w = (tmax[:, 0] - tmin[:, 0] + 1).astype(np.int64)
            total = int(
                np.sum(
                    rect_w[valid]
                    * (tmax[valid, 1] - tmin[valid, 1] + 1)
                )
            )
            rec = {"config": config, "pose": f, "total_instances": total}
            # Balanced bounds are STATIC per session: derive them once
            # from the first pose's per-row loads, then measure the whole
            # orbit against those fixed boundaries (the honest number —
            # re-deriving per pose would mean a recompile per frame).
            if f == 0:
                loads0 = row_loads(
                    tmin[:, 1], tmax[:, 1], rect_w, valid, cfg.tiles_y
                )
                bal_bounds = {
                    s: balance_strip_bounds(loads0, s) for s in strip_ns
                }
            for s in strip_ns:
                c = strip_counts(
                    tmin[:, 1], tmax[:, 1], rect_w, valid, cfg.tiles_y, s
                )
                rec[f"strips{s}"] = c.tolist()
                rec[f"slack{s}"] = round(float(c.max() / (total / s)), 3)
                rec[f"dup{s}"] = round(float(c.sum() / total), 3)
                cb = bounded_counts(
                    tmin[:, 1], tmax[:, 1], rect_w, valid, bal_bounds[s]
                )
                rec[f"bal_slack{s}"] = round(float(cb.max() / (total / s)), 3)
            smax = strip_ns[-1]
            rec[f"bal_bounds{smax}"] = list(bal_bounds[smax])
            rows.append(rec)
            log(
                f"[c{config} pose {f:2d}] total {total/1e6:.2f}M  "
                f"slack{smax}={rec[f'slack{smax}']} -> balanced "
                f"{rec[f'bal_slack{smax}']}  dup{smax}={rec[f'dup{smax}']}"
            )

        worst = {s: max(r[f"slack{s}"] for r in rows if r["config"] == config) for s in strip_ns}
        bworst = {s: max(r[f"bal_slack{s}"] for r in rows if r["config"] == config) for s in strip_ns}
        dup = {s: max(r[f"dup{s}"] for r in rows if r["config"] == config) for s in strip_ns}
        names = "/".join(str(s) for s in strip_ns)
        log(
            f"== config {config}: worst slack {names} chips = "
            + "/".join(str(worst[s]) for s in strip_ns)
            + " balanced " + "/".join(str(bworst[s]) for s in strip_ns)
            + "  (duplication "
            + "/".join(str(dup[s]) for s in strip_ns) + ")"
        )

    with open(args.out, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    log(f"appended {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
