#!/usr/bin/env python
"""Probe: could a STATIC per-scene class assignment replace the area sort?

The windowed emission pays a per-frame payload-carrying area sort
(~19-21 ms at c4, PERF_NOTES round 3) to make class segments contiguous.
If classes were assigned per SCENE (class = the splat's worst-case
effective lane count over the probe orbit) the scene could be reordered
once at load, the per-frame area sort would vanish, and every window
would become a static slice. The price: every splat occupies its
worst-case class's m lanes at EVERY pose, so frame-sort lanes inflate
from Σ_c m_c·k_c (per-pose populations) to Σ_splats m_max(splat).

This probe computes that inflation exactly, on the CPU backend, with the
same projection + prepack path the device uses (render.area_histogram's
machinery). Decision rule against the measured v5e sort model
(PERF_NOTES "the sort knee"): saving the area sort wins only if

    lanes_static stays under the ~7.8M knee, and
    (lanes_static − lanes_windowed) · ~5.8 ns < area-sort cost (~20 ms)

i.e. inflation budget ≈ +3.3M lanes sub-knee. Output: one JSON line.
"""

import argparse
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="4", help="bench_suite config id")
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()

    import functools

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from tools.bench_suite import build

    from gaussianrenderer_tpu.ops.instances import _nscale_prepack
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
    from gaussianrenderer_tpu.render import calibrate_tiers
    from gaussianrenderer_tpu.scene.camera import Camera

    scene, cfg, pos, _ = build(args.config, args.frames)
    n = scene.num_gaussians

    @jax.jit
    def probe(s, cam_params):
        proj = preprocess_gaussians(
            s, cam_params,
            width=cfg.width, height=cfg.height,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            sh_degree=cfg.sh_degree,
            quantize_centers=cfg.quantize_centers,
            ewa_dilation=cfg.ewa_dilation,
        )
        pk = _nscale_prepack(
            proj, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        )
        return pk.valid, pk.eff

    cam = Camera()
    cam.set_position(list(pos))
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(cfg.width / cfg.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()

    eff_max = np.zeros(n, np.int32)  # worst-case eff over poses (valid only)
    per_pose_eff = []  # list of (valid, eff) to price per-pose modes
    for f in range(args.frames):
        cam.orbit(360.0 / args.frames, 0.0)
        cam.update_camera_matrices()
        valid, eff = probe(scene, cam.params(cfg.k_sigma))
        valid = np.asarray(valid)
        eff = np.where(valid, np.asarray(eff), 0).astype(np.int32)
        per_pose_eff.append(eff)
        np.maximum(eff_max, eff, out=eff_max)
        log(f"pose {f}: valid={int(valid.sum())} eff_sum={int(eff.sum())}")

    # The ladder the per-pose calibrator would pick (max histogram over
    # poses), for the honest windowed baseline.
    from gaussianrenderer_tpu.ops.instances import AREA_BUCKETS

    hist = None
    for eff in per_pose_eff:
        # Exact NumPy mirror of ops.instances._eff_hist's (prev, edge]
        # buckets (+1 overflow bucket).
        h, prev = [], 0
        for edge in AREA_BUCKETS:
            h.append(int(((eff > prev) & (eff <= edge)).sum()))
            prev = edge
        h.append(int((eff > prev).sum()))
        h = np.asarray(h, np.int64)
        hist = h if hist is None else np.maximum(hist, h)
    ladder = calibrate_tiers(hist, num_tiles=cfg.num_tiles)
    ms = sorted(m for m, _ in ladder)
    log(f"calibrated ladder: {ladder}")

    def class_of(eff):
        """Smallest ladder m ≥ eff; eff beyond the widest m = overflow."""
        out = np.zeros_like(eff)
        covered = eff <= 0
        for m in ms:
            sel = (~covered) & (eff <= m)
            out[sel] = m
            covered |= sel
        return out, int((~covered).sum())

    # Static mode: every splat pays its worst-case class at every pose.
    cls_static, over_static = class_of(eff_max)
    lanes_static = int(cls_static.sum())

    # Windowed (current) mode: per-pose class populations; envelope =
    # Σ m·max_pose(pop); true per-pose emission for the compacted bound.
    pop_max = {m: 0 for m in ms}
    lanes_pose = []
    for eff in per_pose_eff:
        cls, _ = class_of(eff)
        lanes_pose.append(int(cls.sum()))
        for m in ms:
            pop_max[m] = max(pop_max[m], int((cls == m).sum()))
    lanes_windowed = sum(m * k for m, k in pop_max.items())

    row = {
        "config": f"c{args.config}",
        "frames": args.frames,
        "gaussians": n,
        "ladder": [[m, int(pop_max[m])] for m in ms],
        "lanes_windowed_envelope": lanes_windowed,
        "lanes_per_pose_max": max(lanes_pose),
        "lanes_static": lanes_static,
        "static_overflow_splats": over_static,
        "inflation_lanes": lanes_static - lanes_windowed,
        "knee_lanes": 7_800_000,
        "verdict": (
            "WIN candidate" if lanes_static < 7_800_000
            and (lanes_static - lanes_windowed) * 5.8e-6 < 20.0
            else "LOSS (inflation exceeds the area-sort saving)"
        ),
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
