#!/usr/bin/env python
"""Where does the 74-168 s first-frame compile go? (VERDICT r2 #3)

Splits the c4-class executable build into trace / lower / backend-compile
on the real TPU, cold and warm (persistent cache). Run twice in a row to
see the warm number:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/compile_profile.py [config]

Appends one JSON line per run to compile_profile.jsonl.
"""

import json
import sys
import time

import jax

def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "4"
    sys.path.insert(0, "/root/repo/tools")
    from bench_suite import build

    from gaussianrenderer_tpu.render import (
        _render_frame_static,
        area_histogram,
        calibrate_tiers,
    )
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.utils import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"devices: {jax.devices()}  cache: {cache_dir}")

    scene, cfg, pos, _ = build(config, 24)
    cam = Camera()
    cam.set_position(list(pos))
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(cfg.width / cfg.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()

    # Calibrate like bench.py does (CPU-side math on the host histogram
    # is fine here; we only care about compile-phase timing).
    import dataclasses

    import numpy as np

    t0 = time.perf_counter()
    hist = area_histogram(scene, cam.params(cfg.k_sigma), cfg)
    t_hist = time.perf_counter() - t0
    cfg = dataclasses.replace(
        cfg, tiers=calibrate_tiers(hist, num_tiles=cfg.num_tiles)
    )
    log(f"tiers: {cfg.tiers} (probe {t_hist:.1f}s)")

    prepared = scene.prepared()
    params = cam.params(cfg.k_sigma)

    t0 = time.perf_counter()
    traced = _render_frame_static.trace(prepared, params, cfg)
    t_trace = time.perf_counter() - t0
    log(f"trace:   {t_trace:7.2f} s")

    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    hlo_bytes = len(lowered.as_text())
    log(f"lower:   {t_lower:7.2f} s  (StableHLO text {hlo_bytes/1e6:.1f} MB)")

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    log(f"compile: {t_compile:7.2f} s  (backend; persistent-cache cold/warm)")

    row = {
        "config": config,
        "tiers": str(cfg.tiers),
        "probe_s": round(t_hist, 2),
        "trace_s": round(t_trace, 2),
        "lower_s": round(t_lower, 2),
        "backend_compile_s": round(t_compile, 2),
        "hlo_mb": round(hlo_bytes / 1e6, 2),
    }
    with open("/root/repo/compile_profile.jsonl", "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
