#!/usr/bin/env python
"""Session cold-start → warm-start measurement (VERDICT r3 #6).

Runs two IDENTICAL viewer-class sessions against a scene file, each in
its own process (one TPU claim at a time):

  session 1 (cold): no sidecar — auto_tier calibrates from the first
      frame (second compile) and writes the calibration sidecar; the
      persistent XLA compile cache fills.
  session 2 (warm): the sidecar seeds the calibrated ladder, so the
      FIRST compile is already the final executable and loads from the
      persistent cache.

Each session records time from PROCESS START to the first displayed
frame (render + device→host of the u8 image). Appends both rows to
session_start.jsonl; the warm row is the "second session start to first
frame" number (target < 10 s).

Run on the real TPU:  python tools/session_start_probe.py
                      [--ply data/trained_100k.ply] [--res 800]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, os, sys, time
T0 = time.time()
import gaussianrenderer_tpu as gr
from gaussianrenderer_tpu.render import framebuffer_to_image, make_renderer
from gaussianrenderer_tpu.scene.io import load_scene
from gaussianrenderer_tpu.utils import enable_compilation_cache

ply, res, tag = sys.argv[1], int(sys.argv[2]), sys.argv[3]
enable_compilation_cache()
scene = gr.load_ply(ply, max_sh_degree=1) if ply.endswith(".ply") \
    else load_scene(ply)
t_load = time.time() - T0
cam = gr.Camera()
cam.set_position([3.9, 1.5, 3.9]); cam.set_look_at([0, 0, 0])
cam.set_fov_y(70.0); cam.set_aspect_ratio(1.0)
cam.set_clipping_planes(0.2, 100.0); cam.update_camera_matrices()
cfg = gr.RenderConfig(height=res, width=res, sh_degree=1)
render = make_renderer(scene, cfg, auto_tier=True, scene_path=ply)
fb, stats = render(cam.params(cfg.k_sigma))
img = framebuffer_to_image(fb)  # first DISPLAYED frame (u8 fetch)
t_first = time.time() - T0
live = render.current_cfg()
print(json.dumps({
    "tag": tag,
    "scene_load_s": round(t_load, 2),
    "start_to_first_frame_s": round(t_first, 2),
    "overflow": bool(stats.overflow),
    "img_mean": round(float(img.mean()), 2),
    "head": list(live.tiers[0]) if live.tiers else None,
    "packed_chunk": live.packed_chunk,
}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", default="data/trained_100k.ply")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--out", default="session_start.jsonl")
    ap.add_argument("--keep-sidecar", action="store_true",
                    help="do not delete an existing sidecar first")
    args = ap.parse_args()

    ply = os.path.join(REPO, args.ply)
    sidecar = ply + ".grcal.json"
    if not args.keep_sidecar and os.path.exists(sidecar):
        os.remove(sidecar)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    rows = []
    for tag in ("cold", "warm"):
        with tempfile.NamedTemporaryFile(
            "w", suffix=".py", delete=False
        ) as f:
            f.write(_CHILD)
            child = f.name
        res = subprocess.run(
            [sys.executable, child, ply, str(args.res), tag],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        os.unlink(child)
        line = [l for l in res.stdout.splitlines() if l.startswith("{")]
        if res.returncode != 0 or not line:
            print(res.stderr[-1500:], file=sys.stderr)
            raise SystemExit(f"{tag} session failed rc={res.returncode}")
        row = json.loads(line[-1])
        row.update(ply=args.ply, res=args.res,
                   sidecar_present=tag == "warm")
        rows.append(row)
        print(f"{tag}: start→first-frame {row['start_to_first_frame_s']}s "
              f"(load {row['scene_load_s']}s, head {row['head']}, "
              f"chunk {row['packed_chunk']})", file=sys.stderr, flush=True)

    assert os.path.exists(sidecar), "cold session must write the sidecar"
    from gaussianrenderer_tpu.utils import JsonlWriter

    w = JsonlWriter(os.path.join(REPO, args.out))
    for row in rows:
        w.write(probe="session_start", **row)
    print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
