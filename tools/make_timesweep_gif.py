#!/usr/bin/env python
"""Render a 4D spacetime time sweep on the TPU and assemble a GIF.

Demo evidence for the 4D path (reference roadmap item, README.md:16 /
BASELINE config 5): a FIXED camera while ``t`` scrubs 0→1, so every
visible change is the time-conditioned opacity window + per-splat linear
motion (p(t) = p + v·(t − t_center)) — not camera motion. The time value
is traced (cfg-independent), so the whole sweep is ONE executable and a
single process renders every frame warm.

  python tools/make_timesweep_gif.py --frames 25 --height 360 \
      --width 640 --out docs/img/timesweep_4d.gif
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--scene", choices=["surface", "clustered"],
                    default="surface",
                    help="surface = rigid per-object motion (legible); "
                    "clustered = capture-statistics per-splat motion")
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--out", default="docs/img/timesweep_4d.gif")
    ap.add_argument("--fps", type=float, default=10.0)
    args = ap.parse_args()

    import numpy as np

    import gaussianrenderer_tpu as gr
    from gaussianrenderer_tpu.render import framebuffer_to_image
    from gaussianrenderer_tpu.scene.io import (
        make_clustered_scene,
        make_surface_scene,
    )
    from gaussianrenderer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.scene == "surface":
        scene = make_surface_scene(
            args.n, seed=9, spacetime=True
        ).morton_sorted()
    else:
        scene = make_clustered_scene(
            args.n, seed=9, spacetime=True, extent=3.5
        ).morton_sorted()
    cam = gr.Camera()
    cam.set_position([0.0, 2.2, 8.0])
    cam.set_look_at([0.0, 0.5, 0.0])
    cam.set_fov_y(args.fov)
    cam.set_aspect_ratio(args.width / args.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()

    cfg = gr.RenderConfig(height=args.height, width=args.width)
    render = gr.make_renderer(scene, cfg, auto_tier=True,
                              overflow_check_every=1)
    frames = []
    params = cam.params(cfg.k_sigma)
    for i, t in enumerate(np.linspace(0.0, 1.0, args.frames)):
        fb, stats = render(params, float(t))
        assert not bool(stats.overflow)
        frames.append(framebuffer_to_image(fb))
        print(f"t={t:.3f} frame {i}/{args.frames}", file=sys.stderr,
              flush=True)

    from PIL import Image

    pal = [Image.fromarray(f).convert("P", palette=Image.ADAPTIVE)
           for f in frames]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    # Bounce loop (0→1→0) so the endpoints don't jump-cut.
    seq = pal + pal[-2:0:-1]
    seq[0].save(args.out, save_all=True, append_images=seq[1:],
                duration=int(1000 / args.fps), loop=0)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
