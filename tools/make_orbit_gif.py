#!/usr/bin/env python
"""Render an orbit of a scene on the TPU and assemble an animated GIF.

Demo-evidence tool (the reference's demo is a committed video,
reference README.md:23 / demos/): renders ``--frames`` poses of a full
orbit through the packed pipeline and writes ``--out`` (GIF) plus the
individual PNGs.

Relay gotcha (PERF_NOTES methodology): a tunnel process destabilizes
after several full-framebuffer fetches. Default mode therefore renders
ONE frame per subprocess (the persistent compile cache makes each ~10 s);
``--single-process`` fetches all frames from one process (fine on a
directly-attached host, or small resolutions through the tunnel).

  python tools/make_orbit_gif.py data/trained_500k.ply --height 360 \
      --width 640 --frames 24 --out docs/img/orbit_500k.gif
"""

import argparse
import os
import subprocess
import sys


def render_one(argv=None):
    """Subprocess entry: render frame --index and save a PNG."""
    ap = _parser()
    ap.add_argument("--index", type=int, required=True)
    ap.add_argument("--png", required=True)
    args = ap.parse_args(argv)

    import numpy as np

    import gaussianrenderer_tpu as gr
    from gaussianrenderer_tpu.render import save_png
    from gaussianrenderer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    scene = gr.load_scene(
        args.ply, max_sh_degree=args.sh_degree
    ).morton_sorted()
    cam = _orbit_cam(args, args.index)
    cfg = gr.RenderConfig(
        height=args.height, width=args.width, sh_degree=args.sh_degree
    )
    render = gr.make_renderer(scene, cfg, auto_tier=True)
    fb, stats = render(cam.params(cfg.k_sigma))
    save_png(fb, args.png)
    print(
        f"frame {args.index}: inst={int(stats.num_instances)} "
        f"overflow={bool(stats.overflow)}",
        file=sys.stderr,
    )


def _orbit_cam(args, i):
    import numpy as np

    import gaussianrenderer_tpu as gr

    ang = 2.0 * np.pi * i / args.frames
    cam = gr.Camera()
    cam.set_position(
        [args.radius * np.sin(ang), args.elevation, args.radius * np.cos(ang)]
    )
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(args.fov)
    cam.set_aspect_ratio(args.width / args.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    return cam


def _parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--radius", type=float, default=5.5)
    ap.add_argument("--elevation", type=float, default=1.5)
    ap.add_argument("--fov", type=float, default=65.0)
    ap.add_argument("--sh-degree", type=int, default=1)
    return ap


def main():
    ap = _parser()
    ap.add_argument("--out", default="docs/img/orbit.gif")
    ap.add_argument("--fps", type=float, default=12.0)
    ap.add_argument("--single-process", action="store_true")
    ap.add_argument("--tmpdir", default="/tmp/orbit_frames")
    args = ap.parse_args()

    os.makedirs(args.tmpdir, exist_ok=True)
    pngs = [
        os.path.join(args.tmpdir, f"frame_{i:03d}.png")
        for i in range(args.frames)
    ]

    if args.single_process:
        import gaussianrenderer_tpu as gr
        from gaussianrenderer_tpu.render import save_png
        from gaussianrenderer_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        scene = gr.load_scene(
            args.ply, max_sh_degree=args.sh_degree
        ).morton_sorted()
        cfg = gr.RenderConfig(
            height=args.height, width=args.width, sh_degree=args.sh_degree
        )
        render = gr.make_renderer(scene, cfg, auto_tier=True)
        for i, png in enumerate(pngs):
            fb, _ = render(_orbit_cam(args, i).params(cfg.k_sigma))
            save_png(fb, png)
            print(f"frame {i}", file=sys.stderr)
    else:
        base = [
            sys.executable, os.path.abspath(__file__), args.ply,
            "--height", str(args.height), "--width", str(args.width),
            "--frames", str(args.frames), "--radius", str(args.radius),
            "--elevation", str(args.elevation), "--fov", str(args.fov),
            "--sh-degree", str(args.sh_degree),
        ]
        for i, png in enumerate(pngs):
            if os.path.exists(png):
                continue  # resumable
            r = subprocess.run(
                base + ["--render-one", "--index", str(i), "--png", png],
                timeout=900,
            )
            if r.returncode != 0:
                raise SystemExit(f"frame {i} failed rc={r.returncode}")
            print(f"frame {i}/{args.frames} done", file=sys.stderr)

    from PIL import Image

    frames = [Image.open(p).convert("P", palette=Image.ADAPTIVE) for p in pngs]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    frames[0].save(
        args.out,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / args.fps),
        loop=0,
    )
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)")


if __name__ == "__main__":
    if "--render-one" in sys.argv:
        sys.argv.remove("--render-one")
        render_one(sys.argv[1:])
    else:
        main()
