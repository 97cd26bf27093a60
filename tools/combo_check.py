#!/usr/bin/env python
"""One-process TPU validation batch: mini-headline bench + verify render.

The tunnel charges ~10-20 min of session-claim latency per PROCESS, so
this combines what used to be separate runs: (1) a c4-scale timed render
loop with fixed calibrated tiers and device-staged cameras (scalar
fetches only), then (2) the end-to-end public-API verify render, fetching
the one full framebuffer LAST (big D2H fetches destabilize the relay).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/combo_check.py OUT.png
"""

import statistics
import sys
import time



def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    out_png = sys.argv[1] if len(sys.argv) > 1 else "/tmp/combo_frame.png"
    import jax
    import jax.numpy as jnp

    import gaussianrenderer_tpu as gr
    from gaussianrenderer_tpu.render import _render_impl, framebuffer_to_image
    from gaussianrenderer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    # ---- 1. mini headline: 3M @1080p, fixed tiers, staged cameras --------
    import dataclasses
    import functools

    scene = gr.make_random_scene(
        3_000_000, seed=0, extent=4.0, scale_range=(0.004, 0.03)
    ).morton_sorted()
    scene_p = scene.prepared()
    cam = gr.Camera()
    cam.set_position([0.0, 1.0, 8.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(1920 / 1080)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = gr.RenderConfig(
        height=1080, width=1920,
        tiers=((3, 0), (4, 393216), (6, 16384), (8, 7168), (12, 3072)),
    )
    render_jit = jax.jit(functools.partial(_render_impl, cfg=cfg))

    from gaussianrenderer_tpu.utils.timing import measure_floor

    floor = measure_floor()
    log(f"floor: {floor:.1f} ms")

    t0 = time.time()
    fb, stats = render_jit(scene_p, cam.params(cfg.k_sigma))
    log(
        f"first frame {time.time()-t0:.1f}s inst={int(stats.num_instances)} "
        f"overflow={bool(stats.overflow)}"
    )
    params = []
    for _ in range(16):
        cam.orbit(22.5, 0.0)
        params.append(
            jax.tree_util.tree_map(
                lambda v: jax.device_put(jnp.asarray(v)),
                cam.params(cfg.k_sigma),
            )
        )
    walls = []
    for rep in range(2):
        for p in params:
            t0 = time.perf_counter()
            fb, _ = render_jit(scene_p, p)
            float(fb[0, 0, 0])
            walls.append((time.perf_counter() - t0) * 1e3)
    ms = max(statistics.median(walls) - floor, 0.0)
    log(f"c4 mini-bench: median {ms:.1f} ms/frame (floor {floor:.1f})")

    # ---- 2. verify render through the public API -------------------------
    vscene = gr.make_random_scene(20000, seed=42)
    vcam = gr.Camera()
    vcam.set_position([-1.5, -1.5, -3.0])
    vcam.set_look_at([0, 0, 0])
    vcam.set_fov_y(90.0)
    vcam.set_aspect_ratio(800 / 600)
    vcam.set_clipping_planes(0.3, 100.0)
    vcam.update_camera_matrices()
    vcfg = gr.RenderConfig(height=600, width=800)
    vrender = gr.make_renderer(vscene, vcfg, auto_tier=True)
    vfb, vstats = vrender(vcam.params(vcfg.k_sigma))
    log(
        f"verify: overflow={bool(vstats.overflow)} "
        f"culled={int(vstats.num_culled)} inst={int(vstats.num_instances)}"
    )
    img = framebuffer_to_image(vfb)
    log(f"verify img mean: {img.mean():.4f}")
    from PIL import Image

    Image.fromarray(img).save(out_png)
    log(f"wrote {out_png}")


if __name__ == "__main__":
    main()
