"""Real-TPU smoke: compile + run both compositors, check PSNR vs oracle."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.oracle import psnr, render_oracle
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene

print("backend:", jax.default_backend(), jax.devices())

h, w = 256, 256
scene = make_random_scene(5000, seed=0)
cam = Camera()
cam.set_position([0.0, 0.0, 6.0])
cam.set_look_at([0.0, 0.0, 0.0])
cam.set_fov_y(60.0)
cam.set_aspect_ratio(w / h)
cam.set_clipping_planes(0.2, 100.0)
cam.update_camera_matrices()

golden = None
for compositor in ["xla", "packed"]:
    cfg = RenderConfig(height=h, width=w, compositor=compositor)
    t0 = time.time()
    fb, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb = np.asarray(fb)
    t1 = time.time()
    if golden is None:
        golden = render_oracle(scene, cam, cfg)
    score = psnr(fb, golden)
    print(
        f"{compositor}: compile+run {t1-t0:.1f}s  PSNR {score:.2f} dB  "
        f"instances={int(stats.num_instances)} culled={int(stats.num_culled)} overflow={bool(stats.overflow)}"
    )

    # timing: steady state
    pf = cam.params(cfg.k_sigma)
    fb, _ = render_frame(scene, pf, cfg)
    fb.block_until_ready()
    n_it = 20
    t0 = time.time()
    for _ in range(n_it):
        fb, _ = render_frame(scene, pf, cfg)
    fb.block_until_ready()
    dt = (time.time() - t0) / n_it * 1000
    print(f"{compositor}: {dt:.2f} ms/frame at {w}x{h}, N=5000")
