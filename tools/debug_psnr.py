import os

os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.oracle import psnr, render_oracle
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene
from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

h, w = 96, 128
scene = make_random_scene(400, seed=0)
cam = Camera()
cam.set_position([0.0, 0.0, 6.0])
cam.set_look_at([0.0, 0.0, 0.0])
cam.set_fov_y(60.0)
cam.set_aspect_ratio(w / h)
cam.set_clipping_planes(0.2, 100.0)
cam.update_camera_matrices()
cfg = RenderConfig(height=h, width=w, compositor="xla", chunk_size=16)

golden = render_oracle(scene, cam, cfg)
fb, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
fb = np.asarray(fb)
print("PSNR", psnr(fb, golden), "instances", int(stats.num_instances), "culled", int(stats.num_culled))

diff = np.abs(fb - golden).max(axis=0)
print("max diff", diff.max(), "at", np.unravel_index(diff.argmax(), diff.shape))
print("num pixels with diff > 0.01:", (diff > 0.01).sum(), "/", diff.size)

# Check projection stage against oracle-side quantities for a few gaussians.
proj = preprocess_gaussians(
    scene, cam.params(cfg.k_sigma),
    width=w, height=h, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
    tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, sh_degree=2,
)
print("valid count:", int(np.sum(np.asarray(proj.valid))))

# visualize which rows of the image differ
rows = (diff > 0.01).sum(axis=1)
print("bad pixels per row (first 20):", rows[:20])
cols = (diff > 0.01).sum(axis=0)
print("bad pixels per col (first 20):", cols[:20])
ys, xs = np.where(diff > 0.01)
if len(ys):
    print("bad region y:", ys.min(), ys.max(), "x:", xs.min(), xs.max())
    y0, x0 = ys[0], xs[0]
    print("sample pixel", y0, x0, "ours", fb[:, y0, x0], "oracle", golden[:, y0, x0])
