"""Fidelity gate on the TRAINED scene fixture.

tests/fixtures/trained.ply was produced by tools/make_trained_fixture.py:
the repo's own differentiable trainer fitted to multi-view renders, so its
parameter distribution (anisotropy, bimodal opacity, scale spread) came
from real gradient descent through the renderer rather than a hand-made
synthetic. This is the CI stand-in for the trained-capture PLYs the
reference validated on (reference README.md:23, drag-drop viewer
``canvas.cpp:280-296``).
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "trained.ply")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="trained fixture not built (tools/make_trained_fixture.py)",
)


def _cam(w=160, h=128):
    from gaussianrenderer_tpu.scene.camera import Camera

    cam = Camera()
    cam.set_position([0.0, 1.5, 5.5])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(w / h)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    return cam


def test_trained_ply_roundtrip_stats():
    from gaussianrenderer_tpu.scene.io import load_ply

    scene = load_ply(FIXTURE)
    assert scene.num_gaussians > 1000
    scales = np.asarray(scene.scales)
    opacity = np.asarray(scene.opacity)
    # Trained distributions: anisotropic scales and a real opacity spread —
    # the structure synthetic scenes lack.
    aniso = scales.max(axis=1) / np.maximum(scales.min(axis=1), 1e-9)
    assert np.median(aniso) > 1.2
    assert opacity.std() > 0.05
    assert np.all(np.isfinite(np.asarray(scene.positions)))


def test_trained_scene_renders_against_oracle():
    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.oracle import psnr, render_oracle
    from gaussianrenderer_tpu.render import make_renderer
    from gaussianrenderer_tpu.scene.io import load_ply

    scene = load_ply(FIXTURE)
    cam = _cam()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    golden = render_oracle(scene, cam, cfg)
    render = make_renderer(scene, cfg, auto_tier=True)
    fb, stats = render(cam.params(cfg.k_sigma))
    assert not bool(stats.overflow)
    score = psnr(np.asarray(fb), golden)
    assert score >= 40.0, f"trained-scene PSNR {score:.2f} dB < 40 dB"
