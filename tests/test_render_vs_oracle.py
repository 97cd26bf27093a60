"""Golden-image regression: the jit pipeline vs the NumPy oracle.

BASELINE fidelity gate: ≥40 dB PSNR vs the reference rasterizer math. The
oracle (gaussianrenderer_tpu/oracle.py) is a scalar port of the reference's
live GPU path; both compositors must agree with it to high PSNR, and the
Pallas and XLA compositors must agree with each other almost exactly.
"""

import numpy as np
import pytest

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.oracle import psnr, render_oracle
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene


def _setup(n=400, seed=0, h=96, w=128, **cfg_kw):
    scene = make_random_scene(n, seed=seed)
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(w / h)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=h, width=w, **cfg_kw)
    return scene, cam, cfg


@pytest.mark.parametrize("compositor", ["xla", "packed", "diff"])
def test_render_matches_oracle(compositor):
    scene, cam, cfg = _setup(compositor=compositor, chunk_size=16)
    if compositor == "packed":
        # Guard against the silent-fallback bug class: the packed path must
        # actually be eligible for this tile grid, or the test would be
        # exercising the XLA compositor under a different name.
        assert cfg.packed_compatible
    golden = render_oracle(scene, cam, cfg)
    fb, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb = np.asarray(fb)
    assert fb.shape == (3, cfg.height, cfg.width)
    assert not bool(stats.overflow)
    score = psnr(fb, golden)
    assert score >= 40.0, f"PSNR {score:.2f} dB < 40 dB ({compositor})"


def test_packed_16px_tiles_match_oracle():
    """16×16 tiles (the tile-size trade the sort-cost work unlocks —
    docs/sort_plan.md): 4× fewer pixel-instance pair tests per instance at
    ~2× the instance count. Must be pixel-faithful like the 32×32 default."""
    scene, cam, cfg = _setup(
        compositor="packed", num_tile_x=8, num_tile_y=6
    )  # 128×96 → 16×16-px tiles
    assert (cfg.tile_w, cfg.tile_h) == (16, 16) and cfg.packed_compatible
    golden = render_oracle(scene, cam, cfg)
    fb, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert not bool(stats.overflow)
    score = psnr(np.asarray(fb), golden)
    assert score >= 40.0, f"16px-tile PSNR {score:.2f} dB < 40 dB"


def test_unknown_compositor_rejected():
    scene, cam, cfg = _setup(compositor="pallas")  # v1 name was removed
    with pytest.raises(ValueError, match="unknown compositor"):
        render_frame(scene, cam.params(cfg.k_sigma), cfg)


def test_compositors_agree_closely():
    scene, cam, cfg = _setup(n=600, seed=7)
    fb_xla, _ = render_frame(
        scene, cam.params(cfg.k_sigma), RenderConfig(**{**cfg.__dict__, "compositor": "xla"})
    )
    fb_pak, _ = render_frame(
        scene, cam.params(cfg.k_sigma), RenderConfig(**{**cfg.__dict__, "compositor": "packed"})
    )
    # Packed features quantize the conic to 16-bit floats (≤2^-10 rel),
    # colors to 10 bits, opacity to 16 bits, and use _fast_exp (2.6e-6
    # relative): per-splat alpha deviates by ≤~7e-4 (ops/instances.py
    # error budget), a marginal alpha can cross the 1e-3 blend threshold
    # differently, and a couple of such deviations can stack on one
    # pixel — so the worst-pixel bound is a few threshold granules while
    # the mean must stay at quantization scale.
    d = np.abs(np.asarray(fb_xla) - np.asarray(fb_pak))
    assert d.max() < 5e-3, d.max()
    # 10-bit color: mean |err| on a covered pixel ≈ (1/1023)/4 ≈ 2.4e-4;
    # at this scene's ~10% coverage the image mean sits near 2.4e-5.
    assert d.mean() < 5e-5, d.mean()


def test_clustered_scene_matches_oracle():
    """Non-uniform (trained-3DGS-statistics) scene fidelity gate: surface
    clustering + log-normal scales + bimodal opacity stress the wide
    instance tiers and overdraw behavior that the uniform random scene
    never exercises (VERDICT r1 'real-scene evidence')."""
    from gaussianrenderer_tpu.scene.io import make_clustered_scene
    from gaussianrenderer_tpu.render import make_renderer

    scene = make_clustered_scene(3000, seed=11)
    cam = Camera()
    cam.set_position([0.0, 1.2, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(128 / 96)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=96, width=128, compositor="packed")
    golden = render_oracle(scene, cam, cfg)
    # auto_tier calibrates the ladder from this scene's area histogram —
    # heavy-tailed scales are exactly what the calibrator exists for.
    render = make_renderer(scene, cfg, auto_tier=True)
    fb, stats = render(cam.params(cfg.k_sigma))
    assert not bool(stats.overflow)
    assert not bool(stats.center_clipped)
    score = psnr(np.asarray(fb), golden)
    assert score >= 40.0, f"clustered-scene PSNR {score:.2f} dB < 40 dB"


def test_empty_scene_renders_black():
    scene, cam, cfg = _setup(n=4, compositor="xla")
    # Move camera to face away from every splat.
    cam.set_position([0.0, 0.0, -50.0])
    cam.set_look_at([0.0, 0.0, -100.0])
    cam.update_camera_matrices()
    fb, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert int(stats.num_culled) == 0
    np.testing.assert_array_equal(np.asarray(fb), 0.0)


def test_camera_orbit_changes_image():
    scene, cam, cfg = _setup(compositor="xla")
    fb0, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    cam.orbit(30.0, 10.0)
    fb1, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert float(np.abs(np.asarray(fb0) - np.asarray(fb1)).max()) > 1e-3


def test_k_sigma_is_traced_not_static():
    """Changing k_sigma must not retrigger compilation (same jit cache)."""
    scene, cam, cfg = _setup(compositor="xla")
    from gaussianrenderer_tpu.render import _render_frame_static

    fn = _render_frame_static.lower(scene, cam.params(3.0), cfg).compile()
    fb_a, _ = fn(scene, cam.params(3.0))
    fb_b, _ = fn(scene, cam.params(1.0))
    # smaller splat radius => less coverage => different image
    assert float(np.abs(np.asarray(fb_a) - np.asarray(fb_b)).max()) > 0


def test_overflow_flag_reports_dropped_instances():
    scene, cam, cfg = _setup(
        n=500,
        compositor="xla",
        instance_multiplier=0.01,
        min_instance_capacity=16,
    )
    _, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert bool(stats.overflow)
    assert int(stats.num_instances) > 16
