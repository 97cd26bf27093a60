"""Saturation/overdraw culling (ops/satcull.py + kernel sat census).

The mechanism generalizes the reference's per-pixel early exit
(``render.cu:326-328``) across frames: splats provably behind last
frame's T<1e-3 fronts are dropped before the frame sort. These tests pin

* the gather-free MXU table lookup against ``jnp.take``,
* the dilated-max pyramid's conservativeness (samples never BELOW the
  true rect max — under-culling is the only allowed error direction),
* same-pose cull EXACTNESS: with cutoffs from the same pose, the culled
  frame's rgb equals the unculled frame to summation-order rounding
  (culled splats have zero blend weight at every pixel they touch; only
  chunk-boundary shifts reassociate the f32 sums),
* the kernel's per-block saturation indices against the framebuffer's
  accumulated alpha,
* frame coherence on an orbit (PSNR vs unculled ≥ 40 dB gate; measured
  ~110 dB at 3°/frame) and the sat_risk disocclusion flag,
* make_renderer's automatic state threading.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.ops import satcull
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene


def _cam(cfg, pos=(0.0, 0.0, 2.5)):
    cam = Camera()
    cam.set_position(list(pos))
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(cfg.width / cfg.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    return cam


def _overdraw_scene(n=30000):
    """Dense opaque splats close to the camera — most 16px blocks
    saturate within the front fraction of the depth range."""
    return make_random_scene(
        n, seed=0, extent=2.0, scale_range=(0.02, 0.08)
    ).prepared()


def test_lookup_kernel_matches_take():
    from gaussianrenderer_tpu.ops.pallas.lookup import bf16_ceil, table_lookup

    rng = np.random.default_rng(1)
    tab = bf16_ceil(jnp.asarray(rng.uniform(0.1, 1e4, 3000), jnp.float32))
    idx = jnp.asarray(rng.integers(0, 3000, 5000), jnp.int32)
    out = table_lookup(tab, idx)
    ref = jnp.take(tab.astype(jnp.float32), idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pyramid_sample_is_conservative():
    rng = np.random.default_rng(2)
    sy, sx = 68, 120
    img = rng.uniform(0.2, 100.0, size=(sy, sx)).astype(np.float32)
    table = satcull.build_pyramid(jnp.asarray(img))
    rects, true_max = [], []
    for _ in range(400):
        x0 = int(rng.integers(0, sx * 16 - 1))
        x1 = int(rng.integers(x0, sx * 16))
        y0 = int(rng.integers(0, sy * 16 - 1))
        y1 = int(rng.integers(y0, sy * 16))
        rects.append([x0, y0, x1, y1])
        true_max.append(
            img[y0 // 16 : y1 // 16 + 1, x0 // 16 : x1 // 16 + 1].max()
        )
    cut = satcull.rect_cutoff(
        table,
        jnp.asarray(np.array(rects, np.float32)),
        sx=sx,
        sy=sy,
        use_pallas=False,
    )
    assert np.all(np.asarray(cut) >= np.array(true_max) - 1e-5)
    # The pallas path (bf16 round-UP table) may only be looser.
    cut_p = satcull.rect_cutoff(
        table, jnp.asarray(np.array(rects, np.float32)), sx=sx, sy=sy
    )
    assert np.all(np.asarray(cut_p) >= np.asarray(cut) - 1e-5)


def test_same_pose_cull_is_exact_and_nontrivial():
    # sat_dilate=0: the static-camera configuration — dilation exists
    # only for inter-frame motion and erodes the cull near every front.
    scene = _overdraw_scene()
    cfg = RenderConfig(height=128, width=128, sat_cull=True, sat_dilate=0)
    cam = _cam(cfg)
    p = cam.params(cfg.k_sigma)
    fb0, st0 = render_frame(scene, p, cfg)
    sat = satcull.initial_cutoff(
        cfg.tiles_x, cfg.tiles_y, cfg.tile_w, cfg.tile_h
    )
    fb1, st1, sat1 = render_frame(scene, p, cfg, sat_state=sat)
    # Frame 1 (no cutoffs yet): nothing culled, image identical.
    assert int(st1.sat_culled) == 0
    assert bool(jnp.all(fb1 == fb0))
    assert int((np.asarray(sat1) < satcull.SAT_NONE).sum()) > 30
    # Frame 2, same pose: a real cull with an (order-rounding-) exact image.
    fb2, st2, _ = render_frame(scene, p, cfg, sat_state=sat1)
    assert int(st2.sat_culled) > 0.1 * scene.num_gaussians
    # The per-position cull drops far more instances than the per-splat
    # count alone implies (tile-granular cutoffs inside emission).
    assert int(st2.num_instances) < 0.7 * int(st1.num_instances)
    assert int(st2.sat_risk) == 0
    np.testing.assert_allclose(
        np.asarray(fb2), np.asarray(fb0), atol=2e-5
    )


def test_kernel_sat_matches_accumulated_alpha():
    scene = _overdraw_scene(20000)
    cfg = RenderConfig(height=96, width=160, sat_cull=True, output_alpha=True)
    cam = _cam(cfg)
    p = cam.params(cfg.k_sigma)
    sat = satcull.initial_cutoff(
        cfg.tiles_x, cfg.tiles_y, cfg.tile_w, cfg.tile_h
    )
    fb, _, cut = render_frame(scene, p, cfg, sat_state=sat)
    alpha = np.asarray(fb[3])  # (H, W)
    cut = np.asarray(cut)  # (sy, sx)
    sy, sx = cut.shape
    for by in range(sy):
        for bx in range(sx):
            blk = alpha[by * 16 : (by + 1) * 16, bx * 16 : (bx + 1) * 16]
            if blk.size == 0:
                continue
            if cut[by, bx] < satcull.SAT_NONE:
                # Saturated: every in-image pixel's T < 1e-3.
                assert blk.min() > 1.0 - 1.1e-3, (by, bx, blk.min())
            else:
                # Unsaturated: some pixel kept T >= 1e-3 (up to the
                # kernel's ungated-T reporting envelope, see
                # tile_render2 output note).
                assert blk.min() <= 1.0 - 0.9e-3, (by, bx, blk.min())


def test_orbit_coherence_psnr_and_risk():
    scene = _overdraw_scene()
    cfg = RenderConfig(height=128, width=128, sat_cull=True)
    cam = _cam(cfg)
    sat = satcull.initial_cutoff(
        cfg.tiles_x, cfg.tiles_y, cfg.tile_w, cfg.tile_h
    )
    worst = np.inf
    culled_any = False
    for _ in range(4):
        cam.orbit(3.0, 0.0)
        cam.update_camera_matrices()
        p = cam.params(cfg.k_sigma)
        fb_ref, _ = render_frame(scene, p, cfg)
        fb, st, sat = render_frame(scene, p, cfg, sat_state=sat)
        culled_any |= int(st.sat_culled) > 0
        mse = float(jnp.mean((fb - fb_ref) ** 2))
        psnr = 120.0 if mse == 0 else 10 * np.log10(1.0 / mse)
        worst = min(worst, psnr)
    assert culled_any
    assert worst >= 40.0, f"orbit PSNR {worst:.1f} dB under the gate"


def test_make_renderer_threads_sat_state():
    from gaussianrenderer_tpu.render import make_renderer

    scene = _overdraw_scene()
    cfg = RenderConfig(height=128, width=128, sat_cull=True)
    cam = _cam(cfg)
    render = make_renderer(scene, cfg)
    p = cam.params(cfg.k_sigma)
    _, st1 = render(p)
    assert st1.sat_culled is not None and int(st1.sat_culled) == 0
    _, st2 = render(p)
    assert int(st2.sat_culled) > 0


def test_initial_cutoff_never_culls():
    sat = satcull.initial_cutoff(4, 3, 32, 32)
    table = satcull.build_pyramid(sat)
    rng = np.random.default_rng(3)
    aabb = np.stack(
        [
            rng.uniform(0, 100, 64),
            rng.uniform(0, 90, 64),
            rng.uniform(0, 128, 64),
            rng.uniform(0, 96, 64),
        ],
        axis=1,
    ).astype(np.float32)
    mask = satcull.cull_mask(
        jnp.ones(64, bool),
        jnp.full((64,), 99.0),
        jnp.asarray(aabb),
        table,
        sx=8,
        sy=6,
        margin=0.0,
        depth_step=1e-4,
        use_pallas=False,
    )
    assert not bool(jnp.any(mask))


def test_make_renderer_recalibrates_ladder_after_cull():
    """Session parity with the bench: frame 2 (the first culled frame)
    recalibrates the ladder against the culled histogram — without it
    static windows keep the uncull lane count and the cull only helps
    the compositor (measured 121.6 vs 90.8 ms at c4, PERF_NOTES r5)."""
    from gaussianrenderer_tpu.render import ladder_lanes, make_renderer

    scene = _overdraw_scene()
    cfg = RenderConfig(height=128, width=128, sat_cull=True, sat_dilate=0)
    cam = _cam(cfg)
    render = make_renderer(scene, cfg, auto_tier=True)
    p = cam.params(cfg.k_sigma)
    _, _ = render(p)
    t1 = render.current_cfg().tiers

    def lanes(t):
        return (
            int(t[0][1]) if t and int(t[0][0]) == 0
            else ladder_lanes(t, scene.num_gaussians)
        )

    _, st2 = render(p)
    t2 = render.current_cfg().tiers
    assert int(st2.sat_culled) > 0
    assert lanes(t2) < lanes(t1), (t1, t2)
    _, st3 = render(p)
    assert not bool(st3.overflow)
