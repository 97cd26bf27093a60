"""Compact .gsz scene storage: roundtrip accuracy, size, render PSNR.

The reference's "memory-efficient Gaussian data storage" stretch goal
(reference README.md:53). The quality gate is the same one the packed
render path's quantizations answer to: the decoded scene must render
within the PSNR envelope of the original.
"""

import numpy as np
import pytest

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.scene import compact
from gaussianrenderer_tpu.scene.io import make_clustered_scene, save_ply


@pytest.fixture(scope="module")
def scene():
    return make_clustered_scene(4000, seed=3, sh_degree=2)


def test_roundtrip_field_accuracy(scene, tmp_path):
    path = str(tmp_path / "s.gsz")
    stats = compact.save_compact(scene, path, profile="q16")
    back = compact.load_compact(path)

    pos = np.asarray(scene.positions)
    bpos = np.asarray(back.positions)
    span = pos.max(axis=0) - pos.min(axis=0)
    # 24-bit grid: half-step rounding + the final f32 cast (whose ULP is
    # the same order as the grid step) → bounded by one full step.
    assert np.abs(bpos - pos).max() <= (span / (1 << 24)).max() * 1.01

    # Quaternions: same ROTATION (q ≡ −q), 16-bit components.
    q = np.asarray(scene.quats)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    bq = np.asarray(back.quats)
    dots = np.abs(np.sum(q * bq, axis=1))
    assert dots.min() > 1.0 - 1e-6

    op = np.asarray(scene.opacity)
    assert np.abs(np.asarray(back.opacity) - np.clip(op, 0, 1)).max() < 1e-4

    # Scales on a 16-bit log grid: relative error < half a grid step.
    ls = np.log(np.asarray(scene.scales))
    step = (ls.max() - ls.min()) / ((1 << 16) - 1)
    assert np.abs(np.log(np.asarray(back.scales)) - ls).max() <= step * 0.51

    sh = np.asarray(scene.sh)
    shstep = (sh[:, :3].max() - sh[:, :3].min()) / ((1 << 16) - 1)
    assert np.abs(np.asarray(back.sh)[:, :3] - sh[:, :3]).max() <= (
        shstep * 0.51
    )
    assert stats["n"] == scene.num_gaussians


def test_size_beats_ply(scene, tmp_path):
    gsz = str(tmp_path / "s.gsz")
    ply = str(tmp_path / "s.ply")
    save_ply(scene, ply)
    import os

    s16 = compact.save_compact(scene, gsz, profile="q16")
    r16 = os.path.getsize(ply) / os.path.getsize(gsz)
    s8 = compact.save_compact(scene, gsz, profile="q8")
    r8 = os.path.getsize(ply) / os.path.getsize(gsz)
    # q16: ~78 B/splat quantized (vs 164 B PLY) → ≥2× even if DEFLATE
    # finds nothing; q8 halves the SH/scale payload on top.
    assert r16 > 2.0, (s16, r16)
    assert r8 > 3.5, (s8, r8)
    assert r8 > r16


def test_render_psnr_q16(scene, tmp_path):
    """Decoded q16 scene renders within the quantization envelope of the
    original through the full-f32 xla compositor."""
    from gaussianrenderer_tpu.oracle import psnr
    from gaussianrenderer_tpu.render import render_frame
    from gaussianrenderer_tpu.scene.camera import Camera

    path = str(tmp_path / "s.gsz")
    compact.save_compact(scene, path, profile="q16")
    back = compact.load_compact(path)

    cam = Camera()
    cam.set_position([-1.5, -1.5, -4.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(1.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=128, width=128, compositor="xla", sh_degree=2)
    fb0, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb1, _ = render_frame(back, cam.params(cfg.k_sigma), cfg)
    score = psnr(np.asarray(fb0), np.asarray(fb1))
    assert score > 55.0, score


def test_q8_renders_reasonably(scene, tmp_path):
    from gaussianrenderer_tpu.oracle import psnr
    from gaussianrenderer_tpu.render import render_frame
    from gaussianrenderer_tpu.scene.camera import Camera

    path = str(tmp_path / "s.gsz")
    compact.save_compact(scene, path, profile="q8")
    back = compact.load_compact(path)
    cam = Camera()
    cam.set_position([-1.5, -1.5, -4.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.update_camera_matrices()
    cfg = RenderConfig(height=96, width=96, compositor="xla", sh_degree=2)
    fb0, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb1, _ = render_frame(back, cam.params(cfg.k_sigma), cfg)
    assert psnr(np.asarray(fb0), np.asarray(fb1)) > 35.0


def test_extreme_scales_and_single_splat(tmp_path):
    """Edge cases: huge/tiny scales survive the log grid; 1-splat scene
    (degenerate min==max grids) roundtrips."""
    import jax.numpy as jnp

    scene = make_clustered_scene(64, seed=2, sh_degree=0)
    sc = np.asarray(scene.scales).copy()
    sc[0] = 1e-12
    sc[1] = 50.0
    scene = scene._replace(scales=jnp.asarray(sc))
    p = str(tmp_path / "e.gsz")
    compact.save_compact(scene, p)
    back = compact.load_compact(p)
    bs = np.asarray(back.scales)
    assert bs.min() > 0 and np.isfinite(bs).all()
    # Log-grid relative error stays bounded even across 13 decades.
    rel = np.abs(np.log(bs) - np.log(sc)).max()
    step = (np.log(sc).max() - np.log(sc).min()) / ((1 << 16) - 1)
    assert rel <= step * 0.51

    single = scene._replace(
        positions=scene.positions[:1], sh=scene.sh[:1],
        opacity=scene.opacity[:1], scales=scene.scales[:1],
        quats=scene.quats[:1],
    )
    p1 = str(tmp_path / "one.gsz")
    compact.save_compact(single, p1)
    b1 = compact.load_compact(p1)
    assert b1.num_gaussians == 1
    np.testing.assert_allclose(
        np.asarray(b1.positions), np.asarray(single.positions), atol=1e-5
    )


def test_spacetime_and_nonfinite_handling(tmp_path):
    import jax.numpy as jnp

    scene = make_clustered_scene(256, seed=1, sh_degree=1)
    tp = np.random.default_rng(0).uniform(0, 1, (256, 5)).astype(np.float32)
    pos = np.asarray(scene.positions).copy()
    pos[7] = np.nan  # training artifact — must be dropped, not poison bbox
    scene = scene._replace(
        positions=jnp.asarray(pos), time_params=jnp.asarray(tp)
    )
    path = str(tmp_path / "s.gsz")
    stats = compact.save_compact(scene, path)
    assert stats["n"] == 255
    back = compact.load_compact(path)
    assert back.is_spacetime and back.time_params.shape == (255, 5)
    assert np.isfinite(np.asarray(back.positions)).all()
    expect = np.delete(tp, 7, axis=0)
    np.testing.assert_allclose(np.asarray(back.time_params), expect)


def test_load_scene_dispatch_and_viewer_drop(scene, tmp_path):
    """gr.load_scene and Canvas drag-drop accept .gsz by extension."""
    import gaussianrenderer_tpu as gr

    gsz = str(tmp_path / "drop.gsz")
    gr.save_compact(scene, gsz)
    back = gr.load_scene(gsz)
    assert back.num_gaussians == scene.num_gaussians

    from gaussianrenderer_tpu.viewer import Canvas

    canvas = Canvas(width=64, height=64)
    canvas.drop_file(gsz)
    assert canvas.scene.num_gaussians == scene.num_gaussians

    ply = str(tmp_path / "drop.ply")
    save_ply(scene, ply)
    assert gr.load_scene(ply).num_gaussians == scene.num_gaussians

    # max_sh_degree truncation has load_ply semantics on .gsz too.
    trunc = gr.load_scene(gsz, max_sh_degree=1)
    assert trunc.sh.shape[1] == 12
    with pytest.raises(TypeError, match="unsupported"):
        gr.load_scene(gsz, use_native=True)


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "x.gsz"
    p.write_bytes(b"NOPExxxxxxxx")
    with pytest.raises(ValueError, match="magic"):
        compact.load_compact(str(p))


def test_splat_roundtrip_and_render(scene, tmp_path):
    """.splat (antimatter15 web-viewer format): positions/scales exact
    f32, DC color within u8 steps, quaternions within the u8 grid, SH
    rest dropped (DC-only format), importance ordering by default, and
    the loaded scene renders against the original's DC-only render at
    high PSNR through load_scene dispatch."""
    from gaussianrenderer_tpu.scene.io import load_scene

    path = str(tmp_path / "s.splat")
    stats = compact.save_splat(scene, path)
    assert stats["bytes"] == 32 * scene.num_gaussians
    back = compact.load_splat(path)
    assert back.num_gaussians == scene.num_gaussians

    # Positions/scales ride as raw f32 — set-equality up to reordering.
    pos = np.asarray(scene.positions)
    bpos = np.asarray(back.positions)
    order = np.lexsort(pos.T)
    border = np.lexsort(bpos.T)
    np.testing.assert_array_equal(pos[order], bpos[border])
    np.testing.assert_array_equal(
        np.asarray(scene.scales)[order], np.asarray(back.scales)[border]
    )
    # Opacity and DC color within one u8 step.
    assert np.abs(
        np.asarray(scene.opacity)[order] - np.asarray(back.opacity)[border]
    ).max() <= 0.5 / 255.0 + 1e-6
    c0 = 0.28209479177387814
    dc = np.clip(0.5 + c0 * np.asarray(scene.sh[:, :3]), 0.0, 1.0)
    bdc = 0.5 + c0 * np.asarray(back.sh[:, :3])
    assert np.abs(dc[order] - bdc[border]).max() <= 0.5 / 255.0 + 1e-6
    # Rest bands are zero (DC-only format), sh padded to degree 2.
    assert back.sh.shape[1] == 27 and not np.asarray(back.sh[:, 3:]).any()
    # Quaternion direction within the u8 grid (sign-insensitive).
    q = np.asarray(scene.quats)[order]
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    bq = np.asarray(back.quats)[border]
    dot = np.abs(np.sum(q * bq, axis=1))
    assert dot.min() > 1.0 - 2e-4

    # Renders like the DC-only original (deg-0 config removes the only
    # intended loss; u8 color/opacity noise stays above 35 dB).
    import jax.numpy as jnp

    from gaussianrenderer_tpu.oracle import psnr
    from gaussianrenderer_tpu.render import render_frame
    from gaussianrenderer_tpu.scene.camera import Camera

    cam = Camera()
    cam.set_position([0.0, 0.5, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(128 / 96)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=96, width=128, sh_degree=0, compositor="xla")
    via_dispatch = load_scene(path)
    fb_orig, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb_back, _ = render_frame(via_dispatch, cam.params(cfg.k_sigma), cfg)
    score = psnr(np.asarray(fb_orig), np.asarray(fb_back))
    assert score > 35.0, f".splat render PSNR {score:.2f} dB"


def test_splat_rejects_bad_size(tmp_path):
    p = tmp_path / "bad.splat"
    p.write_bytes(b"\x00" * 33)
    with pytest.raises(ValueError, match="not a multiple"):
        compact.load_splat(str(p))


def test_nonfinite_nonposition_fields_do_not_poison_grids(tmp_path):
    """ONE non-finite value in any encoded field must drop that splat,
    not corrupt the field's shared min/max grid for the whole scene
    (an inf scale is routine: load_ply's exp() overflows f32 on
    exploded trained splats)."""
    import jax.numpy as jnp

    scene = make_clustered_scene(256, seed=2, sh_degree=1)
    sh = np.asarray(scene.sh).copy()
    sh[3, 5] = np.nan
    scales = np.asarray(scene.scales).copy()
    scales[9, 0] = np.inf
    opacity = np.asarray(scene.opacity).copy()
    opacity[11] = np.nan
    bad = scene._replace(
        sh=jnp.asarray(sh), scales=jnp.asarray(scales),
        opacity=jnp.asarray(opacity),
    )
    path = str(tmp_path / "s.gsz")
    stats = compact.save_compact(bad, path)
    assert stats["n"] == 253
    back = compact.load_compact(path)
    for field in ("positions", "sh", "opacity", "scales", "quats"):
        assert np.isfinite(np.asarray(getattr(back, field))).all(), field
    # Survivors keep their values (position check: one 24-bit grid step).
    keep = np.delete(np.arange(256), [3, 9, 11])
    pos = np.asarray(scene.positions)[keep]
    span = pos.max(axis=0) - pos.min(axis=0)
    assert np.abs(np.asarray(back.positions) - pos).max() \
        <= (span / (1 << 24)).max() * 1.01


def test_splat_drops_nonfinite_splats(tmp_path):
    """save_splat: NaN opacity must not poison the importance argsort or
    reach an undefined NaN→u8 cast."""
    import jax.numpy as jnp

    scene = make_clustered_scene(64, seed=4, sh_degree=0)
    opacity = np.asarray(scene.opacity).copy()
    opacity[5] = np.nan
    scales = np.asarray(scene.scales).copy()
    scales[8, 2] = np.inf
    bad = scene._replace(
        opacity=jnp.asarray(opacity), scales=jnp.asarray(scales)
    )
    path = str(tmp_path / "s.splat")
    stats = compact.save_splat(bad, path)
    assert stats["num_gaussians"] == 62
    back = compact.load_splat(path)
    assert back.num_gaussians == 62
    for field in ("positions", "sh", "opacity", "scales", "quats"):
        assert np.isfinite(np.asarray(getattr(back, field))).all(), field
