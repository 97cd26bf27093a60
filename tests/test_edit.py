"""Scene editing (scene/edit.py): transform/crop/merge/prune.

The transform tests pin the SH rotation exactly: per-band Wigner
matrices are validated by function-space equivariance, and the full
similarity transform by rendering the transformed scene from the
correspondingly transformed camera — which must reproduce the original
image through the real pipeline.
"""

import numpy as np
import pytest

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.oracle import psnr
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene import edit
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene


def _rot(axis, deg):
    return edit.axis_angle_rotation(axis, deg)


R_TEST = _rot([0.3, 1.0, -0.5], 73.0)


def test_sh_rotation_equivariance():
    """rotate_sh then evaluate at R·d == evaluate original at d, for all
    bands through degree 3 (unclamped, so the test sees the raw field)."""
    from gaussianrenderer_tpu.ops.sh import eval_sh

    scene = make_random_scene(64, seed=1, sh_degree=3)
    rotated = edit.transform_scene(scene, rotation=R_TEST)
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ref = eval_sh(np.asarray(scene.sh), dirs.astype(np.float32), 3,
                  clamp=False)
    got = eval_sh(np.asarray(rotated.sh),
                  (dirs @ R_TEST.T).astype(np.float32), 3, clamp=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_band_rotation_identity_and_orthogonality():
    for l in (1, 2, 3):
        np.testing.assert_allclose(edit.sh_band_rotation(np.eye(3), l),
                                   np.eye(2 * l + 1), atol=1e-10)
        x = edit.sh_band_rotation(R_TEST, l)
        # Real-basis Wigner matrices are orthogonal.
        np.testing.assert_allclose(x @ x.T, np.eye(2 * l + 1), atol=1e-9)


def test_transformed_scene_matches_transformed_camera():
    """Similarity-transform the scene AND the camera pose: the rendered
    image must reproduce the original through the real pipeline
    (positions, quats, scales, velocities, and SH all consistent)."""
    scene = make_random_scene(1500, seed=3, sh_degree=2,
                              scale_range=(0.03, 0.15))
    s, t = 1.6, np.array([0.7, -4.0, 2.5])
    moved = edit.transform_scene(scene, rotation=R_TEST, translation=t,
                                 scale=s)

    cfg = RenderConfig(height=96, width=128, compositor="xla")

    def render(sc, pos, look, up, near, far):
        cam = Camera()
        cam.set_position(pos)
        cam.set_look_at(look)
        cam.set_world_up(up)
        cam.set_fov_y(60.0)
        cam.set_aspect_ratio(128 / 96)
        cam.set_clipping_planes(near, far)
        cam.update_camera_matrices()
        fb, _ = render_frame(sc, cam.params(cfg.k_sigma), cfg)
        return np.asarray(fb)

    pos = np.array([0.5, 0.8, 5.5])
    look = np.zeros(3)
    up = np.array([0.0, 1.0, 0.0])
    ref = render(scene, pos, look, up, 0.2, 100.0)
    got = render(
        moved,
        s * (R_TEST @ pos) + t,
        s * (R_TEST @ look) + t,
        R_TEST @ up,
        0.2 * s,
        100.0 * s,
    )
    score = psnr(ref, got)
    assert score > 40.0, f"transformed render PSNR {score:.1f} dB"


def test_transform_rejects_bad_inputs():
    scene = make_random_scene(8, seed=0)
    with pytest.raises(ValueError, match="rotation"):
        edit.transform_scene(scene, rotation=np.eye(3) * 2.0)
    with pytest.raises(ValueError, match="scale"):
        edit.transform_scene(scene, scale=-1.0)


def test_crop_partitions_and_merge_restores():
    """Complementary half-open crops partition the scene; merging the
    parts renders the same image (merge = a permutation of the splats)."""
    scene = make_random_scene(1200, seed=5, sh_degree=1)
    big = 1e9
    left = edit.crop_scene(scene, [-big, -big, -big], [0.0, big, big])
    right = edit.crop_scene(scene, [0.0, -big, -big], [big, big, big])
    assert left.num_gaussians + right.num_gaussians == scene.num_gaussians
    assert np.asarray(left.positions)[:, 0].max() < 0.0
    assert np.asarray(right.positions)[:, 0].min() >= 0.0

    merged = edit.merge_scenes(left, right)
    assert merged.num_gaussians == scene.num_gaussians

    cfg = RenderConfig(height=64, width=96, compositor="xla")
    cam = Camera()
    cam.set_position([0.0, 0.3, 5.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(96 / 64)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    fb_ref, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb_got, _ = render_frame(merged, cam.params(cfg.k_sigma), cfg)
    score = psnr(np.asarray(fb_ref), np.asarray(fb_got))
    assert score > 40.0, f"merged render PSNR {score:.1f} dB"


def test_merge_pads_sh_and_time():
    """Mixed degrees zero-pad up; mixed static/spacetime gets
    time-invariant params for the static part."""
    a = make_random_scene(10, seed=0, sh_degree=0)
    b = make_random_scene(20, seed=1, sh_degree=2, spacetime=True)
    m = edit.merge_scenes(a, b)
    assert m.num_gaussians == 30
    assert m.sh.shape[1] == b.sh.shape[1]
    assert not np.asarray(m.sh[:10, 3:]).any()
    tp = np.asarray(m.time_params)
    assert tp.shape == (30, 5)
    assert (tp[:10, 1] == edit.STATIC_T_SIGMA).all()
    assert not tp[:10, 2:].any()
    # (t, sigma)-only spacetime input gets zero velocity columns.
    import jax.numpy as jnp

    c = b._replace(time_params=b.time_params[:, :2])
    m2 = edit.merge_scenes(c, b)
    assert np.asarray(m2.time_params).shape == (40, 5)
    assert not np.asarray(m2.time_params)[:20, 2:].any()


def test_prune():
    scene = make_random_scene(500, seed=2)
    kept = edit.prune_scene(scene, min_opacity=0.5)
    op = np.asarray(scene.opacity)
    assert kept.num_gaussians == int((op >= 0.5).sum())
    assert np.asarray(kept.opacity).min() >= 0.5
    small = edit.prune_scene(scene, max_scale=0.05)
    assert np.asarray(small.scales).max() <= 0.05
    assert small.num_gaussians < scene.num_gaussians
