"""Per-scene calibration sidecar (scene/calibration.py, VERDICT r3 #6)."""

import json

import numpy as np

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.scene.calibration import (
    config_key,
    load_calibration,
    scene_fingerprint,
    sidecar_path,
    store_calibration,
)
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene, save_ply


def _scene_file(tmp_path, n=300, seed=11):
    scene = make_random_scene(n, seed=seed)
    path = str(tmp_path / "scene.ply")
    save_ply(scene, path)
    return scene, path


def test_sidecar_roundtrip_and_bucket_isolation(tmp_path):
    _, path = _scene_file(tmp_path)
    cfg_a = RenderConfig(height=128, width=128)
    cfg_b = RenderConfig(height=256, width=256)
    assert load_calibration(path, cfg_a) is None

    tiers_a = ((0, 4096), (4, 1024), (64, 256))
    assert store_calibration(
        path, cfg_a, tiers_a, strip_bounds=(0, 2, 4), a2a_caps=(512, 64)
    )
    got = load_calibration(path, cfg_a)
    assert got["tiers"] == tiers_a
    assert got["strip_bounds"] == (0, 2, 4)
    assert got["a2a_caps"] == (512, 64)
    # Another resolution bucket is independent.
    assert load_calibration(path, cfg_b) is None
    tiers_b = ((1, 2048),)
    store_calibration(path, cfg_b, tiers_b)
    assert load_calibration(path, cfg_a)["tiers"] == tiers_a
    assert load_calibration(path, cfg_b)["tiers"] == tiers_b
    assert config_key(cfg_a) != config_key(cfg_b)


def test_sidecar_invalidated_by_scene_change(tmp_path):
    _, path = _scene_file(tmp_path)
    cfg = RenderConfig(height=128, width=128)
    store_calibration(path, cfg, ((1, 512),))
    assert load_calibration(path, cfg) is not None
    fp_old = scene_fingerprint(path)
    # Mutate the scene file: the sidecar must go stale, not mislead.
    scene2 = make_random_scene(300, seed=99)
    save_ply(scene2, path)
    assert scene_fingerprint(path) != fp_old
    assert load_calibration(path, cfg) is None


def test_sidecar_corruption_is_advisory(tmp_path):
    _, path = _scene_file(tmp_path)
    cfg = RenderConfig(height=128, width=128)
    with open(sidecar_path(path), "w") as f:
        f.write("{not json")
    assert load_calibration(path, cfg) is None  # unreadable == absent
    # And store still works (overwrites the corrupt file).
    assert store_calibration(path, cfg, ((1, 512),))
    assert load_calibration(path, cfg)["tiers"] == ((1, 512),)
    with open(sidecar_path(path)) as f:
        assert json.load(f)["format"] == 1


def test_make_renderer_seeds_from_sidecar(tmp_path, monkeypatch):
    """Second session: the sidecar ladder seeds cfg.tiers and the
    first-frame recalibration (the second compile) is skipped."""
    from gaussianrenderer_tpu import render as render_mod

    scene, path = _scene_file(tmp_path)
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(1.0)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=128, width=128, compositor="packed")
    cp = cam.params(cfg.k_sigma)

    # Session 1: auto_tier calibrates from the first frame and stores.
    r1 = render_mod.make_renderer(
        scene, cfg, auto_tier=True, scene_path=path
    )
    fb1, st1 = r1(cp)
    tiers1 = r1.current_cfg().tiers
    assert tiers1 is not None
    assert load_calibration(path, cfg)["tiers"] == tiers1

    # Session 2: seeded — calibrate_tiers must NOT run again.
    calls = []
    orig = render_mod.calibrate_tiers

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(render_mod, "calibrate_tiers", spy)
    r2 = render_mod.make_renderer(
        scene, cfg, auto_tier=True, scene_path=path
    )
    assert r2.current_cfg().tiers == tiers1
    fb2, st2 = r2(cp)
    assert not calls, "seeded session must skip first-frame recalibration"
    assert not bool(st2.overflow)
    np.testing.assert_allclose(
        np.asarray(fb2), np.asarray(fb1), atol=1e-6
    )
