"""Blender / NeRF-synthetic transforms*.json dataset ingestion.

The upstream 3DGS trainer reads exactly two capture layouts — COLMAP
workspaces and Blender transforms files (its ``dataset_readers.py``);
``scene/blender.py`` is the second half of that surface (COLMAP is
covered by test_colmap.py). These tests build tiny synthetic datasets
on disk and check camera-convention exactness, FOV derivation across
the three intrinsics encodings, RGBA background compositing, D-NeRF
timed frames, split selection, and the fit_scene integration.
"""

import json
import math
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gaussianrenderer_tpu.config import RenderConfig, parse_color
from gaussianrenderer_tpu.scene import blender
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.train import dataset_image_shape, load_views

H, W = 32, 48


def _write_dataset(tmp_path, meta, images, name="transforms_train.json"):
    """images: {relpath (no ext): (H, W, 4) uint8 array} → PNG files."""
    from PIL import Image

    for rel, arr in images.items():
        path = os.path.join(tmp_path, rel + ".png")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(arr).save(path)
    with open(os.path.join(tmp_path, name), "w") as fh:
        json.dump(meta, fh)
    return str(tmp_path)


def _c2w_opengl(position, look_at, up=(0.0, 1.0, 0.0)):
    """OpenGL-convention camera-to-world (x right, y up, z backward)."""
    pos = np.asarray(position, np.float64)
    f = np.asarray(look_at, np.float64) - pos
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    m = np.eye(4, dtype=np.float64)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = r, u, -f, pos
    return m.tolist()


def _rgba(rgb, alpha=255):
    img = np.zeros((H, W, 4), np.uint8)
    img[..., :3] = rgb
    img[..., 3] = alpha
    return img


def test_load_blender_camera_and_target(tmp_path):
    """The loaded camera reproduces the OpenGL pose exactly, and the
    target lands in the planar bottom-up training layout."""
    pos, look = (1.0, 2.0, 3.0), (0.0, 0.5, 0.0)
    img = _rgba((10, 200, 30))
    img[0, 0, :3] = (255, 0, 0)  # top-left marker
    d = _write_dataset(
        tmp_path,
        {
            "camera_angle_x": 0.9,
            "frames": [
                {"file_path": "./train/r_0",
                 "transform_matrix": _c2w_opengl(pos, look)},
            ],
        },
        {"train/r_0": img},
    )
    cfg = RenderConfig(height=H, width=W)
    views = load_views(d, cfg)
    assert len(views) == 1 and len(views[0]) == 2
    cam_p, target = views[0]

    expected = Camera.from_pose(
        np.asarray(_c2w_opengl(pos, look), np.float32),
        fov_y_deg=math.degrees(2 * math.atan(math.tan(0.45) * H / W)),
        aspect=W / H, near=0.01, far=100.0, convention="opengl",
    ).params(3.0)
    np.testing.assert_allclose(cam_p.view, expected.view, atol=1e-6)
    np.testing.assert_allclose(cam_p.proj, expected.proj, atol=1e-6)
    np.testing.assert_allclose(cam_p.position, pos, atol=1e-6)

    assert target.shape == (3, H, W)
    # Bottom-up flip: the image's top-left red marker is at row H-1.
    np.testing.assert_allclose(
        np.asarray(target[:, H - 1, 0]), [1.0, 0.0, 0.0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(target[:, 0, 0]), np.array([10, 200, 30]) / 255.0,
        atol=1e-6,
    )


def test_fov_encodings_agree(tmp_path):
    """camera_angle_x, camera_angle_y, and fl_y all describe the same
    lens; the three encodings must produce identical projections."""
    fov_y = 2 * math.atan(math.tan(0.45) * H / W)
    metas = [
        {"camera_angle_x": 0.9},
        {"camera_angle_y": fov_y},
        {"fl_y": H / (2 * math.tan(fov_y / 2)), "h": H, "w": W},
        # frame-level override beats a bogus file-level value
        {"camera_angle_x": 2.5, "_frame": {"camera_angle_x": 0.9}},
    ]
    projs = []
    for i, meta in enumerate(metas):
        frame_extra = meta.pop("_frame", {})
        meta["frames"] = [dict(
            file_path="r_0",
            transform_matrix=_c2w_opengl((0, 0, 4), (0, 0, 0)),
            **frame_extra,
        )]
        d = _write_dataset(tmp_path / str(i), meta, {"r_0": _rgba((9, 9, 9))})
        cam_p, _ = load_views(d, RenderConfig(height=H, width=W))[0]
        projs.append(np.asarray(cam_p.proj))
    for p in projs[1:]:
        np.testing.assert_allclose(p, projs[0], rtol=1e-6)


def test_rgba_composites_over_cfg_background(tmp_path):
    half = _rgba((255, 0, 0), alpha=128)  # half-transparent red
    d = _write_dataset(
        tmp_path,
        {"camera_angle_x": 0.9, "frames": [
            {"file_path": "r_0",
             "transform_matrix": _c2w_opengl((0, 0, 4), (0, 0, 0))},
        ]},
        {"r_0": half},
    )
    cfg = RenderConfig(height=H, width=W, background=parse_color("white"))
    (_, target), = load_views(d, cfg)
    a = 128 / 255.0
    np.testing.assert_allclose(
        np.asarray(target[:, 0, 0]), [a + (1 - a), (1 - a), (1 - a)],
        atol=1e-6,
    )
    # No background configured → composite over black.
    (_, target0), = load_views(d, RenderConfig(height=H, width=W))
    np.testing.assert_allclose(
        np.asarray(target0[:, 0, 0]), [a, 0.0, 0.0], atol=1e-6
    )


def test_downscale_resize_and_aspect_guard(tmp_path):
    """Images at a different same-aspect resolution resize to cfg (the
    upstream -r downscale); an aspect mismatch raises."""
    big = np.zeros((2 * H, 2 * W, 4), np.uint8)
    big[..., :3] = (0, 255, 0)
    big[..., 3] = 255
    d = _write_dataset(
        tmp_path,
        {"camera_angle_x": 0.9, "h": 2 * H, "w": 2 * W, "frames": [
            {"file_path": "r_0",
             "transform_matrix": _c2w_opengl((0, 0, 4), (0, 0, 0))},
        ]},
        {"r_0": big},
    )
    (_, target), = load_views(d, RenderConfig(height=H, width=W))
    assert target.shape == (3, H, W)
    np.testing.assert_allclose(
        np.asarray(target[:, H // 2, W // 2]), [0.0, 1.0, 0.0], atol=1e-6
    )
    with pytest.raises(ValueError, match="aspect"):
        load_views(d, RenderConfig(height=H, width=2 * W))


def test_fl_y_without_meta_hw_is_image_based(tmp_path):
    """``fl_y`` is in pixels of the dataset's own images; when the meta
    lacks ``h``/``w`` the loader must probe the image — under the -r
    downscale cfg is smaller, and using it as the basis would misread
    the focal as a wider lens."""
    fov_y = 2 * math.atan(math.tan(0.45) * H / W)
    big = np.zeros((2 * H, 2 * W, 4), np.uint8)
    big[..., 3] = 255
    d = _write_dataset(
        tmp_path,
        {  # no "h"/"w" keys — focal in the 2H-pixel image's units
            "fl_y": (2 * H) / (2 * math.tan(fov_y / 2)),
            "frames": [{"file_path": "r_0",
                        "transform_matrix": _c2w_opengl((0, 0, 4), (0, 0, 0))}],
        },
        {"r_0": big},
    )
    (cam_small, _), = load_views(d, RenderConfig(height=H, width=W))
    (cam_native, _), = load_views(d, RenderConfig(height=2 * H, width=2 * W))
    np.testing.assert_allclose(
        np.asarray(cam_small.proj), np.asarray(cam_native.proj), rtol=1e-6
    )


def test_split_rejected_for_non_transforms_datasets(tmp_path):
    """split= only means something for transforms*.json layouts; on a
    poses.json dataset it must raise, not silently score the wrong set."""
    with open(os.path.join(tmp_path, "poses.json"), "w") as fh:
        json.dump([], fh)
    with pytest.raises(ValueError, match="transforms"):
        load_views(str(tmp_path), RenderConfig(height=H, width=W),
                   split="test")


def test_dnerf_time_and_stride(tmp_path):
    frames = [
        {"file_path": f"r_{i}", "time": i / 3.0,
         "transform_matrix": _c2w_opengl((0, 0, 4), (0, 0, 0))}
        for i in range(4)
    ]
    d = _write_dataset(
        tmp_path, {"camera_angle_x": 0.9, "frames": frames},
        {f"r_{i}": _rgba((i, i, i)) for i in range(4)},
    )
    views = load_views(d, RenderConfig(height=H, width=W), stride=2)
    assert len(views) == 2
    assert [v[2] for v in views] == [0.0, 2 / 3.0]


def test_split_selection_and_shape(tmp_path):
    c2w = _c2w_opengl((0, 0, 4), (0, 0, 0))
    meta = {"camera_angle_x": 0.9, "frames": [
        {"file_path": "tr", "transform_matrix": c2w}]}
    test_meta = {"camera_angle_x": 0.9, "frames": [
        {"file_path": "te", "transform_matrix": c2w},
        {"file_path": "te2", "transform_matrix": c2w}]}
    d = _write_dataset(tmp_path, meta, {"tr": _rgba((1, 1, 1)),
                                        "te": _rgba((2, 2, 2)),
                                        "te2": _rgba((3, 3, 3))})
    _write_dataset(tmp_path, test_meta, {}, name="transforms_test.json")

    cfg = RenderConfig(height=H, width=W)
    assert len(load_views(d, cfg)) == 1  # default: the train split
    assert len(load_views(d, cfg, split="test")) == 2
    with pytest.raises(FileNotFoundError):
        blender.find_transforms(d, split="val")
    assert dataset_image_shape(d) == (H, W)


def test_fit_scene_trains_from_blender_dataset(tmp_path):
    """End-to-end: a transforms dataset drives fit_scene (the loss must
    fall), proving the ingestion feeds the whole training stack."""
    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.train import SceneParams, fit_scene, mse_loss

    rng = np.random.default_rng(0)
    img = np.zeros((H, W, 4), np.uint8)
    img[..., :3] = rng.integers(0, 255, (H, W, 3))
    img[8:24, 16:32, :3] = (250, 120, 30)
    img[..., 3] = 255
    d = _write_dataset(
        tmp_path,
        {"camera_angle_x": 1.1, "frames": [
            {"file_path": "r_0",
             "transform_matrix": _c2w_opengl((0, 0, 5), (0, 0, 0))},
        ]},
        {"r_0": img},
    )
    cfg = RenderConfig(height=H, width=W)
    views = load_views(d, cfg)
    params = SceneParams.from_scene(make_random_scene(64, seed=1, extent=1.5))
    params, hist = fit_scene(views, cfg, params, steps=6, loss_fn=mse_loss,
                             densify_every=0, opacity_reset_every=0)
    assert np.isfinite(hist["losses"]).all()
    assert hist["losses"][-1] < hist["losses"][0]
