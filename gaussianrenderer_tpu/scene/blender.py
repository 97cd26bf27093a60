"""Blender / NeRF-synthetic ``transforms*.json`` dataset ingestion.

The second standard capture layout alongside COLMAP workspaces (the
upstream 3DGS trainer reads exactly these two): a dataset directory
with ``transforms_train.json`` / ``transforms_test.json`` /
``transforms_val.json`` (NeRF-synthetic, D-NeRF) or a single
``transforms.json`` (instant-ngp-style captures). Each frame records a
camera-to-world ``transform_matrix`` in the OpenGL convention (x right,
y up, z backward — ``Camera.from_pose(convention="opengl")``) and a
``file_path`` image reference (extension optional in the NeRF-synthetic
sets). Intrinsics come from ``camera_angle_x`` (the NeRF field:
horizontal FOV in radians), ``camera_angle_y``, or instant-ngp's
``fl_y`` focal length — file-level keys apply to every frame,
frame-level keys override. D-NeRF's per-frame ``time`` in [0, 1] makes
the view a timed triple, training the 4D ``time_params`` path directly
from a dataset.

RGBA targets (the NeRF-synthetic sets render on transparency) are
composited over an explicit background color — train with
``RenderConfig(background=…)`` set to the same color so the rendered
frame and the target agree on empty space (the upstream
``--white_background`` convention).

The reference has no dataset ingestion at all (PLY drag-drop only,
``canvas.cpp:280-296``); this is trainer-side surface, mirroring
``scene/colmap.py`` for the other standard layout.
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "is_blender_dir",
    "find_transforms",
    "blender_image_shape",
    "load_blender",
]

_SPLIT_ORDER = ("train", "test", "val")


def find_transforms(dataset_dir: str, split: Optional[str] = None) -> str:
    """Path of the dataset's transforms file.

    ``split`` picks ``transforms_{split}.json`` explicitly; otherwise the
    train split is preferred, then the splitless ``transforms.json``
    (instant-ngp captures), then any split present.
    """
    if split is not None:
        cand = os.path.join(dataset_dir, f"transforms_{split}.json")
        if os.path.isfile(cand):
            return cand
        raise FileNotFoundError(f"{dataset_dir}: no transforms_{split}.json")
    names = [f"transforms_{s}.json" for s in _SPLIT_ORDER]
    names.insert(1, "transforms.json")  # after train, before test/val
    for name in names:
        cand = os.path.join(dataset_dir, name)
        if os.path.isfile(cand):
            return cand
    raise FileNotFoundError(f"{dataset_dir}: no transforms*.json")


def is_blender_dir(dataset_dir: str) -> bool:
    try:
        find_transforms(dataset_dir)
        return True
    except FileNotFoundError:
        return False


def _resolve_image(dataset_dir: str, file_path: str) -> str:
    """NeRF-synthetic ``file_path`` entries omit the extension."""
    path = os.path.normpath(os.path.join(dataset_dir, file_path))
    if os.path.isfile(path):
        return path
    for ext in (".png", ".jpg", ".jpeg"):
        if os.path.isfile(path + ext):
            return path + ext
    raise FileNotFoundError(f"{file_path}: no image at {path}[.png/.jpg]")


def blender_image_shape(dataset_dir: str,
                        split: Optional[str] = None) -> Tuple[int, int]:
    """(height, width) without loading the dataset: instant-ngp metas
    record ``h``/``w``; otherwise the first frame's image is probed."""
    with open(find_transforms(dataset_dir, split)) as fh:
        meta = json.load(fh)
    if "h" in meta and "w" in meta:
        return int(meta["h"]), int(meta["w"])
    if not meta.get("frames"):
        raise ValueError(f"{dataset_dir}: transforms file has no frames")
    from PIL import Image

    path = _resolve_image(dataset_dir, meta["frames"][0]["file_path"])
    with Image.open(path) as im:
        return int(im.height), int(im.width)


def _fov_y_deg(meta: dict, frame: dict, height: int, width: int) -> float:
    """Vertical FOV in degrees from whichever intrinsics the file carries.

    Frame-level keys override file-level ones (instant-ngp per-frame
    intrinsics). ``fl_y`` is in pixels of the dataset's own resolution
    (``height`` here — FOV is resolution-independent afterwards);
    ``camera_angle_x`` converts through the aspect ratio.
    """
    for src in (frame, meta):
        if "fl_y" in src:
            return math.degrees(2.0 * math.atan(height / (2.0 * src["fl_y"])))
        if "camera_angle_y" in src:
            return math.degrees(float(src["camera_angle_y"]))
        if "camera_angle_x" in src:
            half_x = float(src["camera_angle_x"]) / 2.0
            return math.degrees(
                2.0 * math.atan(math.tan(half_x) * height / width)
            )
    raise ValueError(
        "transforms frame has no intrinsics "
        "(camera_angle_x / camera_angle_y / fl_y)"
    )


def load_blender(
    dataset_dir: str,
    cfg,
    k_sigma: float = 3.0,
    stride: int = 1,
    split: Optional[str] = None,
    background: Optional[Tuple[float, float, float]] = None,
    near: float = 0.01,
    far: float = 100.0,
):
    """Load a transforms*.json dataset into :func:`train.fit_scene` views.

    Returns (cam_params, target) pairs — or (cam_params, target, time)
    triples when frames carry D-NeRF ``time`` values. Targets resize to
    ``cfg.height × cfg.width`` when the aspect matches (the upstream
    ``-r`` resolution downscale; a >2% aspect mismatch raises, same rule
    as ``load_colmap``) and land in the planar (3, H, W) bottom-up
    training layout. RGBA images composite over ``background`` (default
    black — pass ``cfg.background`` so render and target agree).
    ``near``/``far`` default to the upstream Blender loader's 0.01/100
    clip planes.
    """
    import jax.numpy as jnp

    from gaussianrenderer_tpu.scene.camera import Camera

    from PIL import Image

    with open(find_transforms(dataset_dir, split)) as fh:
        meta = json.load(fh)
    # The dataset's own resolution, for focal→FOV conversion: ``fl_y``
    # focal lengths are in pixels of the dataset's images, so when the
    # meta lacks ``h``/``w`` the first frame's image is probed — cfg is
    # NOT a stand-in (under the -r downscale cfg is smaller than the
    # images, which would misread the focal as a wider lens).
    if "h" in meta and "w" in meta:
        ds_h, ds_w = int(meta["h"]), int(meta["w"])
    elif meta.get("frames"):
        p0 = _resolve_image(dataset_dir, meta["frames"][0]["file_path"])
        with Image.open(p0) as im0:
            ds_h, ds_w = int(im0.height), int(im0.width)
    else:
        ds_h, ds_w = cfg.height, cfg.width
    bg = np.asarray(background if background is not None else (0.0, 0.0, 0.0),
                    np.float32)

    views = []
    for frame in meta.get("frames", [])[:: max(stride, 1)]:
        cam = Camera.from_pose(
            np.asarray(frame["transform_matrix"], np.float32),
            fov_y_deg=_fov_y_deg(meta, frame, ds_h, ds_w),
            aspect=cfg.width / cfg.height,
            near=frame.get("near", near),
            far=frame.get("far", far),
            convention="opengl",
        )
        path = _resolve_image(dataset_dir, frame["file_path"])
        pil = Image.open(path)
        aspect = pil.width / pil.height
        if abs(aspect - cfg.width / cfg.height) > 0.02 * aspect:
            raise ValueError(
                f"{frame['file_path']}: capture aspect {aspect:.3f} != "
                f"config {cfg.width / cfg.height:.3f} — crop or change cfg"
            )
        if pil.size != (cfg.width, cfg.height):
            # Same-aspect resize (FOV is resolution-invariant) — the
            # upstream -r/--resolution downscale for big captures;
            # resampled BEFORE alpha compositing, like upstream's
            # PILtoTorch-then-blend order.
            pil = pil.resize((cfg.width, cfg.height), Image.LANCZOS)
        img = np.asarray(pil)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.ndim != 3:
            raise ValueError(
                f"{frame['file_path']}: expected an RGB(A) image, "
                f"got shape {img.shape}"
            )
        if img.shape[2] >= 4:
            alpha = img[:, :, 3:4]
            img = img[:, :, :3] * alpha + bg * (1.0 - alpha)
        # (H, W, 3) top-down image → planar (3, H, W) bottom-up target.
        target = jnp.asarray(
            img[::-1, :, :3].transpose(2, 0, 1), jnp.float32
        )
        if "time" in frame:
            views.append((cam.params(k_sigma), target, float(frame["time"])))
        else:
            views.append((cam.params(k_sigma), target))
    return views
