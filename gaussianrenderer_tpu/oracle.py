"""Brute-force NumPy oracle renderer.

A scalar/NumPy port of the reference's live GPU math
(``src/core/cuda/render.cu``: advancedCullGaussians → prepareGaussians →
buildLwgs → sort → renderGaussians) used as the golden-image generator for
PSNR regression tests — the verification layer the reference itself lacks
(SURVEY.md §4: "no unit tests of the render math, no image-based regression
tests").

Deliberately simple and slow: float64-free (float32 like the device paths),
every Gaussian × every covered pixel, Python-level tile loop with the exact
reference semantics including the uint32 depth quantization, per-tile
(tile, depth) ordering, alpha clamping, and both early-termination
thresholds.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.ops.sh import SH_C0, SH_C1, SH_C2, SH_C3
from gaussianrenderer_tpu.scene.camera import Camera


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


def _eval_sh_scalar(sh: np.ndarray, d: np.ndarray, degree: int) -> np.ndarray:
    color = SH_C0 * sh[0:3].copy()
    if degree > 0:
        x, y, z = d
        color = color + SH_C1 * z * sh[6:9] - SH_C1 * y * sh[3:6] - SH_C1 * x * sh[9:12]
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            color = (
                color
                + SH_C2[0] * xy * sh[12:15]
                + SH_C2[1] * yz * sh[15:18]
                + SH_C2[2] * (2 * zz - xx - yy) * sh[18:21]
                + SH_C2[3] * xz * sh[21:24]
                + SH_C2[4] * (xx - yy) * sh[24:27]
            )
            if degree > 2 and sh.shape[0] >= 48:
                color = (
                    color
                    + SH_C3[0] * y * (3 * xx - yy) * sh[27:30]
                    + SH_C3[1] * xy * z * sh[30:33]
                    + SH_C3[2] * y * (4 * zz - xx - yy) * sh[33:36]
                    + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[36:39]
                    + SH_C3[4] * x * (4 * zz - xx - yy) * sh[39:42]
                    + SH_C3[5] * z * (xx - yy) * sh[42:45]
                    + SH_C3[6] * x * (xx - 3 * yy) * sh[45:48]
                )
    return np.clip(color + 0.5, 0.0, 1.0)


def render_oracle(
    scene,
    camera: Camera,
    cfg: RenderConfig,
    time_value: Optional[float] = None,
) -> np.ndarray:
    """Render with the reference algorithm; returns planar (3, H, W) f32.

    Honors ``cfg.background`` (rgb + T_final·bg) and ``cfg.output_alpha``
    (a 4th accumulated-opacity row) exactly as render.py's ``_finish_fb``
    does, so the PSNR gates cover those output modes too."""
    positions = np.asarray(scene.positions, dtype=np.float32)
    shs = np.asarray(scene.sh, dtype=np.float32)
    opacities = np.asarray(scene.opacity, dtype=np.float32)
    scales = np.asarray(scene.scales, dtype=np.float32)
    quats = np.asarray(scene.quats, dtype=np.float32)
    time_params = (
        None if scene.time_params is None else np.asarray(scene.time_params)
    )

    n = positions.shape[0]
    w, h = cfg.width, cfg.height
    tiles_x, tiles_y = cfg.tiles_x, cfg.tiles_y
    tile_w, tile_h = cfg.tile_w, cfg.tile_h
    k_sigma = np.float32(cfg.k_sigma)

    v_mat = camera.view.astype(np.float32)
    p_mat = camera.proj.astype(np.float32)
    r_cam = camera.r_cam.astype(np.float32)
    cam_pos = camera.position.astype(np.float32)
    fy = np.float32(1.0 / math.tan(math.radians(camera.fov_y) * 0.5))
    fx = np.float32(fy / camera.aspect)

    # instance records: (tile_id, depth_u32, emit_order, gaussian_payload...)
    instances = []

    for i in range(n):
        pos = positions[i]
        if (
            time_params is not None
            and time_value is not None
            and time_params.shape[1] >= 5
        ):
            # 4D position slicing: p(t) = p + v·(t − t_center), mirroring
            # ops/projection.slice_spacetime.
            pos = (
                pos
                + time_params[i, 2:5]
                * np.float32(time_value - float(time_params[i, 0]))
            ).astype(np.float32)
        view_dir = pos - cam_pos
        norm = float(np.linalg.norm(view_dir))
        view_dir = view_dir / norm if norm > 1e-8 else np.zeros(3, np.float32)
        color = _eval_sh_scalar(shs[i], view_dir, cfg.sh_degree)

        homo = np.array([pos[0], pos[1], pos[2], 1.0], dtype=np.float32)
        cam_xyzw = v_mat @ homo
        cx, cy, cz = float(cam_xyzw[0]), float(cam_xyzw[1]), float(cam_xyzw[2])
        if not np.all(np.isfinite(cam_xyzw[:3])):
            continue
        clip = p_mat @ cam_xyzw
        ndc = clip[:3] / clip[3]
        if not np.all(np.isfinite(ndc)):
            continue
        if cz >= -camera.near or ndc[2] < -1.0 or ndc[2] > 1.0:
            continue
        depth = -cz

        jac = np.array(
            [
                [fx / cz, 0.0, -fx * cx / (cz * cz)],
                [0.0, fy / cz, -fy * cy / (cz * cz)],
            ],
            dtype=np.float32,
        )
        rot = _quat_to_rot(quats[i])
        cov3d = rot @ np.diag(scales[i] ** 2).astype(np.float32) @ rot.T
        cov_cam = r_cam @ cov3d @ r_cam.T
        cov2d = jac @ cov_cam @ jac.T
        half = np.array([[w * w, w * h], [h * w, h * h]], dtype=np.float32) * 0.25
        cov2d = cov2d * half
        # Mirror of config.ewa_dilation (ops/projection.py): upstream
        # 3DGS's +0.3 px² low-pass, default 0 like the reference.
        dil = getattr(cfg, "ewa_dilation", 0.0)
        cov2d[0, 0] += dil
        cov2d[1, 1] += dil
        det = float(cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] * cov2d[1, 0])
        if not np.isfinite(det) or det < 1e-8:
            continue
        # Mirror of config.ewa_compensate (ops/projection.py): upstream's
        # antialiasing opacity scale sqrt(det(Σ)/det(Σ+dI)).
        ewa_comp = 1.0
        if getattr(cfg, "ewa_compensate", False) and dil > 0.0:
            det0 = float(
                (cov2d[0, 0] - dil) * (cov2d[1, 1] - dil)
                - cov2d[0, 1] * cov2d[1, 0]
            )
            ewa_comp = math.sqrt(max(det0, 0.0) / det)
        inv_det = 1.0 / det
        conic = (
            cov2d[1, 1] * inv_det,
            -(cov2d[0, 1] + cov2d[1, 0]) * inv_det,
            cov2d[0, 0] * inv_det,
        )

        sxy = 0.5 * (cov2d[0, 1] + cov2d[1, 0])
        tr = cov2d[0, 0] + cov2d[1, 1]
        dif = cov2d[0, 0] - cov2d[1, 1]
        rad = math.sqrt(max(0.0, dif * dif + 4 * sxy * sxy))
        lam1 = max(0.5 * (tr + rad), 1e-8)
        lam2 = max(0.5 * (tr - rad), 1e-8)
        theta = 0.5 * math.atan2(2 * sxy, dif)
        r1 = k_sigma * math.sqrt(lam1)
        r2 = k_sigma * math.sqrt(lam2)
        c_t, s_t = math.cos(theta), math.sin(theta)
        ex = (abs(r1 * c_t) + abs(r2 * s_t)) / (w / 2.0)
        ey = (abs(r1 * s_t) + abs(r2 * c_t)) / (h / 2.0)

        xmin, xmax = ndc[0] - ex, ndc[0] + ex
        ymin, ymax = ndc[1] - ey, ndc[1] + ey
        if xmax < -0.99 or xmin > 0.99 or ymax < -0.99 or ymin > 0.99:
            continue
        xmin, xmax = max(xmin, -1.0), min(xmax, 1.0)
        ymin, ymax = max(ymin, -1.0), min(ymax, 1.0)
        xmin_px = int(math.floor((xmin + 1.0) * 0.5 * w))
        xmax_px = int(math.ceil((xmax + 1.0) * 0.5 * w))
        ymin_px = int(math.floor((ymin + 1.0) * 0.5 * h))
        ymax_px = int(math.ceil((ymax + 1.0) * 0.5 * h))
        px_x = int(round((float(ndc[0]) + 1.0) * 0.5 * w))
        px_y = int(round((float(ndc[1]) + 1.0) * 0.5 * h))

        opacity = float(opacities[i]) * ewa_comp
        if time_params is not None and time_value is not None:
            t_c, t_s = float(time_params[i, 0]), max(float(time_params[i, 1]), 1e-6)
            dt = (time_value - t_c) / t_s
            opacity *= math.exp(-0.5 * dt * dt)

        depth_u32 = np.uint32(np.float32(depth) * np.float32(cfg.depth_scale))
        min_tx = max(0, xmin_px // tile_w)
        max_tx = min(tiles_x - 1, xmax_px // tile_w)
        min_ty = max(0, ymin_px // tile_h)
        max_ty = min(tiles_y - 1, ymax_px // tile_h)
        payload = (
            px_x,
            px_y,
            conic,
            opacity,
            color,
            (xmin_px, ymin_px, xmax_px, ymax_px),
            float(depth),
        )
        for txi in range(min_tx, max_tx + 1):
            for tyi in range(min_ty, max_ty + 1):
                tile_id = txi + tyi * tiles_x
                instances.append((tile_id, int(depth_u32), len(instances), payload))

    instances.sort(key=lambda rec: (rec[0], rec[1], rec[2]))

    fb = np.zeros((3, h, w), dtype=np.float32)
    depth_fb = np.zeros((h, w), dtype=np.float32)
    transmittance = np.ones((h, w), dtype=np.float32)

    current_tile = -1
    for tile_id, _, _, payload in instances:
        if tile_id != current_tile:
            current_tile = tile_id
        txi = tile_id % tiles_x
        tyi = tile_id // tiles_x
        x0, y0 = txi * tile_w, tyi * tile_h
        px_x, px_y, conic, opacity, color, aabb, depth_v = payload
        xmin_px, ymin_px, xmax_px, ymax_px = aabb
        for gy in range(y0, min(y0 + tile_h, h)):
            if gy < ymin_px or gy > ymax_px:
                continue
            for gx in range(x0, min(x0 + tile_w, w)):
                if gx < xmin_px or gx > xmax_px:
                    continue
                t_cur = transmittance[gy, gx]
                if t_cur < 1e-3:
                    continue
                dx = np.float32(gx - px_x)
                dy = np.float32(gy - px_y)
                md2 = conic[0] * dx * dx + conic[1] * dx * dy + conic[2] * dy * dy
                alpha = min(opacity * math.exp(-0.5 * float(md2)), 0.99)
                if alpha < 1e-3:
                    continue
                for c in range(3):
                    fb[c, gy, gx] += color[c] * alpha * t_cur
                depth_fb[gy, gx] += depth_v * alpha * t_cur
                transmittance[gy, gx] = t_cur * (1.0 - alpha)
    if getattr(cfg, "background", None) is not None:
        bg = np.asarray(cfg.background, np.float32)
        fb = fb + transmittance[None, :, :] * bg[:, None, None]
    if getattr(cfg, "output_alpha", False):
        fb = np.concatenate([fb, (1.0 - transmittance)[None]], axis=0)
    if getattr(cfg, "output_depth", False):
        fb = np.concatenate([fb, depth_fb[None]], axis=0)
    return fb


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * math.log10(peak * peak / mse)
