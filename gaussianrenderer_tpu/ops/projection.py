"""Per-Gaussian preprocessing: cull + SH color + EWA projection.

One vectorized functional pass replacing the reference's
``advancedCullGaussians`` (``src/core/cuda/render.cu:472-598``) and
``prepareGaussians`` (``render.cu:599-786``) kernels. On TPU there is no
compaction — every Gaussian keeps its slot and carries a validity mask; the
reference's decoupled-lookback stream compaction collapses into masking
(SURVEY.md §2.11 mapping table).

Numerics follow the live GPU path exactly (not the dead CPU prototype, whose
Jacobian has a different Y sign convention — SURVEY.md §2.7):

* view transform + w-divide to NDC, NaN guards (``render.cu:535-553``),
* cull when camera-space ``Z >= -near`` or NDC z ∉ [−1, 1] (``render.cu:554``),
* Jacobian ``[[fx/Z, 0, −fx·X/Z²], [0, fy/Z, −fy·Y/Z²]]`` with
  ``fy = 1/tan(fovY/2)``, ``fx = fy/aspect`` (``render.cu:620-657``),
* Σ3D = R·diag(s²)·Rᵀ from the (w,x,y,z) quaternion (``render.cu:662-673``,
  quat→R per ``math.cpp:138-149``), rotated to camera frame by
  ``R_cam·Σ·R_camᵀ`` (``render.cu:676-677``),
* Σ2D = J·Σcam·Jᵀ rescaled from NDC to pixel units by (W/2, H/2)
  (``render.cu:680-686``); no low-pass dilation (the reference comments the
  +0.3 term out — ``render.cpp:239-242``),
* analytic inverse with ``det < 1e-8`` rejection (``render.cu:688-696``),
* closed-form eigenvalues + k-sigma axis-aligned extents; AABB rejected if
  fully outside ±0.99 NDC, clamped to ±1, floor/ceil to pixels; center pixel
  rounded (``render.cu:704-759``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.sh import eval_sh
from gaussianrenderer_tpu.scene.camera import CameraParams
from gaussianrenderer_tpu.scene.gaussians import GaussianScene

# TPU matmuls default to bf16 MXU passes; the projection math needs full f32
# (the reference is f32 CUDA) or PSNR vs the oracle collapses to ~35 dB.
_HIGHEST = jax.lax.Precision.HIGHEST


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities (all leading dim N)."""

    valid: jnp.ndarray  # (N,) bool — survives cull + det + AABB checks
    depth: jnp.ndarray  # (N,) float32, −Z in camera space (front-to-back key)
    color: jnp.ndarray  # (N, 3) SH-evaluated RGB in [0,1]
    opacity: jnp.ndarray  # (N,)
    center_px: jnp.ndarray  # (N, 2) float32 rounded pixel center (x, y)
    conic: jnp.ndarray  # (N, 3) (A, B, C): md² = A·dx² + B·dx·dy + C·dy²
    aabb_px: jnp.ndarray  # (N, 4) float32 (xmin, ymin, xmax, ymax) pixels
    tile_min: jnp.ndarray  # (N, 2) int32 inclusive tile range (x, y)
    tile_max: jnp.ndarray  # (N, 2) int32


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(N,4) w,x,y,z quaternions → (N,3,3) rotations (``math.cpp:138-149``)."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def preprocess_gaussians(
    scene: GaussianScene,
    cam: CameraParams,
    *,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    tiles_y: int,
    sh_degree: int = 2,
    extra_opacity_scale: jnp.ndarray | None = None,
    quantize_centers: bool = True,
) -> ProjectedGaussians:
    """Vectorized cull + color + EWA projection for all N Gaussians.

    ``extra_opacity_scale`` is an optional (N,) multiplier applied to splat
    opacities before thresholding — the hook used by the 4D spacetime
    extension (time-conditioned opacity slicing; reference roadmap
    README.md:16).
    """
    pos = scene.positions.astype(jnp.float32)
    n = pos.shape[0]

    # ------------------------------------------------ SH view-dependent color
    view_dir = pos - cam.position[None, :]
    norm = jnp.linalg.norm(view_dir, axis=-1, keepdims=True)
    # Reference normalize zero-guard (math.cu mirror of math.cpp:7-19).
    view_dir = jnp.where(norm > 1e-8, view_dir / norm, 0.0)
    color = eval_sh(scene.sh, view_dir, sh_degree)

    # --------------------------------------------- view + projection transform
    ones = jnp.ones((n, 1), dtype=jnp.float32)
    homo = jnp.concatenate([pos, ones], axis=-1)
    cam_xyzw = jnp.matmul(homo, cam.view.T, precision=_HIGHEST)  # (N,4) camera space
    cx, cy, cz = cam_xyzw[:, 0], cam_xyzw[:, 1], cam_xyzw[:, 2]

    clip = jnp.matmul(cam_xyzw, cam.proj.T, precision=_HIGHEST)
    ndc = clip[:, :3] / clip[:, 3:4]

    finite_cam = jnp.all(jnp.isfinite(cam_xyzw[:, :3]), axis=-1)
    finite_ndc = jnp.all(jnp.isfinite(ndc), axis=-1)
    # Cull test (render.cu:554): behind near plane or NDC z outside [−1,1].
    in_front = cz < -cam.near
    z_ok = (ndc[:, 2] >= -1.0) & (ndc[:, 2] <= 1.0)
    survived_cull = finite_cam & finite_ndc & in_front & z_ok

    depth = -cz  # positive in front of camera; ascending = front-to-back

    # ------------------------------------------------------- EWA Σ2D projection
    fy = 1.0 / jnp.tan(jnp.deg2rad(cam.fov_y) * 0.5)
    fx = fy / cam.aspect
    # Guard Z≈0 to keep the Jacobian finite for culled splats.
    safe_z = jnp.where(jnp.abs(cz) > 1e-12, cz, 1e-12)
    zero = jnp.zeros_like(safe_z)
    j_row0 = jnp.stack([fx / safe_z, zero, -fx * cx / (safe_z * safe_z)], axis=-1)
    j_row1 = jnp.stack([zero, fy / safe_z, -fy * cy / (safe_z * safe_z)], axis=-1)
    jac = jnp.stack([j_row0, j_row1], axis=-2)  # (N,2,3)

    rot = quat_to_rotmat(scene.quats)  # (N,3,3)
    s2 = jnp.square(scene.scales)  # (N,3) — Σ = R·diag(s²)·Rᵀ
    cov3d = jnp.einsum("nij,nj,nkj->nik", rot, s2, rot, precision=_HIGHEST)
    cov_cam = jnp.einsum(
        "ij,njk,lk->nil", cam.r_cam, cov3d, cam.r_cam, precision=_HIGHEST
    )
    cov2d = jnp.einsum("nij,njk,nlk->nil", jac, cov_cam, jac, precision=_HIGHEST)  # (N,2,2)

    half_w = width * 0.5
    half_h = height * 0.5
    sxx = cov2d[:, 0, 0] * (half_w * half_w)
    sxy = cov2d[:, 0, 1] * (half_w * half_h)
    syx = cov2d[:, 1, 0] * (half_h * half_w)
    syy = cov2d[:, 1, 1] * (half_h * half_h)

    det = sxx * syy - sxy * syx
    det_ok = jnp.isfinite(det) & (det >= 1e-8)
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    # conic packs (ic00, ic01+ic10, ic11) — the blend kernel evaluates
    # md² = dxᵀ·Σ⁻¹·dx exactly as render.cu:332.
    conic = jnp.stack(
        [syy * inv_det, -(sxy + syx) * inv_det, sxx * inv_det], axis=-1
    )

    # Closed-form eigenvalues + angle (render.cu:704-727).
    s_xy = 0.5 * (sxy + syx)
    tr = sxx + syy
    dif = sxx - syy
    rad = jnp.sqrt(jnp.maximum(0.0, dif * dif + 4.0 * s_xy * s_xy))
    lam1 = jnp.maximum(0.5 * (tr + rad), 1e-8)
    lam2 = jnp.maximum(0.5 * (tr - rad), 1e-8)
    theta = 0.5 * jnp.arctan2(2.0 * s_xy, dif)
    r1 = cam.k_sigma * jnp.sqrt(lam1)
    r2 = cam.k_sigma * jnp.sqrt(lam2)
    c_t = jnp.cos(theta)
    s_t = jnp.sin(theta)
    ex = (jnp.abs(r1 * c_t) + jnp.abs(r2 * s_t)) / half_w  # NDC units
    ey = (jnp.abs(r1 * s_t) + jnp.abs(r2 * c_t)) / half_h

    ndc_x, ndc_y = ndc[:, 0], ndc[:, 1]
    xmin = ndc_x - ex
    xmax = ndc_x + ex
    ymin = ndc_y - ey
    ymax = ndc_y + ey
    # Reject if fully outside ±0.99 NDC (render.cu:737-741).
    on_screen = ~((xmax < -0.99) | (xmin > 0.99) | (ymax < -0.99) | (ymin > 0.99))

    xmin = jnp.maximum(xmin, -1.0)
    xmax = jnp.minimum(xmax, 1.0)
    ymin = jnp.maximum(ymin, -1.0)
    ymax = jnp.minimum(ymax, 1.0)

    xmin_px = jnp.floor((xmin + 1.0) * 0.5 * width)
    xmax_px = jnp.ceil((xmax + 1.0) * 0.5 * width)
    ymin_px = jnp.floor((ymin + 1.0) * 0.5 * height)
    ymax_px = jnp.ceil((ymax + 1.0) * 0.5 * height)

    cx_px = (ndc_x + 1.0) * 0.5 * width
    cy_px = (ndc_y + 1.0) * 0.5 * height
    if quantize_centers:
        # Integer pixel centers like the reference (render.cu:753-754);
        # training disables this so position gradients survive.
        cx_px = jnp.round(cx_px)
        cy_px = jnp.round(cy_px)
    center_px = jnp.stack([cx_px, cy_px], axis=-1)

    valid = survived_cull & det_ok & on_screen

    # Tile coverage via integer stride division (render.cu:761-764).
    tmin_x = jnp.clip(xmin_px.astype(jnp.int32) // tile_w, 0, tiles_x - 1)
    tmax_x = jnp.clip(xmax_px.astype(jnp.int32) // tile_w, 0, tiles_x - 1)
    tmin_y = jnp.clip(ymin_px.astype(jnp.int32) // tile_h, 0, tiles_y - 1)
    tmax_y = jnp.clip(ymax_px.astype(jnp.int32) // tile_h, 0, tiles_y - 1)

    opacity = scene.opacity.astype(jnp.float32)
    if extra_opacity_scale is not None:
        opacity = opacity * extra_opacity_scale

    return ProjectedGaussians(
        valid=valid,
        depth=depth,
        color=color,
        opacity=opacity,
        center_px=center_px.astype(jnp.float32),
        conic=conic.astype(jnp.float32),
        aabb_px=jnp.stack([xmin_px, ymin_px, xmax_px, ymax_px], axis=-1).astype(
            jnp.float32
        ),
        tile_min=jnp.stack([tmin_x, tmin_y], axis=-1),
        tile_max=jnp.stack([tmax_x, tmax_y], axis=-1),
    )
