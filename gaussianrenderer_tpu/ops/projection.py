"""Per-Gaussian preprocessing: cull + SH color + EWA projection.

One vectorized functional pass replacing the reference's
``advancedCullGaussians`` (``src/core/cuda/render.cu:472-598``) and
``prepareGaussians`` (``render.cu:599-786``) kernels. On TPU there is no
compaction — every Gaussian keeps its slot and carries a validity mask; the
reference's decoupled-lookback stream compaction collapses into masking
(SURVEY.md §2.11 mapping table).

Layout note: everything here computes on 1-D (N,) columns — small trailing
dims like (N, 3) put the 3 on the TPU lane axis (3/128 lane utilization,
~40× waste), so the (N,3)/(N,4) inputs are split into columns once up
front and all linear algebra is written out scalar-style per lane. The
same math expressed with einsums over (N,3,3) was measured 10-50× slower
on v5e.

Numerics follow the live GPU path exactly (not the dead CPU prototype,
whose Jacobian has a different Y sign convention — SURVEY.md §2.7):

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

import jax.numpy as jnp

from gaussianrenderer_tpu.ops.sh import eval_sh_columns
from gaussianrenderer_tpu.scene.camera import CameraParams
from gaussianrenderer_tpu.scene.gaussians import GaussianScene

#: Blend threshold (render.cu:334). ops/instances.py re-exports this one
#: definition so the coverage bound below, the emission prune, and the
#: compositor kernels can never silently desynchronize.
ALPHA_EPS = 1e-3


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


def slice_spacetime(scene, time_value):
    """4D spacetime-Gaussian time slicing (reference roadmap README.md:16;
    BASELINE config 5): returns ``(scene', extra_opacity)`` for rendering
    the scene at ``time_value``.

    ``scene.time_params`` is (N, 2) ``(t_center, t_sigma)`` for temporal
    opacity only, or (N, 5) ``(t_center, t_sigma, vx, vy, vz)`` with
    per-splat linear motion — positions are sliced
    ``p(t) = p + v·(t − t_center)`` BEFORE projection (the "position"
    half of the opacity/position slicing north star). Works on both
    GaussianScene and PreparedScene; returns the scene unchanged with
    ``extra_opacity=None`` when the scene is static or ``time_value`` is
    None (a static render of a spacetime scene).
    """
    if getattr(scene, "time_params", None) is None or time_value is None:
        return scene, None
    tp = scene.time_params.astype(jnp.float32).T  # (2|5, N) rows
    dt = time_value - tp[0]
    t_sigma = jnp.maximum(tp[1], 1e-6)
    u = dt / t_sigma
    extra_opacity = jnp.exp(-0.5 * u * u)
    if tp.shape[0] >= 5:
        delta = tp[2:5] * dt[None, :]  # (3, N)
        if hasattr(scene, "pos_t"):
            scene = scene._replace(pos_t=scene.pos_t + delta)
        else:
            scene = scene._replace(positions=scene.positions + delta.T)
    return scene, extra_opacity


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(N,4) w,x,y,z quaternions → (N,3,3) rotations (``math.cpp:138-149``).

    Kept for external callers/tests; the hot path below inlines the same
    formulas on 1-D columns.
    """
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
    ewa_dilation: float = 0.0,
    ewa_compensate: bool = False,
    ndc_probe: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Vectorized cull + color + EWA projection for all N Gaussians.

    ``extra_opacity_scale`` is an optional (N,) multiplier applied to splat
    opacities before thresholding — the hook used by the 4D spacetime
    extension (time-conditioned opacity slicing; reference roadmap
    README.md:16).

    ``ndc_probe`` is an optional (2, N) all-zeros array added to the NDC
    center after projection: a forward no-op whose gradient under
    ``jax.grad`` is dL/d(NDC center) — the view-space positional gradient
    upstream 3DGS accumulates (as ``means2D`` grads) for adaptive density
    control. Training-only hook (see train.accumulate_densify_stats).
    """
    f32 = jnp.float32
    if hasattr(scene, "pos_t"):
        # PreparedScene: already in render layout (transposed at setup).
        pos_t = scene.pos_t
        quat_t = scene.quat_t
        scale_t = scene.scale_t
        sh_t = scene.sh_t
    else:
        # Transpose the (N, small) scene inputs once per frame: column
        # slices of a lane-minor array re-read the whole padded buffer per
        # column. This relayout costs ~6 ms at 3M splats — sessions should
        # pass a PreparedScene (scene.prepared()) instead.
        pos_t = scene.positions.astype(f32).T  # (3, N)
        quat_t = scene.quats.astype(f32).T  # (4, N)
        scale_t = scene.scales.astype(f32).T  # (3, N)
        sh_t = scene.sh.astype(f32).T  # (3(deg+1)², N)
    px_, py_, pz_ = pos_t[0], pos_t[1], pos_t[2]

    # ------------------------------------------------ SH view-dependent color
    cpos = cam.position.astype(f32)
    dx = px_ - cpos[0]
    dy = py_ - cpos[1]
    dz = pz_ - cpos[2]
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    # Reference normalize zero-guard (math.cu mirror of math.cpp:7-19).
    inv_n = jnp.where(norm > 1e-8, 1.0 / norm, 0.0)
    color = eval_sh_columns(
        sh_t, dx * inv_n, dy * inv_n, dz * inv_n, sh_degree
    )  # (N, 3)

    # --------------------------------------------- view + projection transform
    view = cam.view.astype(f32)
    cx = view[0, 0] * px_ + view[0, 1] * py_ + view[0, 2] * pz_ + view[0, 3]
    cy = view[1, 0] * px_ + view[1, 1] * py_ + view[1, 2] * pz_ + view[1, 3]
    cz = view[2, 0] * px_ + view[2, 1] * py_ + view[2, 2] * pz_ + view[2, 3]

    proj = cam.proj.astype(f32)
    # OpenGL perspective: clip = P · cam, w = −z_cam.
    clip_x = proj[0, 0] * cx
    clip_y = proj[1, 1] * cy
    clip_z = proj[2, 2] * cz + proj[2, 3]
    clip_w = -cz
    safe_w = jnp.where(jnp.abs(clip_w) > 1e-12, clip_w, 1e-12)
    ndc_x = clip_x / safe_w
    ndc_y = clip_y / safe_w
    ndc_z = clip_z / safe_w
    if ndc_probe is not None:
        # Zero-valued probe: shifts nothing, but carries the view-space
        # center gradient out through jax.grad (docstring above).
        ndc_x = ndc_x + ndc_probe[0]
        ndc_y = ndc_y + ndc_probe[1]

    finite_cam = jnp.isfinite(cx) & jnp.isfinite(cy) & jnp.isfinite(cz)
    finite_ndc = jnp.isfinite(ndc_x) & jnp.isfinite(ndc_y) & jnp.isfinite(ndc_z)
    # Cull test (render.cu:554): behind near plane or NDC z outside [−1,1].
    in_front = cz < -cam.near
    z_ok = (ndc_z >= -1.0) & (ndc_z <= 1.0)
    survived_cull = finite_cam & finite_ndc & in_front & z_ok

    depth = -cz  # positive in front of camera; ascending = front-to-back

    # ------------------------------------------------------- EWA Σ2D projection
    fy = 1.0 / jnp.tan(jnp.deg2rad(cam.fov_y) * 0.5)
    fx = fy / cam.aspect
    safe_z = jnp.where(jnp.abs(cz) > 1e-12, cz, 1e-12)
    inv_z = 1.0 / safe_z
    # Jacobian rows (render.cu:620-657): [fx/Z, 0, −fx·X/Z²],
    #                                    [0, fy/Z, −fy·Y/Z²].
    j00 = fx * inv_z
    j02 = -fx * cx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * cy * inv_z * inv_z

    # quat → R, inlined on columns (math.cpp:138-149).
    qw, qx, qy, qz = quat_t[0], quat_t[1], quat_t[2], quat_t[3]
    qn = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qi = jnp.where(qn > 0, 1.0 / qn, 0.0)
    qw, qx, qy, qz = qw * qi, qx * qi, qy * qi, qz * qi
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)

    # Σ3D = R·diag(s²)·Rᵀ (render.cu:662-673) — expanded on columns.
    s0 = jnp.square(scale_t[0])
    s1 = jnp.square(scale_t[1])
    s2_ = jnp.square(scale_t[2])
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2_
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2_
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2_
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2_
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2_
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2_

    # Rotate to camera frame: M = R_cam · Σ · R_camᵀ (render.cu:676-677).
    rc = cam.r_cam.astype(f32)

    def rot_sym(c00, c01, c02, c11, c12, c22):
        # t = R_cam · Σ (3x3 each lane), then m = t · R_camᵀ; Σ symmetric.
        t00 = rc[0, 0] * c00 + rc[0, 1] * c01 + rc[0, 2] * c02
        t01 = rc[0, 0] * c01 + rc[0, 1] * c11 + rc[0, 2] * c12
        t02 = rc[0, 0] * c02 + rc[0, 1] * c12 + rc[0, 2] * c22
        t10 = rc[1, 0] * c00 + rc[1, 1] * c01 + rc[1, 2] * c02
        t11 = rc[1, 0] * c01 + rc[1, 1] * c11 + rc[1, 2] * c12
        t12 = rc[1, 0] * c02 + rc[1, 1] * c12 + rc[1, 2] * c22
        t20 = rc[2, 0] * c00 + rc[2, 1] * c01 + rc[2, 2] * c02
        t21 = rc[2, 0] * c01 + rc[2, 1] * c11 + rc[2, 2] * c12
        t22 = rc[2, 0] * c02 + rc[2, 1] * c12 + rc[2, 2] * c22
        m00 = t00 * rc[0, 0] + t01 * rc[0, 1] + t02 * rc[0, 2]
        m01 = t00 * rc[1, 0] + t01 * rc[1, 1] + t02 * rc[1, 2]
        m02 = t00 * rc[2, 0] + t01 * rc[2, 1] + t02 * rc[2, 2]
        m11 = t10 * rc[1, 0] + t11 * rc[1, 1] + t12 * rc[1, 2]
        m12 = t10 * rc[2, 0] + t11 * rc[2, 1] + t12 * rc[2, 2]
        m22 = t20 * rc[2, 0] + t21 * rc[2, 1] + t22 * rc[2, 2]
        return m00, m01, m02, m11, m12, m22

    m00, m01, m02, m11, m12, m22 = rot_sym(c00, c01, c02, c11, c12, c22)

    # Σ2D = J·Σcam·Jᵀ (J rows: [j00,0,j02], [0,j11,j12]) — render.cu:680-682.
    # u = J·Σ: u0· = j00·Σ0· + j02·Σ2·, u1· = j11·Σ1· + j12·Σ2·.
    u00 = j00 * m00 + j02 * m02
    u02 = j00 * m02 + j02 * m22
    u10 = j11 * m01 + j12 * m02
    u11 = j11 * m11 + j12 * m12
    u12 = j11 * m12 + j12 * m22
    sxx_ndc = u00 * j00 + u02 * j02
    # Σ2D[1,0] == Σ2D[0,1] analytically; the reference sums both halves
    # into the conic (render.cu:698-701) — equivalent to 2·sxy here.
    sxy_ndc = u10 * j00 + u12 * j02
    syy_ndc = u11 * j11 + u12 * j12

    half_w = width * 0.5
    half_h = height * 0.5
    # Optional EWA low-pass dilation (config.ewa_dilation): the original
    # 3DGS rasterizer's +0.3 px² diagonal, which the reference keeps
    # commented out (render.cpp:239-242). Applied in pixel units, before
    # the det guard and the eigen/AABB extents, like upstream does.
    sxx = sxx_ndc * (half_w * half_w) + ewa_dilation
    sxy = sxy_ndc * (half_w * half_h)
    syy = syy_ndc * (half_h * half_h) + ewa_dilation

    det = sxx * syy - sxy * sxy
    det_ok = jnp.isfinite(det) & (det >= 1e-8)
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    # conic packs (ic00, ic01+ic10, ic11) — the blend kernel evaluates
    # md² = dxᵀ·Σ⁻¹·dx exactly as render.cu:332.
    conic_a = syy * inv_det
    conic_b = -2.0 * sxy * inv_det
    conic_c = sxx * inv_det

    # Closed-form eigenvalues + angle (render.cu:704-727).
    tr = sxx + syy
    dif = sxx - syy
    rad = jnp.sqrt(jnp.maximum(0.0, dif * dif + 4.0 * sxy * sxy))
    lam1 = jnp.maximum(0.5 * (tr + rad), 1e-8)
    lam2 = jnp.maximum(0.5 * (tr - rad), 1e-8)
    theta = 0.5 * jnp.arctan2(2.0 * sxy, dif)
    r1 = cam.k_sigma * jnp.sqrt(lam1)
    r2 = cam.k_sigma * jnp.sqrt(lam2)
    c_t = jnp.cos(theta)
    s_t = jnp.sin(theta)
    ex = (jnp.abs(r1 * c_t) + jnp.abs(r2 * s_t)) / half_w  # NDC units
    ey = (jnp.abs(r1 * s_t) + jnp.abs(r2 * c_t)) / half_h

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

    opacity = scene.opacity.astype(f32)
    if extra_opacity_scale is not None:
        opacity = opacity * extra_opacity_scale
    if ewa_compensate and ewa_dilation > 0.0:
        # Upstream's antialiasing flag (config.ewa_compensate): the
        # dilation keeps a sub-pixel splat's peak alpha from shrinking
        # with its footprint; sqrt(det(Σ)/det(Σ+dI)) restores the
        # undilated energy. sxx/syy are already dilated here, so the
        # numerator det comes from backing the diagonal out; inv_det
        # carries the det_ok guard (invalid rows are culled anyway).
        det0 = (sxx - ewa_dilation) * (syy - ewa_dilation) - sxy * sxy
        opacity = opacity * jnp.sqrt(jnp.maximum(det0, 0.0) * inv_det)

    # ---- threshold-ellipse coverage bound (output-identical tightening)
    # A pixel contributes only when α = op·exp(−½md²) ≥ ALPHA_EPS
    # (render.cu:334), i.e. md² ≤ gain = 2·ln(op/ε); the exact pixel AABB
    # of that ellipse is ±√(gain·Σxx) per axis (the marginal variances
    # sxx/syy are already in hand). The emitted AABB becomes the
    # INTERSECTION of the reference's k·σ eigen box with this bound: every
    # pixel between the two fails the kernels' α ≥ ε test, so the per-pixel
    # rect test, the tile coverage, and the instance count all shrink with
    # ZERO output change (the compositors and the oracle all apply the same
    # threshold). Unlike a k·σ marginal-box rebuild — rejected in
    # PERF_NOTES round 3 because high-opacity splats pass α ≥ ε beyond k·σ
    # — the gain-scaled bound covers every passing pixel by construction.
    # Conservative margins so the bound also holds for the packed path's
    # quantized conic (rel err ≤ 2⁻⁹), 16-bit opacity (≤ 7.6e-6, covered by
    # +1e-4 on op), fast_exp (2.6e-6 rel), and the 13.3/rounded centers
    # (≤ 0.56 px, covered by +1 px). Opacity-blind k·σ boxes also made the
    # k_sigma UI slider (0.1–8, canvas.cpp:298-335) a coverage cliff at
    # high k; the threshold bound caps that for free.
    gain = 2.0 * jnp.log((opacity + 1e-4) * (1.0 / ALPHA_EPS))
    gain = jnp.maximum(gain, 0.0) * (1.0 + 2.0**-6)
    ext_x = jnp.sqrt(gain * jnp.maximum(sxx, 0.0)) + 1.0
    ext_y = jnp.sqrt(gain * jnp.maximum(syy, 0.0)) + 1.0
    xmin_px = jnp.maximum(xmin_px, jnp.floor(cx_px - ext_x))
    xmax_px = jnp.minimum(xmax_px, jnp.ceil(cx_px + ext_x))
    ymin_px = jnp.maximum(ymin_px, jnp.floor(cy_px - ext_y))
    ymax_px = jnp.minimum(ymax_px, jnp.ceil(cy_px + ext_y))
    # Empty intersection ⇒ no pixel can pass the blend test anywhere
    # (e.g. a faint splat whose screen-clamped box misses its own center).
    nonempty = (xmax_px >= xmin_px) & (ymax_px >= ymin_px)

    valid = survived_cull & det_ok & on_screen & nonempty

    # Tile coverage via integer stride division (render.cu:761-764).
    tmin_x = jnp.clip(xmin_px.astype(jnp.int32) // tile_w, 0, tiles_x - 1)
    tmax_x = jnp.clip(xmax_px.astype(jnp.int32) // tile_w, 0, tiles_x - 1)
    tmin_y = jnp.clip(ymin_px.astype(jnp.int32) // tile_h, 0, tiles_y - 1)
    tmax_y = jnp.clip(ymax_px.astype(jnp.int32) // tile_h, 0, tiles_y - 1)

    return ProjectedGaussians(
        valid=valid,
        depth=depth,
        color=color,
        opacity=opacity,
        center_px=jnp.stack([cx_px, cy_px], axis=-1),
        conic=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        aabb_px=jnp.stack([xmin_px, ymin_px, xmax_px, ymax_px], axis=-1),
        tile_min=jnp.stack([tmin_x, tmin_y], axis=-1),
        tile_max=jnp.stack([tmax_x, tmax_y], axis=-1),
    )
