"""Spherical-harmonics view-dependent color evaluation.

Parity with the reference's in-kernel SH evaluation
(``src/core/cuda/render.cu:369-386`` constants, ``render.cu:506-534`` eval):
real SH basis up to degree 3, view direction = normalize(splat_pos −
camera_pos) in world space, result offset by +0.5 and clamped to [0, 1].

The reference's live path only evaluates degrees 0-2 (its ``deg`` flag is 3
but no degree-3 branch exists — SURVEY.md §2.5); we implement the degree-3
band as well (reference constants ``SH_C3`` exist at ``render.cu:378-386``,
and BASELINE config 3 calls for degree-3 color).

Coefficient layout is the reference's interleaved one: ``sh[:, 3*c + ch]``
is coefficient ``c`` of channel ``ch`` (see scene/gaussians.py).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh_columns(
    sh_t: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    z: jnp.ndarray,
    degree: int,
    clamp: bool = True,
) -> jnp.ndarray:
    """Column-wise SH evaluation for the hot path.

    ``sh_t`` is the TRANSPOSED coefficient matrix (3·(deg+1)², N) — its
    rows are contiguous (N,) vectors, whereas column slices of the (N, C)
    form re-read the whole lane-padded buffer per coefficient. Identical
    math to :func:`eval_sh`.
    """
    n_coeff_stored = sh_t.shape[0] // 3
    max_degree_stored = int(round(n_coeff_stored**0.5)) - 1
    degree = min(degree, max_degree_stored)

    basis = [jnp.full_like(x, SH_C0)]
    if degree > 0:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis += [
                SH_C2[0] * xy,
                SH_C2[1] * yz,
                SH_C2[2] * (2.0 * zz - xx - yy),
                SH_C2[3] * xz,
                SH_C2[4] * (xx - yy),
            ]
            if degree > 2:
                basis += [
                    SH_C3[0] * y * (3.0 * xx - yy),
                    SH_C3[1] * xy * z,
                    SH_C3[2] * y * (4.0 * zz - xx - yy),
                    SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    SH_C3[4] * x * (4.0 * zz - xx - yy),
                    SH_C3[5] * z * (xx - yy),
                    SH_C3[6] * x * (xx - 3.0 * yy),
                ]
    channels = []
    for ch in range(3):
        acc = basis[0] * sh_t[ch]
        for c in range(1, len(basis)):
            acc = acc + basis[c] * sh_t[3 * c + ch]
        channels.append(acc)
    color = jnp.stack(channels, axis=-1)
    if clamp:
        color = jnp.clip(color + 0.5, 0.0, 1.0)
    return color


def eval_sh(
    sh: jnp.ndarray, dirs: jnp.ndarray, degree: int, clamp: bool = True
) -> jnp.ndarray:
    """Evaluate view-dependent RGB from SH coefficients.

    Args:
      sh: (N, 3*(deg+1)^2) interleaved coefficients.
      dirs: (N, 3) unit view directions (world space).
      degree: SH degree actually evaluated (≤ the degree stored in ``sh``).
      clamp: apply the reference's ``+0.5`` offset and [0,1] clamp
        (``render.cu:531-534``).

    Returns: (N, 3) colors.
    """
    n_coeff_stored = sh.shape[-1] // 3
    max_degree_stored = int(round(n_coeff_stored**0.5)) - 1
    degree = min(degree, max_degree_stored)

    def coeff(c: int) -> jnp.ndarray:
        return sh[..., 3 * c : 3 * c + 3]

    color = SH_C0 * coeff(0)
    if degree > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        color = color - SH_C1 * y * coeff(1) + SH_C1 * z * coeff(2) - SH_C1 * x * coeff(3)
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            color = (
                color
                + SH_C2[0] * xy * coeff(4)
                + SH_C2[1] * yz * coeff(5)
                + SH_C2[2] * (2.0 * zz - xx - yy) * coeff(6)
                + SH_C2[3] * xz * coeff(7)
                + SH_C2[4] * (xx - yy) * coeff(8)
            )
            if degree > 2:
                color = (
                    color
                    + SH_C3[0] * y * (3.0 * xx - yy) * coeff(9)
                    + SH_C3[1] * xy * z * coeff(10)
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * coeff(11)
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * coeff(12)
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * coeff(13)
                    + SH_C3[5] * z * (xx - yy) * coeff(14)
                    + SH_C3[6] * x * (xx - 3.0 * yy) * coeff(15)
                )
    if clamp:
        color = jnp.clip(color + 0.5, 0.0, 1.0)
    return color
