"""Per-tile front-to-back alpha compositing (pure-XLA path).

Functional re-design of the reference hot loop ``renderGaussians``
(``src/core/cuda/render.cu:266-367``). The reference walks a tile's sorted
instance range one Gaussian at a time, staging each struct into shared
memory; on TPU we instead composite **chunks of K instances at once**:

  * evaluate the K×P alpha matrix for the tile's P pixels on the VPU,
  * turn the sequential transmittance recurrence into an exclusive
    ``cumprod`` along the chunk axis,
  * accumulate ``rgb += colorsᵀ @ (alpha · T_before)`` as a (3,K)·(K,P)
    matmul — the MXU does the compositing.

Blend semantics are bit-compatible with the reference:

  * alpha = min(opacity · exp(−½·md²), 0.99), skipped when < 1e-3
    (``render.cu:332-335``),
  * pixels stop accumulating once transmittance drops below 1e-3
    (``render.cu:328``) — expressed as a gate on the running product, which
    is exact because T is monotonically non-increasing,
  * the AABB containment test (``render.cu:327``) is applied as a mask, so
    out-of-AABB pixels are untouched even where alpha would exceed 1e-3.

The packed Pallas kernel (``ops/pallas/tile_render2.py``) implements the
same chunk math on packed u32 features; this module is the
compiled-anywhere reference implementation and the correctness oracle
for it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.projection import ProjectedGaussians
from gaussianrenderer_tpu.ops.tiling import TileAssignment

#: Feature-row layout: one 16-float row per Gaussian, gathered into sorted
#: instance order before compositing. Padded to 16 for clean TPU tiling.
FEAT_CX = 0
FEAT_CY = 1
FEAT_CONIC_A = 2
FEAT_CONIC_B = 3
FEAT_CONIC_C = 4
FEAT_OPACITY = 5
FEAT_R = 6
FEAT_G = 7
FEAT_B = 8
FEAT_XMIN = 9
FEAT_YMIN = 10
FEAT_XMAX = 11
FEAT_YMAX = 12
FEAT_DEPTH = 13  # camera-space depth (expected-depth output)
FEAT_DIM = 16

ALPHA_EPS = 1e-3
T_EPS = 1e-3
ALPHA_MAX = 0.99


def build_features(proj: ProjectedGaussians) -> jnp.ndarray:
    """Pack per-Gaussian render fields into an (N, 16) float32 matrix."""
    n = proj.depth.shape[0]
    cols = jnp.concatenate(
        [
            proj.center_px,  # cx, cy
            proj.conic,  # A, B, C
            # Invalid Gaussians get opacity 0 so they can never contribute.
            jnp.where(proj.valid, proj.opacity, 0.0)[:, None],
            proj.color,  # r, g, b
            proj.aabb_px,  # xmin, ymin, xmax, ymax
            proj.depth[:, None],  # camera-space depth (expected-depth row)
        ],
        axis=-1,
    )
    pad = jnp.zeros((n, FEAT_DIM - cols.shape[1]), dtype=jnp.float32)
    return jnp.concatenate([cols.astype(jnp.float32), pad], axis=-1)


def gather_sorted_features(
    feats: jnp.ndarray, assignment: TileAssignment, chunk_size: int
) -> jnp.ndarray:
    """Gather features into sorted-instance order, padded by one chunk.

    The pad guarantees in-bounds chunk slices for the tile walk; pad rows are
    all-zero (opacity 0 ⇒ no contribution). Differentiable via XLA's
    scatter-add transpose — viable for small scenes only; the training
    path uses :func:`gather_sorted_features_seg` (sort+cumsum transpose).
    """
    sorted_feats = feats[assignment.gaussian_id]
    pad = jnp.zeros((chunk_size, FEAT_DIM), dtype=sorted_feats.dtype)
    return jnp.concatenate([sorted_feats, pad], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _gather_rows_seg(feats, ids, sort_key, seg_start, seg_end):
    return feats[ids]


def _gather_rows_seg_fwd(feats, ids, sort_key, seg_start, seg_end):
    return feats[ids], (sort_key, seg_start, seg_end)


def _gather_rows_seg_bwd(res, d):
    """Transpose of the duplicating row gather: per-Gaussian segment sums
    of the (C, 16) cotangent, with ZERO scatters.

    XLA's native transpose is an unsorted scatter-add — scalar-core
    bound and the dominant cost of a train step once the compositor is
    fast (297.7 ms at C=4M on the v5e; a sorted-index scatter-add is
    WORSE, 631 ms — TPU scatter stays serial either way,
    tools/train_bench.py probes). Instead:

      1. one ``lax.sort`` keyed by gaussian id (padding slots keyed N so
         they sort past every real segment) carrying the 16 cotangent
         rows as f32 payloads — segment order is irrelevant to a sum,
         so is_stable=False;
      2. one lane-axis inclusive ``cumsum`` over the (16, C) sorted
         rows;
      3. the segment sum is the difference of the prefix at each
         gaussian's [start, end) boundaries — two stacked (16, N)
         lane-axis gathers (the fast gather form, PERF_NOTES).

    Boundaries come from the CALLER's emission counts (tile-rect areas —
    cheap N-scale math; searchsorted over C is banned). f32 prefix
    cancellation is benign: gradient prefixes random-walk, so the
    differencing error is ~sqrt(C)·eps ≈ 1e-4 relative worst-case,
    under Adam's noise floor."""
    sort_key, seg_start, seg_end = res
    c = d.shape[0]
    d_t = d.T  # (16, C) — row slices of a lane-minor (C, 16) are slow
    ops = jax.lax.sort(
        (sort_key,) + tuple(d_t[j] for j in range(FEAT_DIM)),
        num_keys=1,
        is_stable=False,
    )
    prefix = jnp.cumsum(jnp.stack(ops[1:], axis=0), axis=1)  # (16, C)
    at_end = prefix[:, jnp.clip(seg_end - 1, 0, c - 1)]  # (16, N)
    at_start = prefix[:, jnp.clip(seg_start - 1, 0, c - 1)]
    seg = at_end - jnp.where(seg_start > 0, at_start, 0.0)
    seg = jnp.where(seg_end > seg_start, seg, 0.0)
    import numpy as np

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (seg.T, int_zero(res[0]), int_zero(res[0]), int_zero(seg_start),
            int_zero(seg_end))


_gather_rows_seg.defvjp(_gather_rows_seg_fwd, _gather_rows_seg_bwd)


def gather_sorted_features_seg(
    feats: jnp.ndarray,
    assignment: TileAssignment,
    chunk_size: int,
    proj: ProjectedGaussians,
    capacity: int,
    num_tiles: int,
) -> jnp.ndarray:
    """:func:`gather_sorted_features` with the sort+cumsum gradient
    transpose — the training path's form. ``proj`` supplies the
    per-Gaussian emission counts that locate each gaussian's contiguous
    segment in id-sorted cotangent order (id order IS emission order)."""
    n = proj.depth.shape[0]
    w = (proj.tile_max[:, 0] - proj.tile_min[:, 0] + 1).astype(jnp.int32)
    h = (proj.tile_max[:, 1] - proj.tile_min[:, 1] + 1).astype(jnp.int32)
    counts = jnp.where(proj.valid, w * h, 0).astype(jnp.int32)
    incl = jnp.cumsum(counts)
    seg_end = jnp.minimum(incl, capacity)
    seg_start = jnp.minimum(incl - counts, capacity)
    # Padding slots (tile_id == num_tiles sentinel) sort past every real
    # segment so boundaries line up with the emission counts.
    valid_slot = assignment.tile_id < num_tiles
    sort_key = jnp.where(valid_slot, assignment.gaussian_id, jnp.int32(n))
    sorted_feats = _gather_rows_seg(
        feats, assignment.gaussian_id, sort_key, seg_start, seg_end
    )
    pad = jnp.zeros((chunk_size, FEAT_DIM), dtype=sorted_feats.dtype)
    return jnp.concatenate([sorted_feats, pad], axis=0)


def composite_chunk(
    feats: jnp.ndarray,  # (K, 16)
    k_valid: jnp.ndarray,  # (K,) bool — slot within this tile's count
    gx: jnp.ndarray,  # (P,) pixel x coords
    gy: jnp.ndarray,  # (P,) pixel y coords
    transmittance: jnp.ndarray,  # (P,)
    rgb: jnp.ndarray,  # (3, P)
    depth_acc: "jnp.ndarray | None" = None,  # (P,) expected-depth row
) -> Tuple[jnp.ndarray, jnp.ndarray, "jnp.ndarray | None"]:
    """Composite one chunk of K sorted instances over P pixels.

    Shared by the XLA and Pallas compositors — pure jnp on values.
    """
    cx = feats[:, FEAT_CX][:, None]
    cy = feats[:, FEAT_CY][:, None]
    ca = feats[:, FEAT_CONIC_A][:, None]
    cb = feats[:, FEAT_CONIC_B][:, None]
    cc = feats[:, FEAT_CONIC_C][:, None]
    op = feats[:, FEAT_OPACITY][:, None]
    xmin = feats[:, FEAT_XMIN][:, None]
    ymin = feats[:, FEAT_YMIN][:, None]
    xmax = feats[:, FEAT_XMAX][:, None]
    ymax = feats[:, FEAT_YMAX][:, None]
    colors = feats[:, FEAT_R : FEAT_B + 1]  # (K, 3)

    dx = gx[None, :] - cx  # (K, P)
    dy = gy[None, :] - cy
    md2 = ca * dx * dx + cb * dx * dy + cc * dy * dy
    alpha = jnp.minimum(op * jnp.exp(-0.5 * md2), ALPHA_MAX)

    inside = (
        (gx[None, :] >= xmin)
        & (gx[None, :] <= xmax)
        & (gy[None, :] >= ymin)
        & (gy[None, :] <= ymax)
    )
    alpha = jnp.where(inside & (alpha >= ALPHA_EPS) & k_valid[:, None], alpha, 0.0)

    one_minus = 1.0 - alpha
    u = jnp.cumprod(one_minus, axis=0)
    u_excl = jnp.concatenate(
        [jnp.ones((1, u.shape[1]), dtype=u.dtype), u[:-1]], axis=0
    )
    t_before = transmittance[None, :] * u_excl
    gate = t_before >= T_EPS
    weights = jnp.where(gate, alpha * t_before, 0.0)

    rgb = rgb + jnp.dot(
        colors.T,
        weights,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full-f32 color accumulation
    )  # (3, P)
    if depth_acc is not None:
        depth_acc = depth_acc + jnp.dot(
            feats[:, FEAT_DEPTH][None, :],
            weights,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[0]  # (P,)
    transmittance = transmittance * jnp.prod(
        jnp.where(gate, one_minus, 1.0), axis=0
    )
    return transmittance, rgb, depth_acc


def composite_tiles_diff(
    sorted_feats: jnp.ndarray,  # (C + K, 16)
    tile_start: jnp.ndarray,  # (T,)
    tile_count: jnp.ndarray,  # (T,)
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    width: int,
    height: int,
    chunk_size: int,
    max_chunks: int = 32,
    return_alpha: bool = False,
    return_depth: bool = False,
) -> jnp.ndarray:
    """Differentiable compositor: fixed-trip ``lax.scan`` instead of the
    early-exit ``while_loop`` (which has no reverse-mode AD).

    Used by the training step (reference roadmap: "streaming training",
    README.md:17). Semantics match :func:`composite_tiles_xla` except that
    per-tile instance lists are truncated at ``max_chunks·chunk_size``
    (static bound) and NaN-safe double-``where`` guards keep gradients
    finite. The chunk body is rematerialized in the backward pass
    (``jax.checkpoint``) so residual memory stays at one chunk per tile.
    """
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w
    k = chunk_size

    tile_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    local_x = jnp.tile(jnp.arange(tile_w, dtype=jnp.float32), tile_h)
    local_y = jnp.repeat(jnp.arange(tile_h, dtype=jnp.float32), tile_w)
    k_iota = jnp.arange(k, dtype=jnp.int32)

    def render_tile(start, count, tx_i, ty_i):
        gx = tx_i.astype(jnp.float32) * tile_w + local_x  # (P,)
        gy = ty_i.astype(jnp.float32) * tile_h + local_y

        @jax.checkpoint
        def body(state, i):
            transmittance, rgb, depth = state
            feats = jax.lax.dynamic_slice(
                sorted_feats, (start + i * k, 0), (k, FEAT_DIM)
            )
            k_valid = (i * k + k_iota) < count

            cx = feats[:, FEAT_CX][:, None]
            cy = feats[:, FEAT_CY][:, None]
            ca = feats[:, FEAT_CONIC_A][:, None]
            cb = feats[:, FEAT_CONIC_B][:, None]
            cc = feats[:, FEAT_CONIC_C][:, None]
            op = feats[:, FEAT_OPACITY][:, None]
            xmin = feats[:, FEAT_XMIN][:, None]
            ymin = feats[:, FEAT_YMIN][:, None]
            xmax = feats[:, FEAT_XMAX][:, None]
            ymax = feats[:, FEAT_YMAX][:, None]
            colors = feats[:, FEAT_R : FEAT_B + 1]

            dx = gx[None, :] - cx
            dy = gy[None, :] - cy
            # Clip keeps exp (and its gradient) finite even on padded or
            # out-of-capacity rows the mask will zero anyway.
            md2 = jnp.clip(
                ca * dx * dx + cb * dx * dy + cc * dy * dy, 0.0, 80.0
            )
            alpha = jnp.minimum(op * jnp.exp(-0.5 * md2), ALPHA_MAX)
            inside = (
                (gx[None, :] >= xmin)
                & (gx[None, :] <= xmax)
                & (gy[None, :] >= ymin)
                & (gy[None, :] <= ymax)
            )
            alpha = jnp.where(
                inside & (alpha >= ALPHA_EPS) & k_valid[:, None], alpha, 0.0
            )

            one_minus = 1.0 - alpha
            u = jnp.cumprod(one_minus, axis=0)
            u_excl = jnp.concatenate(
                [jnp.ones((1, p), dtype=u.dtype), u[:-1]], axis=0
            )
            t_before = transmittance[None, :] * u_excl
            gate = t_before >= T_EPS
            weights = jnp.where(gate, alpha * t_before, 0.0)
            rgb = rgb + jnp.dot(
                colors.T,
                weights,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if depth is not None:
                depth = depth + jnp.dot(
                    feats[:, FEAT_DEPTH][None, :],
                    weights,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )[0]
            transmittance = transmittance * jnp.min(
                jnp.where(gate, u, 1.0), axis=0
            )
            return (transmittance, rgb, depth), None

        init = (
            jnp.ones((p,), dtype=jnp.float32),
            jnp.zeros((3, p), dtype=jnp.float32),
            jnp.zeros((p,), dtype=jnp.float32) if return_depth else None,
        )
        (t_final, rgb, depth), _ = jax.lax.scan(
            body, init, jnp.arange(max_chunks, dtype=jnp.int32)
        )
        rows = [rgb]
        if return_alpha:
            rows.append((1.0 - t_final)[None])
        if return_depth:
            rows.append(depth[None])
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rgb

    nc = 3 + int(return_alpha) + int(return_depth)
    tile_rgb = jax.vmap(render_tile)(tile_start, tile_count, tx, ty)
    fb = tile_rgb.reshape(tiles_y, tiles_x, nc, tile_h, tile_w)
    fb = fb.transpose(2, 0, 3, 1, 4).reshape(
        nc, tiles_y * tile_h, tiles_x * tile_w
    )
    return fb[:, :height, :width]


def composite_tiles_xla(
    sorted_feats: jnp.ndarray,  # (C + K, 16)
    tile_start: jnp.ndarray,  # (T,)
    tile_count: jnp.ndarray,  # (T,)
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    width: int,
    height: int,
    chunk_size: int,
    return_alpha: bool = False,
    return_depth: bool = False,
) -> jnp.ndarray:
    """Composite every tile; returns a planar (3, H, W) framebuffer,
    with optional extra rows in [alpha, depth] order: accumulated alpha
    (1 − T_final) and expected depth Σ w·d (``return_depth``).

    vmap over tiles of a chunk-granular ``while_loop`` with the reference's
    early-termination rule (stop when every pixel's transmittance < 1e-3).
    """
    nc = 3 + int(return_alpha) + int(return_depth)
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w
    k = chunk_size

    tile_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    local_x = jnp.tile(jnp.arange(tile_w, dtype=jnp.float32), tile_h)
    local_y = jnp.repeat(jnp.arange(tile_h, dtype=jnp.float32), tile_w)
    k_iota = jnp.arange(k, dtype=jnp.int32)

    def render_tile(start, count, tx_i, ty_i):
        gx = tx_i.astype(jnp.float32) * tile_w + local_x  # (P,)
        gy = ty_i.astype(jnp.float32) * tile_h + local_y

        def cond(state):
            i, transmittance = state[0], state[1]
            return (i * k < count) & (jnp.max(transmittance) >= T_EPS)

        def body(state):
            i, transmittance, rgb, depth = state
            feats = jax.lax.dynamic_slice(
                sorted_feats, (start + i * k, 0), (k, FEAT_DIM)
            )
            k_valid = (i * k + k_iota) < count
            transmittance, rgb, depth = composite_chunk(
                feats, k_valid, gx, gy, transmittance, rgb, depth
            )
            return i + 1, transmittance, rgb, depth

        init = (
            jnp.int32(0),
            jnp.ones((p,), dtype=jnp.float32),
            jnp.zeros((3, p), dtype=jnp.float32),
            jnp.zeros((p,), dtype=jnp.float32) if return_depth else None,
        )
        _, t_final, rgb, depth = jax.lax.while_loop(cond, body, init)
        rows = [rgb]
        if return_alpha:
            rows.append((1.0 - t_final)[None])
        if return_depth:
            rows.append(depth[None])
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rgb

    tile_rgb = jax.vmap(render_tile)(tile_start, tile_count, tx, ty)  # (T,nc,P)

    # Assemble the padded framebuffer, then crop to (nc, H, W).
    fb = tile_rgb.reshape(tiles_y, tiles_x, nc, tile_h, tile_w)
    fb = fb.transpose(2, 0, 3, 1, 4).reshape(
        nc, tiles_y * tile_h, tiles_x * tile_w
    )
    return fb[:, :height, :width]
