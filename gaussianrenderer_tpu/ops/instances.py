"""Packed-instance pipeline: tiered broadcast expansion → single-key sort.

Produces the (8, C) uint32 feature layout consumed by the v2 Pallas
compositor (``ops/pallas/tile_render2.py``). The design is driven by v5e
microbenchmarks (tools/micro_bench*.py, tools/profile_sub.py):

* every instance-scale gather is scalar-core bound (~70-136 ms for 6M rows
  at N=3M), and so is every scatter (~8 ns/element — 24 ms to scatter 3M
  values), so the frame loop may contain NEITHER;
* ``lax.sort`` with one 32-bit key + u32 payload rows is fast (~1.6 ms for
  800k × 9 operands) and is the only data-movement primitive used.

So instead of the reference's count → prefix-sum → scatter expansion
(``render.cu:767-857``), every Gaussian is given a FIXED number of
instance lanes by broadcasting — no data-dependent placement at all:

  tier 1: all N Gaussians × 4 lanes     (covers tile rects ≤ 2×2 — the
          overwhelming majority at 32×32-pixel tiles)
  tier 2: top-K₂ Gaussians by tile count × 64 lanes   (rects ≤ 8×8)
  tier 3: top-K₃ Gaussians × 1024 lanes               (rects ≤ 32×32)

Lanes beyond a Gaussian's actual rect (and all lanes of culled Gaussians)
get the all-ones sentinel key and sort to the end. Tier 2/3 membership
comes from one ``lax.top_k`` over the per-Gaussian tile counts (the K
selected rows are gathered — K is small, so that gather is cheap).
Coverage beyond tier 3 (splats spanning > 32×32 tiles) is truncated and
reported via the overflow flag; the reference sizes its buffer dynamically
from a mid-frame device→host readback instead (``render.cu:962-971``),
which static TPU shapes forbid.

The (tile, depth) sort key is ONE u32 — tile-major, quantized depth minor
(the reference's 64-bit ``(tile << 32) | uint32(-Z·1e6)`` key,
``render.cu:850``, reshaped for 32-bit lanes), and the 8 feature rows ride
the sort as payloads.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.projection import ProjectedGaussians

#: Kernel alpha threshold — splats with opacity below this can never pass
#: the blend test (alpha = op·exp(−½md²) ≤ op), so they emit no instances.
ALPHA_EPS = 1e-3

#: Fixed-point encodings (must match ops/pallas/tile_render2.py).
CENTER_OFFSET = 2048.0
CENTER_SCALE = 16.0
COLOR_SCALE = 65535.0

SENTINEL = jnp.uint32(0xFFFFFFFF)


class PackedInstances(NamedTuple):
    packed_feats: jnp.ndarray  # (8, C) uint32 — kernel feature rows
    tile_start: jnp.ndarray  # (T,) int32
    tile_count: jnp.ndarray  # (T,) int32
    total_instances: jnp.ndarray  # () int32 — instances actually emitted
    overflow: jnp.ndarray  # () bool — some coverage was truncated


def _center_bits(x_rel: jnp.ndarray) -> jnp.ndarray:
    """Tile-local coordinate → 12.4 fixed point u16 (as u32)."""
    q = jnp.round((x_rel + CENTER_OFFSET) * CENTER_SCALE)
    return jnp.clip(q, 0, 65535).astype(jnp.uint32)


def _color_bits(c: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(c * COLOR_SCALE)
    return jnp.clip(q, 0, 65535).astype(jnp.uint32)


def _f32_bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)


def tier_sizes(n: int, boost: int = 0) -> Tuple[int, int]:
    """(K₂, K₃): how many big/huge Gaussians get wide-rect lanes.

    Scaled with N so small scenes don't pay fixed tier costs. ``boost``
    (0-3) quadruples the tiers per step — the session-level response to an
    overflow flag (the static-shape analog of the reference's mid-frame
    buffer resize, ``render.cu:962-971``): re-jit with a bigger bucket,
    keep rendering.
    """
    scale = 4 ** min(boost, 3)
    k2 = min(n, max(64, n // 16) * scale)
    k3 = min(n, max(16, n // 256) * scale)
    return k2, k3


def _emit_tier(
    tmin_x: jnp.ndarray,  # (G,) int32
    tmin_y: jnp.ndarray,
    rect_w: jnp.ndarray,  # (G,) int32
    rect_h: jnp.ndarray,
    emit: jnp.ndarray,  # (G,) bool — this tier is responsible for the Gaussian
    depth_q: jnp.ndarray,  # (G,) uint32
    rows10: Tuple[jnp.ndarray, ...],  # 10× (G,) u32 pre-packed fields
    *,
    side_x: int,
    side_y: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    depth_bits: int,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Broadcast one tier: each Gaussian × (side_y × side_x) tile lanes.

    Returns (keys (M·G,), 8 feature rows (M·G,)) flattened, with invalid
    lanes keyed SENTINEL. Pure elementwise/broadcast ops — no scatters.
    Arrays are laid out (M, G) — Gaussians on the 128-wide lane axis —
    because the (G, M) orientation wastes (128−M)/128 of every vector op.
    """
    m = side_x * side_y
    off = jnp.arange(m, dtype=jnp.int32)
    dx = (off % side_x)[:, None]  # (M, 1)
    dy = (off // side_x)[:, None]

    tx = tmin_x[None, :] + dx  # (M, G)
    ty = tmin_y[None, :] + dy
    lane_ok = (
        emit[None, :]
        & (dx < rect_w[None, :])
        & (dy < rect_h[None, :])
    )
    tile_id = (tx + ty * tiles_x).astype(jnp.uint32)
    key = (tile_id << depth_bits) | depth_q[None, :]
    key = jnp.where(lane_ok, key, SENTINEL)

    # Tile-local recode of center and AABB (lane-dependent: tile origin).
    cx, cy, ca, cb, cc, q0, rg, b_, ax, ay = rows10
    x0 = (tx * tile_w).astype(jnp.float32)
    y0 = (ty * tile_h).astype(jnp.float32)
    cx_rel = jax.lax.bitcast_convert_type(cx, jnp.float32)[None, :] - x0
    cy_rel = jax.lax.bitcast_convert_type(cy, jnp.float32)[None, :] - y0
    row0 = (_center_bits(cx_rel) << 16) | _center_bits(cy_rel)

    x0i = tx * tile_w
    y0i = ty * tile_h
    xmin = jnp.clip((ax >> 16).astype(jnp.int32)[None, :] - x0i, 0, 255)
    xmax = jnp.clip((ax & 0xFFFF).astype(jnp.int32)[None, :] - x0i, 0, 255)
    ymin = jnp.clip((ay >> 16).astype(jnp.int32)[None, :] - y0i, 0, 255)
    ymax = jnp.clip((ay & 0xFFFF).astype(jnp.int32)[None, :] - y0i, 0, 255)
    row7 = (
        xmin.astype(jnp.uint32)
        | (ymin.astype(jnp.uint32) << 8)
        | (xmax.astype(jnp.uint32) << 16)
        | (ymax.astype(jnp.uint32) << 24)
    )

    def bc(row):  # broadcast a (G,) u32 over the M sublane copies
        return jnp.broadcast_to(row[None, :], key.shape).reshape(-1)

    rows8 = (
        row0.reshape(-1),
        bc(ca),
        bc(cb),
        bc(cc),
        bc(q0),
        bc(rg),
        bc(b_),
        row7.reshape(-1),
    )
    return key.reshape(-1), rows8


def build_packed_instances(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    capacity: int = 0,  # unused (static size = tier sum); kept for API compat
    near=0.1,
    far=100.0,
    tier_boost: int = 0,
) -> PackedInstances:
    del capacity
    num_tiles = tiles_x * tiles_y
    tile_bits = max(int(num_tiles).bit_length(), 1)
    depth_bits = min(32 - tile_bits, 24)

    # ---- per-Gaussian pre-packing (N-scale, elementwise) -------------------
    color = proj.color
    op = jnp.maximum(proj.opacity, 1e-12)
    q0 = -2.0 * jnp.log(op)  # folds opacity into the quadratic constant
    rg = (_color_bits(color[:, 0]) << 16) | _color_bits(color[:, 1])
    b_ = _color_bits(color[:, 2]) << 16
    ax4 = proj.aabb_px  # (N, 4) xmin, ymin, xmax, ymax in pixels
    aabb_x = (
        jnp.clip(ax4[:, 0], 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(ax4[:, 2], 0, 65535).astype(jnp.uint32)
    aabb_y = (
        jnp.clip(ax4[:, 1], 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(ax4[:, 3], 0, 65535).astype(jnp.uint32)
    rows10 = (
        _f32_bits(proj.center_px[:, 0]),
        _f32_bits(proj.center_px[:, 1]),
        _f32_bits(proj.conic[:, 0]),
        _f32_bits(proj.conic[:, 1]),
        _f32_bits(proj.conic[:, 2]),
        _f32_bits(q0),
        rg,
        b_,
        aabb_x,
        aabb_y,
    )

    tmin = proj.tile_min
    tmax = proj.tile_max
    rect_w = (tmax[:, 0] - tmin[:, 0] + 1).astype(jnp.int32)
    rect_h = (tmax[:, 1] - tmin[:, 1] + 1).astype(jnp.int32)
    # Opacity below the blend threshold can never contribute (alpha ≤ op).
    valid = proj.valid & (proj.opacity >= ALPHA_EPS)
    counts = jnp.where(valid, rect_w * rect_h, 0).astype(jnp.int32)
    total = jnp.sum(counts)

    span = jnp.maximum(jnp.float32(far) - jnp.float32(near), 1e-6)
    depth01 = jnp.clip((proj.depth - near) / span, 0.0, 1.0)
    dmax = float((1 << depth_bits) - 1)
    depth_q = jnp.where(valid, (depth01 * dmax), 0.0).astype(jnp.uint32)

    n = counts.shape[0]
    k2, k3 = tier_sizes(n, tier_boost)

    # Tier membership: tier 1 unless the rect exceeds 2×2; "huge" when it
    # exceeds 8×8 (gets 32×32 lanes in tier 3).
    fits_t1 = (rect_w <= 2) & (rect_h <= 2)
    needs_big = valid & ~fits_t1
    needs_huge = needs_big & ((rect_w > 8) | (rect_h > 8))

    # ---- tier 1: every Gaussian × 4 lanes (rects ≤ 2×2) --------------------
    key1, rows1 = _emit_tier(
        tmin[:, 0].astype(jnp.int32),
        tmin[:, 1].astype(jnp.int32),
        rect_w,
        rect_h,
        valid & fits_t1,
        depth_q,
        rows10,
        side_x=2,
        side_y=2,
        tiles_x=tiles_x,
        tile_w=tile_w,
        tile_h=tile_h,
        depth_bits=depth_bits,
    )

    # ---- tiers 2/3 membership: ONE top_k over a tiered rank key ------------
    # huge → rank ~2e9 (prefix of the top-k), big → ~1e9, rest → count.
    rank_key = (
        counts
        + jnp.where(needs_big, jnp.int32(1_000_000_000), 0)
        + jnp.where(needs_huge, jnp.int32(1_000_000_000), 0)
    )
    # Descending selection via the fast single-key sort (lax.top_k is far
    # slower than lax.sort on this hardware at these k/N ratios).
    _, idx_sorted = jax.lax.sort(
        (-rank_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    big_idx = idx_sorted[:k2]

    def sel(a):  # small-K gather — cheap
        return a[big_idx]

    b_tmin_x = sel(tmin[:, 0].astype(jnp.int32))
    b_tmin_y = sel(tmin[:, 1].astype(jnp.int32))
    b_w = sel(rect_w)
    b_h = sel(rect_h)
    b_depth = sel(depth_q)
    b_rows = tuple(sel(r) for r in rows10)
    b_big = sel(needs_big)
    b_huge = sel(needs_huge)
    in_t3 = jnp.arange(k2, dtype=jnp.int32) < k3

    # Tier 2 renders big-but-not-huge rects fully, and gives truncated 8×8
    # coverage to huge ones that didn't fit tier 3 (overflow flags it).
    key2, rows2 = _emit_tier(
        b_tmin_x,
        b_tmin_y,
        b_w,
        b_h,
        b_big & ~(b_huge & in_t3),
        b_depth,
        b_rows,
        side_x=8,
        side_y=8,
        tiles_x=tiles_x,
        tile_w=tile_w,
        tile_h=tile_h,
        depth_bits=depth_bits,
    )
    key3, rows3 = _emit_tier(
        b_tmin_x[:k3],
        b_tmin_y[:k3],
        b_w[:k3],
        b_h[:k3],
        (b_huge & in_t3)[:k3],
        b_depth[:k3],
        tuple(r[:k3] for r in b_rows),
        side_x=32,
        side_y=32,
        tiles_x=tiles_x,
        tile_w=tile_w,
        tile_h=tile_h,
        depth_bits=depth_bits,
    )

    # Truncated coverage: more big Gaussians than tier-2 slots, more huge
    # ones than tier-3 slots, or a rect wider than the 32×32 lane grid.
    overflow = jnp.sum(needs_big.astype(jnp.int32)) > k2
    overflow |= jnp.sum(needs_huge.astype(jnp.int32)) > k3
    overflow |= jnp.any(needs_huge & ((rect_w > 32) | (rect_h > 32)))

    key = jnp.concatenate([key1, key2, key3])
    rows = [
        jnp.concatenate([r1, r2, r3])
        for r1, r2, r3 in zip(rows1, rows2, rows3)
    ]

    # ---- ONE single-key stable sort carrying the 8 packed rows -------------
    sorted_ops = jax.lax.sort((key, *rows), num_keys=1, is_stable=True)
    key_sorted = sorted_ops[0]
    packed = jnp.stack(sorted_ops[1:], axis=0)  # (8, C) u32

    tile_sorted = (key_sorted >> depth_bits).astype(jnp.int32)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tids, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(tile_sorted, tids, side="right").astype(
        jnp.int32
    )

    return PackedInstances(
        packed_feats=packed,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        total_instances=total,
        overflow=overflow,
    )
