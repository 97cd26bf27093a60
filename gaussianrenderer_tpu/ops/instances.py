"""Packed-instance pipeline: expansion → packing → single-key sort.

Produces exactly the (8, C) uint32 feature layout consumed by the v2 Pallas
compositor (``ops/pallas/tile_render2.py``), with every step built from the
three primitives that are fast on TPU (sorted-index scatter, cummax scan,
single-key ``lax.sort`` — see ops/tiling.py for the measurements driving
this).

Data flow per frame::

  per-Gaussian (N,)       expansion (C,)            sort (C,)
  ---------------------   ----------------------    -------------------
  rect/depth/10 fields →  scatter+cummax segment →  1 packed u32 key +
  (f16/u16 pre-packing)   broadcast, tile-local     8 u32 payload rows
                          recode → 8 u32 rows       (stable radix path)

The reference reaches the same sorted state with buildLwgs + CUB SortPairs
over 64-bit keys (``render.cu:811-857, 1099-1118``); here the key is a
single 32-bit word (tile-major, quantized depth minor) because XLA's
single-key sort is ~30× faster than its multi-key comparator path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.projection import ProjectedGaussians
from gaussianrenderer_tpu.ops.tiling import expand_instances


class PackedInstances(NamedTuple):
    packed_feats: jnp.ndarray  # (8, C) uint32 — kernel feature rows
    tile_start: jnp.ndarray  # (T,) int32
    tile_count: jnp.ndarray  # (T,) int32
    total_instances: jnp.ndarray  # () int32 pre-capacity total
    overflow: jnp.ndarray  # () bool


#: Fixed-point encodings (must match ops/pallas/tile_render2.py).
CENTER_OFFSET = 2048.0
CENTER_SCALE = 16.0
COLOR_SCALE = 65535.0


def _center_bits(x_rel: jnp.ndarray) -> jnp.ndarray:
    """Tile-local coordinate → 12.4 fixed point u16 (as u32)."""
    q = jnp.round((x_rel + CENTER_OFFSET) * CENTER_SCALE)
    return jnp.clip(q, 0, 65535).astype(jnp.uint32)


def _color_bits(c: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(c * COLOR_SCALE)
    return jnp.clip(q, 0, 65535).astype(jnp.uint32)


def _f32_bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)


def build_packed_instances(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    capacity: int,
    near,
    far,
) -> PackedInstances:
    num_tiles = tiles_x * tiles_y
    tile_bits = max(int(num_tiles).bit_length(), 1)
    depth_bits = min(32 - tile_bits, 24)

    # ---- per-Gaussian pre-packing (N-scale, cheap) -------------------------
    color = proj.color
    op = jnp.maximum(proj.opacity, 1e-12)
    q0 = -2.0 * jnp.log(op)  # folds opacity into the quadratic constant
    rg = (_color_bits(color[:, 0]) << 16) | _color_bits(color[:, 1])
    b_ = _color_bits(color[:, 2]) << 16
    ax = proj.aabb_px  # (N, 4) xmin, ymin, xmax, ymax in pixels
    aabb_x = (
        jnp.clip(ax[:, 0], 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(ax[:, 2], 0, 65535).astype(jnp.uint32)
    aabb_y = (
        jnp.clip(ax[:, 1], 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(ax[:, 3], 0, 65535).astype(jnp.uint32)

    fields = [
        _f32_bits(proj.center_px[:, 0]),  # 0 cx (global px)
        _f32_bits(proj.center_px[:, 1]),  # 1 cy
        _f32_bits(proj.conic[:, 0]),  # 2 A
        _f32_bits(proj.conic[:, 1]),  # 3 B
        _f32_bits(proj.conic[:, 2]),  # 4 C
        _f32_bits(q0),  # 5 q0
        rg,  # 6 f16 r|g
        b_,  # 7 f16 b|-
        aabb_x,  # 8 u16 xmin|xmax
        aabb_y,  # 9 u16 ymin|ymax
    ]

    # ---- segment expansion to instance slots (C-scale, gather-free) --------
    key, _gauss_id, total, in_range, slots = expand_instances(
        proj,
        tiles_x=tiles_x,
        num_tiles=num_tiles,
        capacity=capacity,
        depth_bits=depth_bits,
        near=jnp.float32(near),
        far=jnp.float32(far),
        features_u32=fields,
    )

    # ---- per-slot tile-local recode (C-scale elementwise) ------------------
    tile_id = (key >> depth_bits).astype(jnp.int32)
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    x0 = (tx * tile_w).astype(jnp.float32)
    y0 = (ty * tile_h).astype(jnp.float32)

    cx_rel = jax.lax.bitcast_convert_type(slots[0], jnp.float32) - x0
    cy_rel = jax.lax.bitcast_convert_type(slots[1], jnp.float32) - y0
    row0 = (_center_bits(cx_rel) << 16) | _center_bits(cy_rel)

    x0i = (tx * tile_w).astype(jnp.int32)
    y0i = (ty * tile_h).astype(jnp.int32)
    xmin = jnp.clip((slots[8] >> 16).astype(jnp.int32) - x0i, 0, 255)
    xmax = jnp.clip((slots[8] & 0xFFFF).astype(jnp.int32) - x0i, 0, 255)
    ymin = jnp.clip((slots[9] >> 16).astype(jnp.int32) - y0i, 0, 255)
    ymax = jnp.clip((slots[9] & 0xFFFF).astype(jnp.int32) - y0i, 0, 255)
    row7 = (
        xmin.astype(jnp.uint32)
        | (ymin.astype(jnp.uint32) << 8)
        | (xmax.astype(jnp.uint32) << 16)
        | (ymax.astype(jnp.uint32) << 24)
    )

    rows = (row0, slots[2], slots[3], slots[4], slots[5], slots[6], slots[7], row7)

    # ---- one single-key stable sort carrying the 8 packed rows -------------
    sorted_ops = jax.lax.sort((key, *rows), num_keys=1, is_stable=True)
    key_sorted = sorted_ops[0]
    packed = jnp.stack(sorted_ops[1:], axis=0)  # (8, C) u32

    tile_sorted = (key_sorted >> depth_bits).astype(jnp.int32)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tids, side="right").astype(jnp.int32)

    return PackedInstances(
        packed_feats=packed,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        total_instances=total,
        overflow=total > capacity,
    )
