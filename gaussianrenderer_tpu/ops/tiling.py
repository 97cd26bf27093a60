"""Tile-instance expansion, (tile, depth) key sort, and per-tile ranges.

The TPU replacement for the reference's four-stage machinery (SURVEY.md
§2.11 mapping):

* per-block shared-memory tile histograms + two ``prefixSum`` launches
  (``render.cu:767-809``)            → one ``jnp.cumsum``,
* ``buildLwgs`` atomic slot ranking (``render.cu:811-857``) → vectorized
  ``searchsorted`` instance expansion into a **static** capacity buffer,
* CUB DeviceRadixSort over packed 64-bit ``(tile << 32) | depth`` keys
  (``render.cu:1099-1118``)          → ``jax.lax.sort`` with two 32-bit keys
  (lexicographic, avoiding 64-bit lanes on TPU),
* per-tile offset table readback     → ``searchsorted`` of tile ids over the
  sorted key array.

Depth keys match the reference exactly: ``uint32(-Z * depth_scale)`` with
truncation toward zero (``render.cu:850``).

Static shapes: the reference sizes its instance buffer from a mid-frame
device→host readback of the prefix-sum total (``render.cu:962-971``); on TPU
the capacity is a compile-time constant and excess instances are dropped
(deepest-first within the emission order) with an overflow flag reported.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.projection import ProjectedGaussians


class TileAssignment(NamedTuple):
    """Sorted (tile, depth) instance list plus per-tile ranges."""

    gaussian_id: jnp.ndarray  # (C,) int32 index into the projected arrays
    tile_id: jnp.ndarray  # (C,) int32 sorted ascending; num_tiles = invalid
    tile_start: jnp.ndarray  # (T,) int32 first instance slot of each tile
    tile_count: jnp.ndarray  # (T,) int32 instances in each tile
    total_instances: jnp.ndarray  # () int32 — would-be total (pre-capacity)
    overflow: jnp.ndarray  # () bool — capacity exceeded, instances dropped


def build_sorted_instances(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    num_tiles: int,
    capacity: int,
    depth_scale: float = 1.0e6,
) -> TileAssignment:
    """Expand per-Gaussian tile rectangles into a sorted instance list."""
    tmin = proj.tile_min
    tmax = proj.tile_max
    width = tmax[:, 0] - tmin[:, 0] + 1
    height = tmax[:, 1] - tmin[:, 1] + 1
    counts = jnp.where(proj.valid, width * height, 0).astype(jnp.int32)

    incl = jnp.cumsum(counts)  # inclusive prefix sum
    total = incl[-1] if counts.shape[0] > 0 else jnp.int32(0)
    excl = incl - counts

    slots = jnp.arange(capacity, dtype=jnp.int32)
    # Instance slot i belongs to the Gaussian whose cumulative range covers i.
    gauss_id = jnp.searchsorted(incl, slots, side="right").astype(jnp.int32)
    gauss_id = jnp.minimum(gauss_id, counts.shape[0] - 1)
    in_range = slots < total

    rank = slots - excl[gauss_id]
    g_w = width[gauss_id]
    tile_x = tmin[gauss_id, 0] + rank % g_w
    tile_y = tmin[gauss_id, 1] + rank // g_w
    tile_id = tile_x + tile_y * tiles_x

    # Depth key: uint32 truncation of (depth * scale) — render.cu:850.
    depth_q = (proj.depth * depth_scale).astype(jnp.uint32)
    depth_key = depth_q[gauss_id]

    # Invalid slots sort to the very end (tile sentinel = num_tiles).
    tile_id = jnp.where(in_range, tile_id, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(in_range, depth_key, jnp.uint32(0xFFFFFFFF))

    tile_sorted, _, gauss_sorted = jax.lax.sort(
        (tile_id, depth_key, gauss_id), num_keys=2
    )

    tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids_all, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(tile_sorted, tile_ids_all, side="right").astype(
        jnp.int32
    )

    return TileAssignment(
        gaussian_id=gauss_sorted,
        tile_id=tile_sorted,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        total_instances=total,
        overflow=total > capacity,
    )
