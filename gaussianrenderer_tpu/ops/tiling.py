"""Tile-instance expansion, (tile, depth) key sort, and per-tile ranges.

The TPU replacement for the reference's four-stage machinery (SURVEY.md
§2.11 mapping):

* per-block shared-memory tile histograms + two ``prefixSum`` launches
  (``render.cu:767-809``)            → one ``jnp.cumsum``,
* ``buildLwgs`` atomic slot ranking (``render.cu:811-857``) → scatter +
  ``cummax`` segment expansion into a **static** capacity buffer,
* CUB DeviceRadixSort over packed 64-bit ``(tile << 32) | depth`` keys
  (``render.cu:1099-1118``)          → ``jax.lax.sort`` on ONE packed
  32-bit key (tile-major, quantized depth minor),
* per-tile offset table readback     → ``searchsorted`` of the T tile ids
  over the sorted keys (T lookups, not C).

Why this exact formulation (measured on a v5e, tools/micro_bench*.py):

* ``jnp.searchsorted`` over C slots is ~17 serial gathers — 91 ms at C=800k.
* Any large gather is scalar-core bound (~70-136 ms for 6M rows at N=3M,
  regardless of index order), so NOTHING here gathers at instance scale.
* Scatters with sorted unique indices are bandwidth-fast (0.12 ms for 3M),
  ``cummax``/``cumsum`` are fast, and ``lax.sort`` with a SINGLE int key
  hits an XLA fast path ~30× faster than a 2-key sort (0.3 ms vs 9.6 ms at
  4M). Everything below is built from those three primitives.

The expansion works on segments: Gaussian ``g`` owns the slot range
``[excl[g], excl[g]+counts[g])``. Each per-Gaussian quantity is scattered
to its segment-start slot packed into an int64 as ``(g << B) | value``;
because ``g`` is strictly increasing along slots, an inclusive ``cummax``
broadcasts each segment's packed record to all of its slots — a gather-free
"repeat".

Depth keys: ascending camera-space depth quantized to ``depth_bits``
buckets over [near, far] (the reference packs ``uint32(-Z*1e6)`` into the
low key half, ``render.cu:850``; with a single 32-bit key we spend
``32 - ceil(log2(T))`` bits on depth instead — ties within ~0.1 mm of each
other may blend in either order, which is within the reference's own
quantization regime).

Static shapes: the reference sizes its instance buffer from a mid-frame
device→host readback of the prefix-sum total (``render.cu:962-971``); on
TPU the capacity is a compile-time constant and excess instances are
dropped with an overflow flag reported.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

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
    #: Features carried through the sort, (F, C) field-major — present only
    #: on the fast path (see build_sorted_instances(features=...)).
    sorted_feats: Optional[jnp.ndarray] = None


def _segment_expand_multi(
    start_slot: jnp.ndarray,  # (N,) int32 segment-start slot (counts>0 only)
    end_slot: jnp.ndarray,  # (N,) int32 one-past-end slot per segment
    values: Sequence[jnp.ndarray],  # list of (N,) int32/uint32 payloads
    capacity: int,
) -> list:
    """Broadcast each ``values[k][g]`` to every slot of g's segment.

    Gather-free segment broadcast via the interval-delta trick: scatter-add
    ``+v`` at the segment's first slot and ``−v`` one past its last slot,
    then an int32 ``cumsum`` reconstructs v exactly on every covered slot —
    segments are disjoint and two's-complement addition is exact under
    wraparound, so this works for arbitrary 32-bit payloads (float bits
    included). Both scatters use sorted indices (the fast case on TPU) and
    each field costs one cumsum — far cheaper than a 14-wide
    associative-scan forward fill. Uncovered slots (beyond the total) read
    0. Pure 32-bit: no int64 needed (x64 is disabled by default).
    """
    out = []
    for v in values:
        if v.dtype == jnp.int32:
            vi = v
        else:
            vi = jax.lax.bitcast_convert_type(v, jnp.int32)
        delta = jnp.zeros((capacity,), dtype=jnp.int32)
        delta = delta.at[start_slot].add(vi, mode="drop")
        delta = delta.at[end_slot].add(-vi, mode="drop")
        filled = jnp.cumsum(delta)
        if v.dtype != jnp.int32:
            filled = jax.lax.bitcast_convert_type(filled, v.dtype)
        out.append(filled)
    return out


def expand_instances(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    num_tiles: int,
    capacity: int,
    depth_bits: int,
    near: jnp.ndarray,
    far: jnp.ndarray,
    features_u32: Optional[Sequence[jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, list]:
    """Expand per-Gaussian tile rects into per-slot (key, gauss_id, feats).

    ``features_u32``: per-Gaussian uint32 words to broadcast over each
    Gaussian's slots (callers pre-pack f32/f16/u16 data into u32).
    Returns (sort_key u32 (C,), gauss_id (C,), total, in_range, feat_slots)
    in emission (gaussian-major) order, pre-sort.
    """
    tmin = proj.tile_min
    tmax = proj.tile_max
    width = (tmax[:, 0] - tmin[:, 0] + 1).astype(jnp.int32)
    height = (tmax[:, 1] - tmin[:, 1] + 1).astype(jnp.int32)
    counts = jnp.where(proj.valid, width * height, 0).astype(jnp.int32)

    incl = jnp.cumsum(counts)
    total = incl[-1]
    excl = incl - counts

    n = counts.shape[0]
    gauss = jnp.arange(n, dtype=jnp.int32)
    # Interval-delta scatter sites: +v at excl, −v at incl. Empty segments
    # (excl == incl) self-cancel; slots ≥ capacity are dropped by the
    # scatter's OOB mode.
    start_slot = excl
    end_slot = incl

    slots = jnp.arange(capacity, dtype=jnp.int32)
    in_range = slots < jnp.minimum(total, capacity)

    # Per-Gaussian tile rect, packed into one u32: (tmin_x, tmin_y, width) —
    # 10/10/10 bits comfortably cover ≤1024-tile grids per axis.
    rect = (
        (tmin[:, 0].astype(jnp.uint32) << 20)
        | (tmin[:, 1].astype(jnp.uint32) << 10)
        | width.astype(jnp.uint32)
    )
    # Depth bucket: ascending quantization of camera depth over [near, far].
    span = jnp.maximum(far - near, 1e-6)
    depth01 = jnp.clip((proj.depth - near) / span, 0.0, 1.0)
    dmax = float((1 << depth_bits) - 1)
    depth_q = (depth01 * dmax).astype(jnp.uint32)

    # Broadcast every per-Gaussian record to its slots (delta + cumsum each).
    extra = list(features_u32) if features_u32 is not None else []
    expanded = _segment_expand_multi(
        start_slot, end_slot, [gauss, excl, rect, depth_q, *extra], capacity
    )
    gauss_id, excl_slot, rect_slot, depth_slot = expanded[:4]
    feat_slots = expanded[4:]

    rank = slots - excl_slot
    w_slot = (rect_slot & 0x3FF).astype(jnp.int32)
    ty0_slot = ((rect_slot >> 10) & 0x3FF).astype(jnp.int32)
    tx0_slot = ((rect_slot >> 20) & 0x3FF).astype(jnp.int32)

    safe_w = jnp.maximum(w_slot, 1)
    tile_x = tx0_slot + rank % safe_w
    tile_y = ty0_slot + rank // safe_w
    tile_id = tile_x + tile_y * tiles_x

    # One packed 32-bit sort key: tile-major, depth minor. Invalid slots get
    # the maximal key so they sort to the end.
    key = (tile_id.astype(jnp.uint32) << depth_bits) | depth_slot
    key = jnp.where(in_range, key, jnp.uint32(0xFFFFFFFF))
    return key, gauss_id, total, in_range, feat_slots


def build_sorted_instances(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    num_tiles: int,
    capacity: int,
    depth_scale: float = 1.0e6,  # kept for API compat; unused by the packed key
    near: jnp.ndarray | float = 0.1,
    far: jnp.ndarray | float = 100.0,
    features: Optional[Sequence[jnp.ndarray]] = None,
    depth_bits: Optional[int] = None,
) -> TileAssignment:
    """Expand per-Gaussian tile rectangles into a sorted instance list.

    With ``features`` (a list of (N,) float32 arrays) the features ride the
    sort as payloads and come back as ``sorted_feats`` (F, C) — the fast
    path that avoids any instance-scale gather. Without it, only
    ``gaussian_id`` is carried (legacy path; callers then gather, which is
    only viable for small scenes).

    ``depth_bits`` overrides the derived key split: multi-chip strips
    pass the GLOBAL grid's value so depth ties group exactly like the
    single-chip sort (blend order among tied splats is visible — see
    ops/instances.py build_packed_instances).
    """
    del depth_scale
    # Spend the key bits not needed for tiles on depth resolution (≤24).
    # bit_length(num_tiles) (not num_tiles-1) so the all-ones sentinel tile
    # can never collide with a real tile id.
    tile_bits = max(int(num_tiles).bit_length(), 1)
    if depth_bits is None:
        depth_bits = min(32 - tile_bits, 24)
    else:
        assert tile_bits + depth_bits <= 32

    feats_u32 = None
    if features is not None:
        feats_u32 = [
            jax.lax.bitcast_convert_type(f.astype(jnp.float32), jnp.uint32)
            for f in features
        ]
    key, gauss_id, total, in_range, feat_slots = expand_instances(
        proj,
        tiles_x=tiles_x,
        num_tiles=num_tiles,
        capacity=capacity,
        depth_bits=depth_bits,
        near=jnp.float32(near),
        far=jnp.float32(far),
        features_u32=feats_u32,
    )

    operands = (key, gauss_id, *feat_slots)
    sorted_ops = jax.lax.sort(operands, num_keys=1, is_stable=True)
    key_sorted = sorted_ops[0]
    gauss_sorted = sorted_ops[1]

    tile_sorted = (key_sorted >> depth_bits).astype(jnp.int32)
    tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(
        tile_sorted, tile_ids_all, side="left"
    ).astype(jnp.int32)
    tile_end = jnp.searchsorted(
        tile_sorted, tile_ids_all, side="right"
    ).astype(jnp.int32)

    sorted_feats = None
    if features is not None:
        sorted_feats = jnp.stack(
            [
                jax.lax.bitcast_convert_type(f, jnp.float32)
                for f in sorted_ops[2:]
            ],
            axis=0,
        )

    return TileAssignment(
        gaussian_id=gauss_sorted,
        tile_id=jnp.minimum(tile_sorted, num_tiles).astype(jnp.int32),
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        total_instances=total,
        overflow=total > capacity,
        sorted_feats=sorted_feats,
    )
