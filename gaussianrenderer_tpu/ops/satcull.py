"""Saturation/overdraw culling: drop splats provably behind opaque pixels.

The reference's hot loop stops per pixel once transmittance falls below
1e-3 (``render.cu:326-328``) — dead instances still cost their sort lanes
and their launch slots. On TPU the frame's two walls are the frame sort
(lanes ≈ cost) and the dense compositor (every (pixel, lane) pair issues
VPU slots), so the same physics is worth far more applied EARLIER: an
instance that arrives after every pixel it touches is saturated can be
dropped *before the frame sort*, removing its lanes from the sort AND its
pairs from the compositor.

Mechanism (frame-coherent, conservative, never silent):

1. The packed compositor kernel records, per 16×16 pixel sub-block, the
   sorted-lane index at which the block's max transmittance first fell
   below T_EPS (``sat_blocks`` in ops/pallas/tile_render2.py). Decoded
   through the frame-sort key's quantized depth this becomes a per-block
   CUTOFF DEPTH: beyond it, nothing in this block can change any pixel.
   The chunk-granular recording rounds the cutoff UP (later), never down.
2. Next frame, a splat is culled iff its depth exceeds the cutoff of
   EVERY sub-block its pixel AABB touches — evaluated as one sample of a
   2-cell-dilated max pyramid over the cutoff image (HiZ-style: the
   dilated pyramid overestimates the rect max, so the test only ever
   under-culls) through the gather-free MXU table lookup
   (ops/pallas/lookup.py; N-scale gathers are scalar-bound).
3. Honesty: ``RenderStats.sat_culled`` counts dropped splats;
   ``sat_risk`` counts blocks that were saturated last frame (cull
   active) but failed to saturate this frame — the disocclusion signal
   that the frame-coherence assumption may have clipped content this
   frame. Such blocks publish SAT_NONE cutoffs, so the next frame
   renders them in full (self-healing, one-frame exposure bounded by
   ``sat_margin``).

For a STATIC camera the cull is exact from frame 2 on: a culled splat's
every covered pixel had T < T_EPS before it arrived, so the blend gate
zeroed its weights anyway — the image is bit-identical. Under camera
motion the margin (in depth units) absorbs small saturation-front
shifts; the PSNR-vs-oracle gates (≥40 dB) bound the residual.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

#: "Not saturated" cutoff — a large bf16-exact finite (2^30) rather than
#: +inf so it survives the bf16 table lookup and MXU math unconditionally.
#: Any real camera depth (≤ far plane) is astronomically below it.
SAT_NONE = _np.float32(2.0**30)

#: Sub-block edge in pixels (both axes). 16 divides every packed tile
#: shape; 4 blocks per 32×32 tile gives the cull resolution needed at
#: tile fringes (a tile's border pixels often stay uncovered while its
#: interior saturates — tile-granular cutoffs would then never fire).
SB = 16


def sat_grid(
    tiles_x: int, tiles_y: int, tile_w: int, tile_h: int
) -> Tuple[int, int]:
    """(sy, sx) sub-block grid dims covering the padded tile area."""
    assert tile_w % SB == 0 and tile_h % SB == 0, (
        f"tile {tile_w}x{tile_h} not divisible by the {SB}px sat block"
    )
    return tiles_y * (tile_h // SB), tiles_x * (tile_w // SB)


def initial_cutoff(
    tiles_x: int, tiles_y: int, tile_w: int, tile_h: int
) -> jnp.ndarray:
    """The no-information state: every block unsaturated (no culling)."""
    sy, sx = sat_grid(tiles_x, tiles_y, tile_w, tile_h)
    return jnp.full((sy, sx), SAT_NONE, jnp.float32)


class _Level(NamedTuple):
    off: int  # flat offset of this level in the concatenated table
    w: int
    h: int


def _levels(sx: int, sy: int) -> List[_Level]:
    """Static pyramid geometry: level l cells cover 2^l sub-blocks; the
    top level's cell covers any in-grid span (2^top ≥ max(sx, sy))."""
    top = max(int(_np.ceil(_np.log2(max(sx, sy)))), 0)
    levels = []
    off, w, h = 0, sx, sy
    for _ in range(top + 1):
        levels.append(_Level(off, w, h))
        off += w * h
        w = -(-w // 2)
        h = -(-h // 2)
    return levels


def table_size(sx: int, sy: int) -> int:
    lv = _levels(sx, sy)
    return lv[-1].off + lv[-1].w * lv[-1].h


def build_pyramid(cutoff_img: jnp.ndarray) -> jnp.ndarray:
    """Cutoff image (sy, sx) → flat dilated-max pyramid (table_size,).

    Each level stores D_l[i, j] = max of L_l over [i, i+1]×[j, j+1] (a
    2-cell forward window), so ONE sample at (y0 >> l, x0 >> l) with
    level l chosen such that 2^l ≥ the rect span covers the whole rect —
    max-OVERestimated (conservative: cutoffs only rise). Edge padding
    uses 0, which the in-grid rects never need (values are ≥ near > 0).
    """
    sy, sx = cutoff_img.shape
    tabs = []
    cur = cutoff_img
    for _ in _levels(sx, sy):
        right = jnp.pad(cur[:, 1:], ((0, 0), (0, 1)))
        down_ = jnp.pad(cur[1:, :], ((0, 1), (0, 0)))
        diag = jnp.pad(cur[1:, 1:], ((0, 1), (0, 1)))
        tabs.append(
            jnp.maximum(jnp.maximum(cur, right), jnp.maximum(down_, diag))
            .reshape(-1)
        )
        h, w = cur.shape
        cur = jnp.pad(cur, ((0, h % 2), (0, w % 2)))
        cur = jnp.maximum(cur[::2, :], cur[1::2, :])
        cur = jnp.maximum(cur[:, ::2], cur[:, 1::2])
    return jnp.concatenate(tabs)


def rect_cutoff(
    table: jnp.ndarray,  # (table_size,) f32 — build_pyramid output
    aabb_px: jnp.ndarray,  # (N, 4) f32 xmin, ymin, xmax, ymax (pixels)
    *,
    sx: int,
    sy: int,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Per-splat conservative max cutoff over the sub-blocks its pixel
    AABB touches — one dilated-pyramid sample per splat, fetched through
    the gather-free MXU lookup (``use_pallas=False`` falls back to
    ``jnp.take`` for oracles/probes; bf16-table rounding then differs,
    so compare against :func:`jax.numpy.take` of the SAME bf16 table)."""
    x0 = jnp.clip(aabb_px[:, 0].astype(jnp.int32) // SB, 0, sx - 1)
    y0 = jnp.clip(aabb_px[:, 1].astype(jnp.int32) // SB, 0, sy - 1)
    x1 = jnp.clip(aabb_px[:, 2].astype(jnp.int32) // SB, 0, sx - 1)
    y1 = jnp.clip(aabb_px[:, 3].astype(jnp.int32) // SB, 0, sy - 1)
    span = jnp.maximum(x1 - x0, y1 - y0) + 1
    levels = _levels(sx, sy)
    lsel = jnp.zeros_like(span)
    for t in range(len(levels) - 1):
        lsel = lsel + (span > (1 << t)).astype(jnp.int32)
    idx = jnp.zeros_like(span)
    for l, lv in enumerate(levels):
        cand = lv.off + (y0 >> l) * lv.w + (x0 >> l)
        idx = jnp.where(lsel == l, cand, idx)

    if use_pallas:
        from gaussianrenderer_tpu.ops.pallas.lookup import (
            bf16_ceil,
            table_lookup,
        )

        m = table.shape[0]
        r = 128 * max(-(-m // 16384), 1)
        return table_lookup(bf16_ceil(table), idx, r=r, q=128)
    return jnp.take(table, idx)


def cull_mask(
    valid: jnp.ndarray,  # (N,) bool
    depth: jnp.ndarray,  # (N,) f32 camera-space depth
    aabb_px: jnp.ndarray,  # (N, 4) f32
    cutoff_table: jnp.ndarray,  # build_pyramid output
    *,
    sx: int,
    sy: int,
    margin: float,
    depth_step: float,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """True where the splat is provably (frame-coherently) dead.

    ``depth_step`` is one frame-sort depth-quantization step
    ((far−near)/(2^depth_bits−1)): the kernel records cutoffs at lane
    granularity but splats tie at quantized depth, so the cull must stay
    strictly beyond one full step. ``margin`` (depth units) absorbs
    camera motion between the cutoff frame and this one."""
    cut = rect_cutoff(
        cutoff_table, aabb_px, sx=sx, sy=sy, use_pallas=use_pallas
    )
    return valid & (depth > cut + (margin + 1.5 * depth_step))


def dilate_cutoff(cutoff_img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Spatial min-filter over a (2r+1)² block neighborhood.

    The depth margin absorbs saturation-front motion ALONG the ray;
    camera rotation/translation also slides fronts LATERALLY across the
    screen — at 15°/frame orbit steps a front moves several 16px blocks,
    and a depth margin alone cannot see that (c4 census pose 2: 31 dB
    before dilation). Raising every cutoff to the MAX of its
    neighborhood (higher cutoff = cull less; a SAT_NONE neighbor
    disables culling outright) makes the cull safe against up to
    ``radius`` blocks of lateral front motion per frame. Separable, r
    steps of 3-point maxes — image-space cost, negligible."""
    img = cutoff_img
    for _ in range(max(radius, 0)):
        pad = jnp.pad(img, ((1, 1), (0, 0)), constant_values=SAT_NONE)
        img = jnp.maximum(jnp.maximum(pad[:-2], pad[1:-1]), pad[2:])
        pad = jnp.pad(img, ((0, 0), (1, 1)), constant_values=SAT_NONE)
        img = jnp.maximum(
            jnp.maximum(pad[:, :-2], pad[:, 1:-1]), pad[:, 2:]
        )
    return img


def tile_cutoff_q(
    cutoff_img: jnp.ndarray,  # (sy, sx) f32 — decoded-depth cutoffs
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    near,
    depth_step,
    margin: float,
) -> jnp.ndarray:
    """Per-TILE cutoff table in frame-sort depth-quantization units — the
    input of the PER-POSITION cull inside emission (ops/instances.py
    ``sat_cut_q``): an instance at tile t with quantized depth q is dead
    iff q > table[t].

    Tile-granular conservatism: an instance may touch ANY block of its
    tile, so the tile's cutoff is the MAX over its 16×16 blocks —
    culling needs the WHOLE tile saturated beyond the instance's depth,
    exactly the reach of the kernel's early-exit, applied before the
    sort instead of inside the compositor. The c7 census puts this at
    ~56% of composited instances vs ~59% for block granularity
    (overdraw_census.jsonl), so the cheaper table costs ~3% of the
    ceiling. Values are bf16-ceiled (the MXU lookup table rides bf16;
    rounding UP only ever un-culls). An unsaturated block (SAT_NONE)
    makes its tile never cull."""
    from gaussianrenderer_tpu.ops.pallas.lookup import bf16_ceil

    bh = tile_h // SB
    bw = tile_w // SB
    tmax_ = cutoff_img.reshape(tiles_y, bh, tiles_x, bw).max(axis=(1, 3))
    q = jnp.floor(
        (tmax_.reshape(-1) - jnp.float32(near))
        / jnp.maximum(jnp.float32(depth_step), 1e-20)
    )
    margin_q = jnp.ceil(
        jnp.float32(margin) / jnp.maximum(jnp.float32(depth_step), 1e-20)
    )
    return bf16_ceil(q + margin_q).astype(jnp.float32)


def cutoff_from_sat(
    sat_idx: jnp.ndarray,  # (T·B,) int32 — kernel sat output, −1 = never
    depth_sorted: jnp.ndarray,  # (C,) f32 per-lane decoded depth
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
) -> jnp.ndarray:
    """Kernel sat-lane indices → the (sy, sx) cutoff-depth image.

    One small gather (T·B ≤ ~33k elements — far below instance scale);
    unsaturated blocks get SAT_NONE. Block order inside a tile is
    row-major (by, bx) — must match the kernel's ``sat_blocks`` masks."""
    bw = tile_w // SB
    bh = tile_h // SB
    idx = jnp.clip(sat_idx, 0, depth_sorted.shape[0] - 1)
    cut = jnp.where(sat_idx >= 0, jnp.take(depth_sorted, idx), SAT_NONE)
    img = cut.reshape(tiles_y, tiles_x, bh, bw)
    return img.transpose(0, 2, 1, 3).reshape(tiles_y * bh, tiles_x * bw)
