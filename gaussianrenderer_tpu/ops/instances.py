"""Packed-instance pipeline: tiered broadcast expansion → single-key sort.

Produces the (5, C) uint32 feature layout consumed by the v3 Pallas
compositor (``ops/pallas/tile_render2.py``). The design is driven by v5e
microbenchmarks (tools/micro_bench*.py, tools/profile_sub.py):

* every instance-scale gather is scalar-core bound (~70-136 ms for 6M rows
  at N=3M), and so is every scatter (~8 ns/element — 24 ms to scatter 3M
  values), so the frame loop may contain NEITHER;
* ``lax.sort`` with one 32-bit key + u32 payload rows is fast and is the
  only data-movement primitive used — and every payload row costs
  ~11-13 ms at the 12M-lane production shape (PERF_NOTES.md), which is
  why the features are quantized down to FIVE rows (v2 used 7):

    row 0: tile-local center, 13.3 fixed point (16 bits per axis)
    row 1: chol u | chol w     (e6m10 custom 16-bit floats)
    row 2: chol v | opacity    (s1e6m9 | u16)
    row 3: r | g | b           (10 bits each, 2 spare)
    row 4: tile-local AABB     (u8 × 4)

  The conic rides as its CHOLESKY factors, conic = LᵀL with
  L = [[u, v], [0, w]] (A = u², B = 2uv, C = v² + w²), NOT as rounded
  (A, B, C): independent rounding of A/B/C can push the decoded det
  A·C − B²/4 negative for anisotropic "needle" splats (condition
  κ > ~2^10), making md² indefinite — alpha then EXPLODES to opaque
  streaks along the degenerate axis. Every (u, v, w) bit pattern decodes
  to a PSD conic by construction, and the ε·κ first-order error of
  direct rounding becomes ~4ε²κ: measured over a needle sweep
  (tests/test_packed_pipeline.py), worst-case alpha error 2.7e-3 vs
  0.128 for rounded A/B/C; for the ≤64:1 ellipses real scenes produce
  it stays ≤~2^-9, below the 1e-3 blend threshold and the ≥40 dB PSNR
  gate (tests pin >60 dB). The quantized-conic/10-bit-color deviation
  from the reference's f32 path is a recorded exception to the
  bit-compat rule (CLAUDE.md), alongside the quantized centers and
  16-bit opacity.

So instead of the reference's count → prefix-sum → scatter expansion
(``render.cu:767-857``), every Gaussian is given a FIXED number of
instance lanes by broadcasting — no data-dependent placement at all.
An area ladder ((m, k), …) assigns the k members of each class m lanes
each via exact per-class windows over one descending order; ladders come
from ``render.calibrate_tiers`` (cost-model driven) or
:func:`default_tiers`. In windowed mode the class metric is the
EFFECTIVE lane count: for rects with area ≤ ENUM_AREA an N-scale scan
(:func:`_live_scan`) runs the exact dead-tile test at every rect
position, classes key on the LIVE-tile count, and emission maps lane j
to the (j+1)-th live tile via an 8-bit mask riding aabb_x's spare
nibbles (:func:`_emit_tier_mask_slabs`) — the dead corner tiles of
anisotropic splats (13-15% of all lanes on the bench scenes) never
reach the frame sort. Two emission modes (chosen by the ladder shape,
see build_packed_instances):

  BASE mode (ladder[0] = (m₀, 0)): all N Gaussians get m₀ broadcast
             lanes; only wider tiers are windowed (selection gather).
             Robust without calibration. Class membership keys on eff
             here too (both modes share the eff histogram the
             calibrator sizes ladders from).
  FULLY-WINDOWED mode (every k > 0): every tier windowed; the payload
             rides the area sort itself (no gather), and total lanes ≈
             the true instance count — which keeps the frame sort under
             its measured ~8M-lane cost knee on 3M-splat scenes.
  COMPACTED mode (ladder[0] = (0, C)): fully-windowed, PLUS each tier's
             member-major window is placed at a dynamic offset equal to
             the cumulative VALID member-lane count (dynamic_update_slice
             into a (C,) buffer), so the frame sort covers exactly
             C ≈ Σ m_c·count_c — the per-pose emission — instead of the
             static per-class-maximum envelope Σ m_c·k_c. Class windows
             k_c then only bound MEMBERSHIP (emission compute, ~1.5
             ns/lane), not sort lanes (~7 ns/lane), so the calibrator
             gives them 2× headroom and class-population drift across
             poses stops causing overflow; only the TOTAL emission
             breaching C truncates (flagged, never silent).

Lanes beyond a Gaussian's actual rect (and all lanes of culled Gaussians)
get the all-ones sentinel key and sort to the end. Wide-tier membership
comes from ONE descending-area ``lax.sort`` (measured: ``lax.top_k`` is
much slower than sort-then-slice on v5e — see PERF_NOTES.md); each tier
then emits from an EXACT dynamic-slice window over its class's contiguous
segment of that order, so a tier's lane cost is exactly m·k. The K
selected rows are gathered once as a single (7, N) stacked matrix — K is
small, so that gather is cheap. Coverage beyond the widest tier is
truncated and reported via the overflow flag; the reference sizes its
buffer dynamically from a mid-frame device→host readback instead
(``render.cu:962-971``), which static TPU shapes forbid.

The (tile, depth) sort key is ONE u32 — tile-major, quantized depth minor
(the reference's 64-bit ``(tile << 32) | uint32(-Z·1e6)`` key,
``render.cu:850``, reshaped for 32-bit lanes), and the 5 feature rows ride
the sort as payloads.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.projection import ALPHA_EPS, ProjectedGaussians

#: ALPHA_EPS (re-exported from ops/projection): splats with opacity below
#: it can never pass the blend test (alpha = op·exp(−½md²) ≤ op), so they
#: emit no instances; projection uses the same value for its coverage bound.

#: Fixed-point encodings (must match ops/pallas/tile_render2.py).
#: 13.3 fixed point: tile-local centers in [−4096, +4095.875] at 1/8-px
#: precision — exact for the default integer-quantized centers
#: (render.cu:753-754) and covering 4K framebuffers. Saturation beyond the
#: range is detected at emission and reported via ``center_clipped``.
CENTER_OFFSET = 4096.0
CENTER_SCALE = 8.0
COLOR_SCALE = 65535.0
RGB_SCALE = 1023.0

#: Screen-fixed 13.3 center carrier (emission-internal, never seen by the
#: kernel): q = round(c_px·8) + CQ_BIAS as u16 — covers centers in
#: [−2048, +6143.875] px (off-screen margins around ≤4K outputs).
#: Saturation is folded into the ``center_clipped`` flag.
CQ_BIAS = 16384
#: Tile-local rebias: row0 = q + REL_ADJ − 8·tile_origin (see _emit_tier).
REL_ADJ = int(CENTER_OFFSET * CENTER_SCALE) - CQ_BIAS  # 16384

#: Conic 16-bit float window: f32 exponents [80, 143] → values in
#: [2^-47, ~2^17). u/w are e6m10 (rel err ≤ 2^-11), v is s1e6m9 (2^-10);
#: the Cholesky factors have HALF the conic's exponent range, so the
#: window holds them with wide margins (u = √A ∈ [2^-24, 2^9]).
CONIC_EXP_BIAS = 80

#: Invalid-lane key. A NumPy scalar on purpose: a module-level ``jnp``
#: array is a concrete device array that jitted code CLOSES OVER — jax 0.9
#: hoists such captured constants into an extra executable parameter that
#: the C++ jit fast path then fails to supply on re-dispatch
#: ("Execution supplied N buffers but compiled program expected N+1") —
#: the root cause of the render_frame arity workaround. NumPy scalars are
#: embedded as HLO literals instead.
import numpy as _np

SENTINEL = _np.uint32(0xFFFFFFFF)


class PackedInstances(NamedTuple):
    packed_feats: jnp.ndarray  # (5, C) uint32 — kernel feature rows
    tile_start: jnp.ndarray  # (T,) int32
    tile_count: jnp.ndarray  # (T,) int32
    total_instances: jnp.ndarray  # () int32 — instances actually emitted
    overflow: jnp.ndarray  # () bool — some coverage was truncated
    #: () bool — a center exceeded a fixed-point range (screen-fixed u16
    #: carrier or the ±4096 px tile-local 13.3 encode) and was clamped;
    #: the affected splat's alpha is wrong in the saturating tiles.
    #: Never silent, per the project truncation rule.
    center_clipped: jnp.ndarray = None
    #: (len(AREA_BUCKETS)+1,) int32 — valid-Gaussian EFFECTIVE-lane
    #: histogram over the ~1.5×-step AREA_BUCKETS edges (buckets ≤
    #: ENUM_AREA count live tiles, wider buckets rect areas — see
    #: _nscale_prepack); drives tier calibration.
    area_hist: jnp.ndarray = None
    #: (C,) f32 camera-space depth per sorted lane (want_depth only) —
    #: decoded from the frame-sort key's quantized-depth bits, feeds the
    #: packed kernel's expected-depth output row.
    depth_f32: Optional[jnp.ndarray] = None


def _color_bits(c: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(c * COLOR_SCALE)
    return jnp.clip(q, 0, 65535).astype(jnp.uint32)


def packed_valid_np(valid, opacity):
    """The packed emitter's validity rule on HOST arrays: projection-valid
    AND 16-bit-quantized opacity ≥ ALPHA_EPS — the exact population
    :func:`build_packed_instances` emits (its ``valid`` at line ~537).
    The one definition shared by every CPU calibration probe
    (render.area_histogram, parallel.strip_row_loads,
    tools/strip_slack_probe.py), so a threshold or quantization change
    cannot silently desync probe populations from the render path."""
    import numpy as np

    op_q = np.round(np.asarray(opacity) * COLOR_SCALE) / COLOR_SCALE
    return np.asarray(valid) & (op_q >= ALPHA_EPS)


def _f32_bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)


def _enc_e6m10(x: jnp.ndarray) -> jnp.ndarray:
    """Non-negative f32 → 16-bit e6m10 float (round-to-nearest mantissa).

    The +0x1000 rounds the dropped 13 mantissa bits; a carry into the
    exponent field is IEEE-correct by construction. Out-of-window values
    clamp (≤2^-47 → 0 ≈ 2^-47 on decode; ≥2^17 → max ≈ 1.31e5)."""
    bits = _f32_bits(x)
    u = ((bits + 0x1000) >> 13).astype(jnp.int32) - (CONIC_EXP_BIAS << 10)
    return jnp.clip(u, 0, 65535).astype(jnp.uint32)


def _dec_e6m10(e: jnp.ndarray) -> jnp.ndarray:
    bits = (e.astype(jnp.uint32) + (CONIC_EXP_BIAS << 10)) << 13
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _enc_s1e6m9(x: jnp.ndarray) -> jnp.ndarray:
    """Signed f32 → 16-bit s1e6m9 float (sign in bit 15)."""
    bits = _f32_bits(x)
    mag = bits & 0x7FFFFFFF
    u = ((mag + 0x2000) >> 14).astype(jnp.int32) - (CONIC_EXP_BIAS << 9)
    mag9 = jnp.clip(u, 0, 0x7FFF).astype(jnp.uint32)
    return mag9 | ((bits >> 31) << 15)


def _dec_s1e6m9(e: jnp.ndarray) -> jnp.ndarray:
    bits = (((e & 0x7FFF) + (CONIC_EXP_BIAS << 9)) << 14) | ((e >> 15) << 31)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _conic_chol(a, b, c):
    """Conic (A, B, C) → upper Cholesky factors (u, v, w):
    [[A, B/2], [B/2, C]] = LᵀL, L = [[u, v], [0, w]], i.e. u = √A,
    v = B/(2u), w = √(C − v²). Safe on masked/degenerate lanes: u = 0
    forces v = 0; C − v² clamps at 0 (f32 rounding can push B²/4
    marginally above A·C on near-degenerate splats)."""
    u = jnp.sqrt(jnp.maximum(a, 0.0))
    v = jnp.where(u > 0.0, b / jnp.maximum(2.0 * u, 1e-30), 0.0)
    w = jnp.sqrt(jnp.maximum(c - v * v, 0.0))
    return u, v, w


def _chol_conic(u, v, w):
    """Cholesky factors → conic (A, B, C) = (u², 2uv, v² + w²). PSD for
    every input, so the decoded md² is never indefinite. Must match the
    kernel's decode (ops/pallas/tile_render2.py)."""
    return u * u, 2.0 * u * v, v * v + w * w


def _center_q(c_px: jnp.ndarray) -> jnp.ndarray:
    """Screen pixel coordinate → screen-fixed 13.3 carrier (int32 in
    [0, 65535]); exact for the default integer-quantized centers."""
    q = jnp.round(c_px * CENTER_SCALE).astype(jnp.int32) + CQ_BIAS
    return jnp.clip(q, 0, 65535)


#: rgb-row flag bit: this splat's row-0 center uses the COARSE encode
#: (1-px precision, ±32768 px tile-local) instead of 13.3 fixed point.
#: Real trained scenes carry giant background splats whose centers sit
#: thousands of px off-screen (observed ±14k px on data/trained_100k.ply)
#: — far outside the fine carrier's [−2048, +6144) window. Clamping them
#: (the old behavior, flagged center_clipped) rendered their whole
#: footprint with a wrong alpha field — and clamped DIFFERENTLY per
#: multi-chip strip, which is how tools/multichip_scale_probe.py caught
#: it. At 1-px precision the md² error for a splat that can still pass
#: the α ≥ 1e-3 threshold at distance d is ≤ 2·(√A·d)·(√A·δ) with
#: √A·d ≤ 3.7 and σ = 1/√A ≥ d/3.7 ≥ 550 px ⇒ ≤ ~0.7% relative alpha —
#: invisible, vs. arbitrarily wrong before. The kernel selects the
#: decode per instance (one (1, K) select — not per pixel).
#: A NumPy scalar ON PURPOSE — module-level jnp arrays become captured
#: jit constants that jax 0.9 hoists into an extra executable parameter
#: ("Execution supplied N buffers but compiled program expected N+1" on
#: re-dispatch — the SENTINEL comment's bug class; a jnp COARSE_BIT
#: reproduced it in the 3r calibration probe).
COARSE_BIT = _np.uint32(1 << 30)
#: Coarse screen-fixed carrier: q = round(c_px) + CQ_BIAS (1-px units,
#: covers centers in [−16384, +49151] px); tile-local row0 encode is
#: q + 16384 − x0 (range ±32768 around the tile origin).
COARSE_ADJ = 32768 - CQ_BIAS  # = 16384 = REL_ADJ (shared constant)


def _center_fields(
    cx, cy, tmin_x, tmin_y, rect_w, rect_h, tile_w: int, tile_h: int
):
    """Per-splat center carrier selection: returns ``(cq, coarse,
    clip_flag)``. ``cq`` packs the screen-fixed carrier (13.3 fine, or
    1-px coarse when the fine window would clip anywhere over the
    splat's rect); ``clip_flag`` marks splats that exceed even the
    coarse window (still clamped + flagged — never silent)."""
    qxf = jnp.round(cx * CENTER_SCALE).astype(jnp.int32) + CQ_BIAS
    qyf = jnp.round(cy * CENTER_SCALE).astype(jnp.int32) + CQ_BIAS
    enc_max = CENTER_OFFSET - 1.0 / CENTER_SCALE
    tmax_x = (tmin_x + rect_w - 1).astype(jnp.float32) * tile_w
    tmax_y = (tmin_y + rect_h - 1).astype(jnp.float32) * tile_h
    t0x = tmin_x.astype(jnp.float32) * tile_w
    t0y = tmin_y.astype(jnp.float32) * tile_h
    fine_bad = (
        (qxf < 0) | (qxf > 65535) | (qyf < 0) | (qyf > 65535)
        | (cx - t0x > enc_max) | (cx - tmax_x < -CENTER_OFFSET)
        | (cy - t0y > enc_max) | (cy - tmax_y < -CENTER_OFFSET)
    )
    qxc = jnp.round(cx).astype(jnp.int32) + CQ_BIAS
    qyc = jnp.round(cy).astype(jnp.int32) + CQ_BIAS
    coarse_bad = (
        (qxc < 0) | (qxc > 65535) | (qyc < 0) | (qyc > 65535)
        | (cx - t0x > 32767.0) | (cx - tmax_x < -32768.0)
        | (cy - t0y > 32767.0) | (cy - tmax_y < -32768.0)
    )
    qx = jnp.where(fine_bad, qxc, qxf)
    qy = jnp.where(fine_bad, qyc, qyf)
    cq = (
        jnp.clip(qx, 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(qy, 0, 65535).astype(jnp.uint32)
    return cq, fine_bad, fine_bad & coarse_bad


def _cq_decode(qx, qy, coarse):
    """Carrier ints → f32 screen/strip pixel center, coarse-aware —
    the ONE decode every emission-side consumer (live scan, per-lane
    prune) must use so it sees exactly what the kernel sees."""
    scale = jnp.where(coarse, 1.0, 1.0 / CENTER_SCALE)
    cx = (qx - CQ_BIAS).astype(jnp.float32) * scale
    cy = (qy - CQ_BIAS).astype(jnp.float32) * scale
    return cx, cy


def _rgb10_bits(color: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) [0,1] colors → r10|g10<<10|b10<<20 (kernel row 3)."""

    def q(c):
        return jnp.clip(jnp.round(c * RGB_SCALE), 0, RGB_SCALE).astype(
            jnp.uint32
        )

    return q(color[:, 0]) | (q(color[:, 1]) << 10) | (q(color[:, 2]) << 20)


#: Area-histogram bucket edges reported in RenderStats.area_hist — used by
#: the session-level tier calibrator (render.make_renderer). Tier areas m
#: need not be powers of two (lane r of a tier enumerates the rect
#: linearly for ANY m), so the edges use ~1.5× steps: on small-splat
#: scenes most lanes sit in the 1-8 range where a pow2 ladder wastes up
#: to 33% (area-3 splats paying 4 lanes).
AREA_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192,
                256, 384, 512, 768, 1024)

#: Max rect area for live-tile enumeration: the per-splat live mask must
#: fit the 8 spare bits of the packed aabb_x row (see _live_scan).
ENUM_AREA = 8


def _enum_ok(tiles_x: int, tiles_y: int, tile_w: int, tile_h: int) -> bool:
    """Live-tile enumeration packs an 8-bit live mask into aabb_x's spare
    nibbles, which requires the X pixel-AABB halves to fit 12 bits
    (x coords ≤ 4095 — true for every ≤4K-wide output, same envelope as
    the 13.3 center encode; aabb_y keeps full 16-bit halves). Wider
    grids fall back to pure rect-area emission (the pre-enumeration
    behavior, still exact via the per-lane prune)."""
    del tiles_y, tile_h
    return tiles_x * tile_w <= 4095


def _sat_cut_lookup(table, tile_ids):
    """Batched per-position saturation-cutoff fetch: ``tile_ids`` is a
    list of (G,) int32 tile indices; returns a list of (G,) f32 cutoff
    thresholds (quantized-depth units) via ONE gather-free MXU table
    lookup over the concatenation (ops/pallas/lookup.py — an N-scale
    ``jnp.take`` would be scalar-core bound). ``table`` is the
    (num_tiles,) f32 table from ``ops.satcull.tile_cutoff_q``."""
    from gaussianrenderer_tpu.ops.pallas.lookup import table_lookup

    m = int(table.shape[0])
    q = 128
    r = max(-(-m // q), 1)
    r = -(-r // 8) * 8  # sublane-align the one-hot contraction dim
    flat = jnp.concatenate(tile_ids)
    cuts = table_lookup(table, flat, r=r, q=q)
    g = tile_ids[0].shape[0]
    return [cuts[i * g : (i + 1) * g] for i in range(len(tile_ids))]


def _live_scan(
    prune, cq, ax, ay, tmin_x, tmin_y, rect_w, area, scan_ok, coarse,
    *, tile_w: int, tile_h: int, tiles_x: int = 0, sat=None,
):
    """8-position live-tile scan for rects with area ≤ ENUM_AREA.

    Returns ``(mask8 (G,) u32, live (G,) int32)``: bit p of ``mask8`` is
    set iff rect position p's tile (row-major over the rect) is LIVE
    under the exact dead-tile test (:func:`_tile_dead`), and ``live`` is
    its popcount. This is what lets emission give a splat lanes for its
    LIVE tiles only — a diagonal needle whose 2×4 rect has 3 live tiles
    pays 3 sort lanes, not 8 — whereas the per-lane prune alone still
    paid a (SENTINEL) sort lane per dead tile. ``ax``/``ay`` are the
    PURE packed AABB rows (mask nibbles not yet inserted). The (dx, dy)
    rect walk is division-free: increment-and-wrap against rect_w.

    ``sat`` (optional ``(table_q, depth_qf)`` — see
    :func:`_sat_cut_lookup`): positions whose tile is saturation-culled
    for this splat's depth are DEAD here too, so they stop consuming
    lanes before the area sort (the per-position saturation cull — the
    c7 census puts tile-granular dead instances at ~56% of the
    composited stream, ~2.6× what the per-splat whole-rect cull
    reaches)."""
    qx = (cq >> 16).astype(jnp.int32)
    qy = (cq & 0xFFFF).astype(jnp.int32)
    cx_f, cy_f = _cq_decode(qx, qy, coarse)
    xmin_f = (ax >> 16).astype(jnp.float32)
    xmax_f = (ax & 0xFFFF).astype(jnp.float32)
    ymin_f = (ay >> 16).astype(jnp.float32)
    ymax_f = (ay & 0xFFFF).astype(jnp.float32)
    safe_w = jnp.maximum(rect_w, 1)
    dx = jnp.zeros_like(rect_w)
    dy = jnp.zeros_like(rect_w)
    txs, tys = [], []
    for p in range(ENUM_AREA):
        txs.append(tmin_x + dx)
        tys.append(tmin_y + dy)
        if p + 1 < ENUM_AREA:
            dx = dx + 1
            wrap = dx >= safe_w
            dx = jnp.where(wrap, 0, dx)
            dy = dy + wrap.astype(jnp.int32)
    cuts = None
    if sat is not None:
        cuts = _sat_cut_lookup(
            sat[0], [txs[p] + tys[p] * tiles_x for p in range(ENUM_AREA)]
        )
    mask = jnp.zeros(area.shape, jnp.uint32)
    cnt = jnp.zeros(area.shape, jnp.int32)
    for p in range(ENUM_AREA):
        dead = _tile_dead(
            prune, cx_f, cy_f,
            (txs[p] * tile_w).astype(jnp.float32),
            (tys[p] * tile_h).astype(jnp.float32),
            xmin_f, ymin_f, xmax_f, ymax_f, tile_w, tile_h,
        )
        if cuts is not None:
            dead = dead | (sat[1] > cuts[p])
        live = scan_ok & (p < area) & ~dead
        mask = mask | jnp.where(live, jnp.uint32(1 << p), jnp.uint32(0))
        cnt = cnt + live.astype(jnp.int32)
    return mask, cnt


def default_tiers(n: int, boost: int = 0) -> Tuple[Tuple[int, int], ...]:
    """((m, k), ...) area ladder: every Gaussian gets m₀ lanes (the k = 0
    of the first tier marks the all-N broadcast base — see the emission
    modes in :func:`build_packed_instances`); the k widest (by tile area)
    get the wider tiers. Lane r enumerates the rect linearly so a tier
    covers any rect with area ≤ its m.

    Scaled with N so small scenes don't pay fixed tier costs. ``boost``
    (0-3) quadruples the K's per step — the session-level response to an
    overflow flag (the static-shape analog of the reference's mid-frame
    buffer resize, ``render.cu:962-971``): re-jit with a bigger bucket,
    keep rendering. ``make_renderer(auto_tier=True)`` replaces this whole
    ladder with one calibrated from the scene's area histogram.
    """
    scale = 4 ** min(boost, 3)
    return (
        (4, 0),
        (16, min(n, max(64, n // 8) * scale)),
        (128, min(n, max(32, n // 128) * scale)),
        (1024, min(n, max(16, n // 2048) * scale)),
    )


#: Disabled-prune sentinel for the kill threshold (profiling knob).
_PRUNE_OFF = _np.float32(3.0e38)


def _prune_params(conic_a, conic_b, conic_c, opacity):
    """Per-Gaussian constants for the EXACT per-lane tile prune
    (see _emit_tier): ``(a, b, c, pbc, pba, gain_m)``, all (G,) f32.

    A tile can be dropped iff min md² over (tile ∩ pixel AABB) exceeds
    gain = 2·ln(op/ALPHA_EPS) — then every pixel fails the α ≥ ALPHA_EPS
    blend test (render.cu:334) and the instance contributes exactly
    nothing. ``pbc = b/(2c)``, ``pba = b/(2a)`` are the per-edge
    conditional-minimizer slopes, hoisted to N scale so the per-lane test
    pays no divisions. ``gain_m`` carries a 5% + 0.05 conservative margin:
    callers pass the QUANTIZED conic/opacity (what the packed kernel
    rebuilds), and the margin keeps the kill decision safe for the
    full-f32 xla/diff/oracle paths too (conic quantization ≤ ~2⁻⁹ rel,
    worst-case needles ~2e-3; opacity ≤ 7.6e-6)."""
    a = jnp.maximum(conic_a, 0.0).astype(jnp.float32)
    c = jnp.maximum(conic_c, 0.0).astype(jnp.float32)
    b = conic_b.astype(jnp.float32)
    pbc = b / jnp.maximum(2.0 * c, 1e-30)
    pba = b / jnp.maximum(2.0 * a, 1e-30)
    gain = jnp.float32(-2.0 * jnp.log(ALPHA_EPS)) + 2.0 * jnp.log(
        jnp.maximum(opacity, 1e-12)
    )
    gain_m = jnp.maximum(gain, 0.0) * 1.05 + 0.05
    gain_m = jnp.where(jnp.isfinite(gain_m), gain_m, _PRUNE_OFF)
    return (a, b, c, pbc, pba, gain_m.astype(jnp.float32))


def _tile_dead(prune, cx, cy, x0, y0, xmin, ymin, xmax, ymax, tile_w, tile_h):
    """EXACT dead-tile test: min md² over the continuous rect
    (tile ∩ pixel AABB) > gain ⇒ no pixel in this tile can pass the
    α ≥ ALPHA_EPS blend test. For a convex quadratic with its minimum at
    the center, the rect minimum lies on a face VISIBLE from the center
    (the segment center→p crosses a visible face at no greater md²), so
    two clamped edge evaluations are exact — not a bound. Replaces the
    round-2 isotropic λ_min·d² radius test, which it strictly subsumes
    (measured on the r3 CPU probe: the isotropic test left 7.8% (c4) to
    16.6% (c6) of composited instances entirely dead — diagonal needles
    whose circumscribed circle touches the tile while the ellipse misses).
    All args lane-shaped or broadcastable; ~25 VPU ops per lane."""
    a, b, c, pbc, pba, gain_m = prune
    lx = jnp.maximum(x0, xmin) - cx
    hx = jnp.minimum(x0 + (tile_w - 1), xmax) - cx
    ly = jnp.maximum(y0, ymin) - cy
    hy = jnp.minimum(y0 + (tile_h - 1), ymax) - cy
    # visible x-face (0 outside [lx, hx]) and its exact edge minimum
    dxe = jnp.where(lx > 0.0, lx, hx)
    vx = (lx > 0.0) | (hx < 0.0)
    dy1 = jnp.clip(-pbc * dxe, ly, hy)
    mx = (a * dxe + b * dy1) * dxe + c * dy1 * dy1
    # visible y-face
    dye = jnp.where(ly > 0.0, ly, hy)
    vy = (ly > 0.0) | (hy < 0.0)
    dx1 = jnp.clip(-pba * dye, lx, hx)
    my = (a * dx1 + b * dye) * dx1 + c * dye * dye
    big = jnp.float32(_PRUNE_OFF)
    mn = jnp.minimum(
        jnp.where(vx, mx, big), jnp.where(vy, my, big)
    )
    mn = jnp.where(vx | vy, mn, 0.0)
    empty = (hx < lx) | (hy < ly)
    return empty | (mn > gain_m)


def _emit_tier(
    tmin_x: jnp.ndarray,  # (G,) int32
    tmin_y: jnp.ndarray,
    rect_w: jnp.ndarray,  # (G,) int32
    rect_h: jnp.ndarray,
    emit: jnp.ndarray,  # (G,) bool — this tier is responsible for the Gaussian
    depth_q: jnp.ndarray,  # (G,) uint32
    rows6: Tuple[jnp.ndarray, ...],  # 6× (G,) u32 pre-packed fields
    prune: Optional[Tuple[jnp.ndarray, ...]],  # _prune_params 6-tuple, (G,) each
    *,
    m: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    depth_bits: int,
    member_major: bool = False,
    live_mask: bool = False,
    aabb_bits: int = 0xFFFF,
    sat_table: "Optional[jnp.ndarray]" = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Broadcast one tier: each Gaussian × m tile lanes.

    Lane r maps to tile (tmin_x + r % w, tmin_y + r ÷ w) of the Gaussian's
    own rect — the reference's buildLwgs enumeration (``render.cu:841-855``)
    vectorized — so a tier covers ANY rect with area ≤ m. ``rows6`` =
    (center_q, A|C, B|op, rgb10, aabb_x, aabb_y): the first four are the
    final kernel rows 1-3 plus the screen-fixed center; the last two are
    the screen-pixel AABB halves the per-lane rows 0/4 are derived from.
    Returns (keys (m·G,), 5 feature rows (m·G,)) flattened, invalid lanes
    keyed SENTINEL. Pure elementwise/broadcast ops — no scatters.

    Layout: for small m the work runs as m SLABS of 1-D (G,) ops,
    concatenated — identical lane order to the (m, G) row-major flatten,
    but every op is full-lane-width. The (m, G) form with m < 8 wastes
    (8−m)/8 of every vector op to sublane padding AND pays a tiled→linear
    relayout on the flatten; the slab form measured ~2.5× cheaper on the
    base tier (tools/profile_emit.py). m ≥ 8 keeps the 2-D form (no
    padding waste, and m slabs would bloat the graph).

    ``member_major=True`` flattens in (member, lane) order instead —
    member g's m lanes contiguous, matching the reference's per-Gaussian
    emission order (``render.cu:841-855``). COMPACTED mode requires it:
    with head-aligned class windows the first count_c members' lanes form
    ONE contiguous run that a single dynamic_update_slice can place.
    Compute stays lane-major (G on the lane axis); only the final flatten
    pays one relayout per row.

    ``live_mask=True`` (windowed classes with m ≤ ENUM_AREA when the
    8-bit live mask rides aabb_x — see :func:`_live_scan`): lane j maps
    to the member's (j+1)-th LIVE tile instead of rect position j, so
    dead tiles consume no lanes at all. ``aabb_bits`` masks the AABB
    halves on decode (0xFFF when the mask nibbles are packed).
    """
    if live_mask:
        # Live-mask lanes were already saturation-culled (when enabled)
        # inside _live_scan — the mask bit simply never got set.
        assert m <= ENUM_AREA
        return _emit_tier_mask_slabs(
            tmin_x, tmin_y, rect_w, emit, depth_q, rows6,
            m=m, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
            depth_bits=depth_bits, member_major=member_major,
        )
    if m < 8:
        return _emit_tier_slabs(
            tmin_x, tmin_y, rect_w, rect_h, emit, depth_q, rows6, prune,
            m=m, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
            depth_bits=depth_bits, member_major=member_major,
            aabb_bits=aabb_bits, sat_table=sat_table,
        )
    cq, ac, bop, rgb, ax, ay = rows6
    abx = aabb_bits
    off = jnp.arange(m, dtype=jnp.int32)[:, None]  # (m, 1)
    safe_w = jnp.maximum(rect_w, 1)[None, :]
    dx = off % safe_w  # (m, G)
    dy = off // safe_w

    tx = tmin_x[None, :] + dx  # (m, G)
    ty = tmin_y[None, :] + dy
    lane_ok = emit[None, :] & (off < (rect_w * rect_h)[None, :])

    co = (rgb & COARSE_BIT) != 0  # (G,) coarse-center flag
    qx = (cq >> 16).astype(jnp.int32)  # (G,) screen-fixed carrier
    qy = (cq & 0xFFFF).astype(jnp.int32)

    # EXACT dead-tile prune (_tile_dead): an instance whose min md² over
    # (tile ∩ pixel AABB) exceeds 2·ln(op/1e-3) cannot pass the α ≥ 1e-3
    # blend test at any pixel — it contributes nothing in the reference
    # semantics either (render.cu:334), only the axis-aligned AABB emitted
    # it. Uses the 13.3-quantized center and quantized conic — exactly the
    # values the compositor kernel decodes.
    x0f = (tx * tile_w).astype(jnp.float32)
    y0f = (ty * tile_h).astype(jnp.float32)
    if prune is not None:
        cx_1, cy_1 = _cq_decode(qx, qy, co)
        cx_g = cx_1[None, :]
        cy_g = cy_1[None, :]
        prune_b = tuple(p[None, :] for p in prune)
        dead = _tile_dead(
            prune_b, cx_g, cy_g, x0f, y0f,
            ((ax >> 16) & abx).astype(jnp.float32)[None, :],
            (ay >> 16).astype(jnp.float32)[None, :],
            (ax & abx).astype(jnp.float32)[None, :],
            (ay & 0xFFFF).astype(jnp.float32)[None, :],
            tile_w, tile_h,
        )
        lane_ok &= ~dead
    tile_id = (tx + ty * tiles_x).astype(jnp.uint32)
    if sat_table is not None:
        # Per-position saturation cull (tile-granular cutoff table,
        # ops/satcull.py tile_cutoff_q): one flattened MXU lookup.
        cut = _sat_cut_lookup(
            sat_table, [(tx + ty * tiles_x).reshape(-1)]
        )[0].reshape(tx.shape)
        lane_ok &= ~(depth_q.astype(jnp.float32)[None, :] > cut)
    key = (tile_id << depth_bits) | depth_q[None, :]
    key = jnp.where(lane_ok, key, SENTINEL)

    # Tile-local recode of center and AABB (lane-dependent: tile origin).
    # Coarse lanes subtract the tile origin in 1-px units (REL_ADJ ==
    # COARSE_ADJ == 16384, so only the origin scale differs).
    x0i = tx * tile_w
    y0i = ty * tile_h
    x0s = jnp.where(co[None, :], x0i, x0i * int(CENTER_SCALE))
    y0s = jnp.where(co[None, :], y0i, y0i * int(CENTER_SCALE))
    relx = jnp.clip(qx[None, :] + REL_ADJ - x0s, 0, 65535)
    rely = jnp.clip(qy[None, :] + REL_ADJ - y0s, 0, 65535)
    row0 = (relx.astype(jnp.uint32) << 16) | rely.astype(jnp.uint32)

    xmin = jnp.clip(((ax >> 16) & abx).astype(jnp.int32)[None, :] - x0i, 0, 255)
    xmax = jnp.clip((ax & abx).astype(jnp.int32)[None, :] - x0i, 0, 255)
    ymin = jnp.clip((ay >> 16).astype(jnp.int32)[None, :] - y0i, 0, 255)
    ymax = jnp.clip((ay & 0xFFFF).astype(jnp.int32)[None, :] - y0i, 0, 255)
    row4 = (
        xmin.astype(jnp.uint32)
        | (ymin.astype(jnp.uint32) << 8)
        | (xmax.astype(jnp.uint32) << 16)
        | (ymax.astype(jnp.uint32) << 24)
    )

    if member_major:
        g = key.shape[1]

        def bc(row):  # (G,) → (G, m) broadcast, member-major flatten
            return jnp.broadcast_to(row[:, None], (g, m)).reshape(-1)

        rows5 = (
            row0.T.reshape(-1),
            bc(ac),
            bc(bop),
            bc(rgb),
            row4.T.reshape(-1),
        )
        return key.T.reshape(-1), rows5

    def bc(row):  # broadcast a (G,) u32 over the M sublane copies
        return jnp.broadcast_to(row[None, :], key.shape).reshape(-1)

    rows5 = (
        row0.reshape(-1),
        bc(ac),
        bc(bop),
        bc(rgb),
        row4.reshape(-1),
    )
    return key.reshape(-1), rows5


def _emit_tier_slabs(
    tmin_x, tmin_y, rect_w, rect_h, emit, depth_q, rows6, prune,
    *, m, tiles_x, tile_w, tile_h, depth_bits, member_major=False,
    aabb_bits=0xFFFF, sat_table=None,
):
    """Small-m tier emission as m full-lane-width 1-D slabs (see
    :func:`_emit_tier` — identical outputs and lane order)."""
    cq, ac, bop, rgb, ax, ay = rows6
    safe_w = jnp.maximum(rect_w, 1)
    rect_n = rect_w * rect_h
    co = (rgb & COARSE_BIT) != 0
    qx = (cq >> 16).astype(jnp.int32)
    qy = (cq & 0xFFFF).astype(jnp.int32)
    cx_f, cy_f = _cq_decode(qx, qy, co)
    xmin_g = ((ax >> 16) & aabb_bits).astype(jnp.int32)
    xmax_g = (ax & aabb_bits).astype(jnp.int32)
    ymin_g = (ay >> 16).astype(jnp.int32)
    ymax_g = (ay & 0xFFFF).astype(jnp.int32)
    xmin_f = xmin_g.astype(jnp.float32)
    xmax_f = xmax_g.astype(jnp.float32)
    ymin_f = ymin_g.astype(jnp.float32)
    ymax_f = ymax_g.astype(jnp.float32)

    cuts = None
    if sat_table is not None:
        tids = []
        for i in range(m):
            dx = jnp.remainder(jnp.int32(i), safe_w)
            dy = jnp.int32(i) // safe_w
            tids.append((tmin_x + dx) + (tmin_y + dy) * tiles_x)
        cuts = _sat_cut_lookup(sat_table, tids)
        depth_f = depth_q.astype(jnp.float32)
    keys, row0s, row4s = [], [], []
    for i in range(m):
        dx = jnp.remainder(jnp.int32(i), safe_w)  # (G,)
        dy = jnp.int32(i) // safe_w
        tx = tmin_x + dx
        ty = tmin_y + dy
        lane_ok = emit & (i < rect_n)
        if cuts is not None:
            lane_ok &= ~(depth_f > cuts[i])
        x0i = tx * tile_w
        y0i = ty * tile_h
        if prune is not None:
            dead = _tile_dead(
                prune, cx_f, cy_f,
                x0i.astype(jnp.float32), y0i.astype(jnp.float32),
                xmin_f, ymin_f, xmax_f, ymax_f, tile_w, tile_h,
            )
            lane_ok &= ~dead
        tile_id = (tx + ty * tiles_x).astype(jnp.uint32)
        key = (tile_id << depth_bits) | depth_q
        keys.append(jnp.where(lane_ok, key, SENTINEL))

        x0s = jnp.where(co, x0i, x0i * int(CENTER_SCALE))
        y0s = jnp.where(co, y0i, y0i * int(CENTER_SCALE))
        relx = jnp.clip(qx + REL_ADJ - x0s, 0, 65535)
        rely = jnp.clip(qy + REL_ADJ - y0s, 0, 65535)
        row0s.append(
            (relx.astype(jnp.uint32) << 16) | rely.astype(jnp.uint32)
        )
        xmin = jnp.clip(xmin_g - x0i, 0, 255).astype(jnp.uint32)
        xmax = jnp.clip(xmax_g - x0i, 0, 255).astype(jnp.uint32)
        ymin = jnp.clip(ymin_g - y0i, 0, 255).astype(jnp.uint32)
        ymax = jnp.clip(ymax_g - y0i, 0, 255).astype(jnp.uint32)
        row4s.append(xmin | (ymin << 8) | (xmax << 16) | (ymax << 24))

    if member_major:
        g = keys[0].shape[0]

        def mm(slabs):  # m×(G,) slabs → (G, m) stack, member-major flatten
            return jnp.stack(slabs, axis=1).reshape(-1)

        def bc(row):
            return jnp.broadcast_to(row[:, None], (g, m)).reshape(-1)

        rows5 = (mm(row0s), bc(ac), bc(bop), bc(rgb), mm(row4s))
        return mm(keys), rows5

    rows5 = (
        jnp.concatenate(row0s),
        jnp.tile(ac, m),
        jnp.tile(bop, m),
        jnp.tile(rgb, m),
        jnp.concatenate(row4s),
    )
    return jnp.concatenate(keys), rows5


def _emit_tier_mask_slabs(
    tmin_x, tmin_y, rect_w, emit, depth_q, rows6,
    *, m, tiles_x, tile_w, tile_h, depth_bits, member_major=False,
):
    """Live-tile-enumerated emission for small classes (m ≤ ENUM_AREA).

    Slab j maps to each member's (j+1)-th LIVE rect tile, read from the
    8-bit live mask :func:`_live_scan` packed into aabb_x's spare
    nibbles (bits 28-31 = mask[0:4], bits 12-15 = mask[4:8]) — dead
    tiles consume NO lanes (the positional path emitted them as SENTINEL
    keys that still rode the frame sort, ~13-15% of all lanes on the
    bench scenes, tools/live_lanes_probe.py). Rank extraction clears the
    lowest set bit per slab (ctz via popcount); (dx, dy) = divmod(p, w)
    uses 7 integer compares — exact for p ≤ 7, no division. No dead-tile
    test here: the mask already encodes it exactly."""
    cq, ac, bop, rgb, ax, ay = rows6
    co = (rgb & COARSE_BIT) != 0
    qx = (cq >> 16).astype(jnp.int32)
    qy = (cq & 0xFFFF).astype(jnp.int32)
    xmin_g = ((ax >> 16) & 0xFFF).astype(jnp.int32)
    xmax_g = (ax & 0xFFF).astype(jnp.int32)
    ymin_g = (ay >> 16).astype(jnp.int32)
    ymax_g = (ay & 0xFFFF).astype(jnp.int32)
    msk = ((ax >> 28) & jnp.uint32(0xF)) | (((ax >> 12) & jnp.uint32(0xF)) << 4)
    w = jnp.maximum(rect_w, 1)

    keys, row0s, row4s = [], [], []
    for _ in range(m):
        low = msk & (~msk + jnp.uint32(1))  # lowest set bit (0 if none)
        # ctz(low) = popcount(low − 1); msk == 0 → p = 32 → lane_ok False
        # masks the garbage position below (clips keep values in-range).
        p = jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)
        has = msk != 0
        msk = msk & (msk - jnp.uint32(1))
        dy = jnp.zeros_like(p)
        for t in range(1, ENUM_AREA):
            dy = dy + (p >= t * w).astype(jnp.int32)
        dx = p - dy * w
        tx = tmin_x + dx
        ty = tmin_y + dy
        lane_ok = emit & has
        x0i = tx * tile_w
        y0i = ty * tile_h
        tile_id = (tx + ty * tiles_x).astype(jnp.uint32)
        key = (tile_id << depth_bits) | depth_q
        keys.append(jnp.where(lane_ok, key, SENTINEL))

        x0s = jnp.where(co, x0i, x0i * int(CENTER_SCALE))
        y0s = jnp.where(co, y0i, y0i * int(CENTER_SCALE))
        relx = jnp.clip(qx + REL_ADJ - x0s, 0, 65535)
        rely = jnp.clip(qy + REL_ADJ - y0s, 0, 65535)
        row0s.append(
            (relx.astype(jnp.uint32) << 16) | rely.astype(jnp.uint32)
        )
        xmin = jnp.clip(xmin_g - x0i, 0, 255).astype(jnp.uint32)
        xmax = jnp.clip(xmax_g - x0i, 0, 255).astype(jnp.uint32)
        ymin = jnp.clip(ymin_g - y0i, 0, 255).astype(jnp.uint32)
        ymax = jnp.clip(ymax_g - y0i, 0, 255).astype(jnp.uint32)
        row4s.append(xmin | (ymin << 8) | (xmax << 16) | (ymax << 24))

    if member_major:
        g = keys[0].shape[0]

        def mm(slabs):
            return jnp.stack(slabs, axis=1).reshape(-1)

        def bc(row):
            return jnp.broadcast_to(row[:, None], (g, m)).reshape(-1)

        rows5 = (mm(row0s), bc(ac), bc(bop), bc(rgb), mm(row4s))
        return mm(keys), rows5

    rows5 = (
        jnp.concatenate(row0s),
        jnp.tile(ac, m),
        jnp.tile(bop, m),
        jnp.tile(rgb, m),
        jnp.concatenate(row4s),
    )
    return jnp.concatenate(keys), rows5


#: u32 words per splat in the multi-chip exchange record (28 B/splat —
#: vs the 22-f32 (88 B) record of the legacy gather32 exchange).
EXCHANGE_ROWS = 7
#: NumPy scalars on purpose — see COARSE_BIT (captured-jnp-constant
#: arity bug class).
_VALID_BIT = _np.uint32(1 << 30)
_SAT_BIT = _np.uint32(1 << 31)


def encode_record_rows(proj: ProjectedGaussians) -> jnp.ndarray:
    """Projected splats → the quantized 28 B/splat multi-chip record.

    The multi-chip data plane (parallel/multichip.py) used to all_gather
    a 22-f32 (88 B) record per splat; this packs the SAME payload into
    the 7-u32 layout below, reusing the packed sort rows' encodings
    (module docstring — the error budget is already recorded there):

      row 0: screen-fixed center — 13.3 fixed point, or 1-px COARSE
             units when the 13.3 screen window would clip (giant
             off-screen-center splats; flagged in row 4 bit 31 — see
             COARSE_BIT for the error budget)
      row 1: chol u | chol w           (e6m10 — the PSD conic factors)
      row 2: chol v | opacity          (s1e6m9 | u16)
      row 3: r|g|b 10-bit  | valid<<30 | center-saturated<<31
      row 4: pixel AABB x (xmin u16 << 16 | xmax u16; xmin ≤ 4095 for
             every packed-compatible frame, so bit 31 carries the
             coarse-center transport flag)
      row 5: pixel AABB y              (ymin u16 << 16 | ymax u16)
      row 6: camera-space depth        (f32 bits — drives the frame-sort
             key, kept exact so multi-chip depth order == single-chip)

    Tile rects do NOT ride: :func:`decode_record_rows` re-derives them
    from the AABB with the same integer stride division as projection.py
    (bit-exact — the wide-tier path already relies on this). The
    center-saturated bit records a center outside the u16 carrier window
    BEFORE the encode clip (receivers cannot detect it post-clip); it
    feeds the ``center_clipped`` stat so saturation is never silent.

    Returns (7, N) uint32.
    """
    op16 = _color_bits(proj.opacity)
    ch_u, ch_v, ch_w = _conic_chol(
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    )
    ac = (_enc_e6m10(ch_u) << 16) | _enc_e6m10(ch_w)
    bop = (_enc_s1e6m9(ch_v) << 16) | op16
    qx_raw = jnp.round(proj.center_px[:, 0] * CENTER_SCALE).astype(
        jnp.int32
    ) + CQ_BIAS
    qy_raw = jnp.round(proj.center_px[:, 1] * CENTER_SCALE).astype(
        jnp.int32
    ) + CQ_BIAS
    # Centers the 13.3 screen window can't hold ride in COARSE 1-px
    # units (lossless for the packed pipeline, which re-rounds coarse
    # centers to 1 px anyway); only coarse-window overflow saturates.
    wire_coarse = (
        (qx_raw < 0) | (qx_raw > 65535) | (qy_raw < 0) | (qy_raw > 65535)
    )
    qxc = jnp.round(proj.center_px[:, 0]).astype(jnp.int32) + CQ_BIAS
    qyc = jnp.round(proj.center_px[:, 1]).astype(jnp.int32) + CQ_BIAS
    sat = wire_coarse & (
        (qxc < 0) | (qxc > 65535) | (qyc < 0) | (qyc > 65535)
    )
    qx = jnp.where(wire_coarse, qxc, qx_raw)
    qy = jnp.where(wire_coarse, qyc, qy_raw)
    cq = (
        jnp.clip(qx, 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(qy, 0, 65535).astype(jnp.uint32)
    rgbf = (
        _rgb10_bits(proj.color)
        | jnp.where(proj.valid, _VALID_BIT, jnp.uint32(0))
        | jnp.where(sat, _SAT_BIT, jnp.uint32(0))
    )
    ax4 = proj.aabb_px
    ax = (
        (
            jnp.clip(ax4[:, 0], 0, 32767).astype(jnp.uint32) << 16
        )
        | jnp.clip(ax4[:, 2], 0, 65535).astype(jnp.uint32)
        # bit 31 = coarse-center transport flag (xmin ≤ 32767 keeps it
        # clear otherwise).
        | jnp.where(wire_coarse, jnp.uint32(1 << 31), jnp.uint32(0))
    )
    ay = (
        jnp.clip(ax4[:, 1], 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(ax4[:, 3], 0, 65535).astype(jnp.uint32)
    dep = jax.lax.bitcast_convert_type(
        proj.depth.astype(jnp.float32), jnp.uint32
    )
    return jnp.stack([cq, ac, bop, rgbf, ax, ay, dep], axis=0)


def decode_record_rows(
    rows: jnp.ndarray,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
) -> Tuple[ProjectedGaussians, jnp.ndarray]:
    """Quantized exchange record → decoded :class:`ProjectedGaussians`
    (global screen coordinates) + the per-splat center-saturated flag.

    Every field decodes to exactly the value the packed pipeline's own
    quantizers would reproduce, so feeding the result back through
    :func:`build_packed_instances` re-encodes idempotently — centers,
    opacity, colors, AABB and depth are bit-identical to a single-chip
    render of the same splats. The one exception is the conic: the
    decoded (A, B, C) = (u², 2uv, v² + w²) re-derives Cholesky factors
    whose ``w`` can differ from the original by ~1 ulp of the f32
    ``v² + w²`` sum (relative error ≤ 2⁻²⁴ on the C coefficient — far
    inside the 2⁻⁹ budget the e6m10 conic encode already carries).

    Tile rects are re-derived from the AABB with projection.py's exact
    integer stride division (``render.cu:761-764``).
    """
    cq, ac, bop, rgbf, ax, ay, dep = (rows[i] for i in range(EXCHANGE_ROWS))
    valid = (rgbf & _VALID_BIT) != 0
    sat = (rgbf & _SAT_BIT) != 0
    inv = jnp.float32(1.0 / RGB_SCALE)
    color = jnp.stack(
        [
            (rgbf & jnp.uint32(1023)).astype(jnp.float32) * inv,
            ((rgbf >> 10) & jnp.uint32(1023)).astype(jnp.float32) * inv,
            ((rgbf >> 20) & jnp.uint32(1023)).astype(jnp.float32) * inv,
        ],
        axis=-1,
    )
    opacity = (bop & jnp.uint32(0xFFFF)).astype(jnp.float32) * jnp.float32(
        1.0 / COLOR_SCALE
    )
    conic = jnp.stack(
        _chol_conic(
            _dec_e6m10(ac >> 16),
            _dec_s1e6m9(bop >> 16),
            _dec_e6m10(ac & jnp.uint32(0xFFFF)),
        ),
        axis=-1,
    )
    wire_coarse = (ax >> 31) != 0
    cs = jnp.where(wire_coarse, 1.0, 1.0 / CENTER_SCALE).astype(
        jnp.float32
    )
    center_px = jnp.stack(
        [
            ((cq >> 16).astype(jnp.int32) - CQ_BIAS).astype(jnp.float32) * cs,
            ((cq & jnp.uint32(0xFFFF)).astype(jnp.int32) - CQ_BIAS).astype(
                jnp.float32
            )
            * cs,
        ],
        axis=-1,
    )
    xmin = ((ax >> 16) & jnp.uint32(0x7FFF)).astype(jnp.int32)
    xmax = (ax & jnp.uint32(0xFFFF)).astype(jnp.int32)
    ymin = (ay >> 16).astype(jnp.int32)
    ymax = (ay & jnp.uint32(0xFFFF)).astype(jnp.int32)
    aabb_px = jnp.stack(
        [xmin, ymin, xmax, ymax], axis=-1
    ).astype(jnp.float32)
    tile_min = jnp.stack(
        [
            jnp.clip(xmin // tile_w, 0, tiles_x - 1),
            jnp.clip(ymin // tile_h, 0, tiles_y - 1),
        ],
        axis=-1,
    )
    tile_max = jnp.stack(
        [
            jnp.clip(xmax // tile_w, 0, tiles_x - 1),
            jnp.clip(ymax // tile_h, 0, tiles_y - 1),
        ],
        axis=-1,
    )
    depth = jax.lax.bitcast_convert_type(dep, jnp.float32)
    proj = ProjectedGaussians(
        valid=valid,
        depth=depth,
        color=color,
        opacity=opacity,
        center_px=center_px,
        conic=conic,
        aabb_px=aabb_px,
        tile_min=tile_min,
        tile_max=tile_max,
    )
    return proj, sat


class _Prepack(NamedTuple):
    """N-scale pre-packing shared by the device path and the CPU probe."""

    valid: jnp.ndarray  # (N,) bool — emitter validity (quantized-op rule)
    area: jnp.ndarray  # (N,) int32 rect tile area, 0 for invalid
    eff: jnp.ndarray  # (N,) int32 EFFECTIVE lanes (live tiles ≤ ENUM_AREA)
    rows6: Tuple[jnp.ndarray, ...]  # packed field rows, mask nibbles in ax
    prune_all: Tuple[jnp.ndarray, ...]  # _prune_params 6-tuple
    tmin_x: jnp.ndarray
    tmin_y: jnp.ndarray
    rect_w: jnp.ndarray
    rect_h: jnp.ndarray
    #: (N,) bool — the center exceeded even the COARSE carrier and was
    #: clamped (alpha wrong in the saturating tiles); any() of this is
    #: RenderStats.center_clipped. Fine-window overflow no longer flags:
    #: it routes to the coarse encode instead (see _center_fields).
    clip_flag: jnp.ndarray = None


def _nscale_prepack(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    skip_prune: bool = False,
    sat=None,  # Optional (table_q, depth_qf) — per-position saturation cull
) -> _Prepack:
    """Per-Gaussian pre-packing + live-tile scan (N-scale, elementwise).

    Everything downstream (emission prune, kernel blend) reads the
    QUANTIZED values, so they are computed once here. The kernel rebuilds
    q0 = −2 ln(op) from the 16-bit opacity; conic and colors decode from
    the 16/10-bit fields (error budget: module docstring).

    The live-tile enumeration: for rects with area ≤ ENUM_AREA (the
    overwhelming majority of instances on real scenes), every rect
    position is scanned with the exact dead-tile test ONCE here — ``eff``
    is the number of LIVE tiles, and the 8-bit live mask rides aabb_x's
    spare nibbles so windowed emission can map lane j to the (j+1)-th
    live tile with no rescan (:func:`_emit_tier_mask_slabs`). Windowed
    classes key on ``eff``, not rect area, so the dead corner tiles of
    anisotropic splats stop costing frame-sort lanes entirely (~13-15%
    of all lanes on the bench scenes, tools/live_lanes_probe.py — the
    reference's buildLwgs emits every rect tile and filters per pixel in
    the hot loop instead, ``render.cu:841-855``). Splats whose EVERY
    rect tile is dead drop out of ``valid``: they cannot contribute a
    pixel anywhere.

    ONE implementation shared by :func:`build_packed_instances` and the
    CPU calibration probe (:func:`effective_hist` ←
    ``render.area_histogram``), so the probe's histogram cannot drift
    from the one the render path reports. ``skip_prune`` mirrors the
    ``_skip=("prune",)`` profiling knob: every rect tile counts as live
    (eff == area), recovering the pre-enumeration emission exactly."""
    op16 = _color_bits(proj.opacity)
    op_q = op16.astype(jnp.float32) * (1.0 / COLOR_SCALE)
    ch_u, ch_v, ch_w = _conic_chol(
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    )
    enc_u = _enc_e6m10(ch_u)
    enc_v = _enc_s1e6m9(ch_v)
    enc_w = _enc_e6m10(ch_w)
    ac = (enc_u << 16) | enc_w
    bop = (enc_v << 16) | op16
    rgb = _rgb10_bits(proj.color)
    ax4 = proj.aabb_px  # (N, 4) xmin, ymin, xmax, ymax in pixels
    aabb_x = (
        jnp.clip(ax4[:, 0], 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(ax4[:, 2], 0, 65535).astype(jnp.uint32)
    aabb_y = (
        jnp.clip(ax4[:, 1], 0, 65535).astype(jnp.uint32) << 16
    ) | jnp.clip(ax4[:, 3], 0, 65535).astype(jnp.uint32)

    tmin = proj.tile_min
    tmax = proj.tile_max
    tmin_x = tmin[:, 0].astype(jnp.int32)
    tmin_y = tmin[:, 1].astype(jnp.int32)
    rect_w = (tmax[:, 0] - tmin[:, 0] + 1).astype(jnp.int32)
    rect_h = (tmax[:, 1] - tmin[:, 1] + 1).astype(jnp.int32)
    # Center carrier: 13.3 fine, or the 1-px COARSE encode for centers
    # the fine window would clip (giant off-screen background splats —
    # see COARSE_BIT). The flag rides rgb bit 30 to the kernel.
    cq, coarse, clip_flag = _center_fields(
        proj.center_px[:, 0], proj.center_px[:, 1],
        tmin_x, tmin_y, rect_w, rect_h, tile_w, tile_h,
    )
    rgb = rgb | jnp.where(coarse, COARSE_BIT, jnp.uint32(0))
    # Opacity below the blend threshold can never contribute (alpha ≤ op).
    # Uses the QUANTIZED opacity — the value the kernel's threshold sees.
    valid = proj.valid & (op_q >= ALPHA_EPS)
    area = jnp.where(valid, rect_w * rect_h, 0).astype(jnp.int32)
    clip_flag = valid & clip_flag

    # Exact-prune constants from the QUANTIZED conic and opacity — the
    # exact inputs the compositor kernel rebuilds, so prune and kernel
    # agree bit-for-bit (see _prune_params/_tile_dead).
    prune_all = _prune_params(
        *_chol_conic(
            _dec_e6m10(enc_u), _dec_s1e6m9(enc_v), _dec_e6m10(enc_w)
        ),
        op_q,
    )
    if skip_prune:
        # A +inf kill threshold disables the dead-tile test per lane AND
        # makes the live scan see every rect tile as live (eff == area).
        prune_all = prune_all[:5] + (
            jnp.full(area.shape, _PRUNE_OFF),
        )

    if _enum_ok(tiles_x, tiles_y, tile_w, tile_h):
        scan_ok = valid & (area <= ENUM_AREA)
        mask8, live_cnt = _live_scan(
            prune_all, cq, aabb_x, aabb_y, tmin_x, tmin_y,
            rect_w, area, scan_ok, coarse, tile_w=tile_w, tile_h=tile_h,
            tiles_x=tiles_x, sat=sat,
        )
        valid = valid & (~scan_ok | (live_cnt > 0))
        eff = jnp.where(scan_ok, live_cnt, area)
        eff = jnp.where(valid, eff, 0)
        aabb_x = aabb_x | ((mask8 & 0xF) << 28) | ((mask8 >> 4) << 12)
    else:
        eff = area

    rows6 = (cq, ac, bop, rgb, aabb_x, aabb_y)
    return _Prepack(
        valid, area, eff, rows6, prune_all, tmin_x, tmin_y, rect_w, rect_h,
        clip_flag,
    )


def _eff_hist(valid: jnp.ndarray, eff: jnp.ndarray) -> jnp.ndarray:
    """Effective-lane histogram over the AREA_BUCKETS edges — the tier
    calibrator's input. Buckets ≤ ENUM_AREA count LIVE tiles, wider
    buckets rect areas — exactly the quantity each class's lanes cost."""
    hist = []
    prev = 0
    for edge in AREA_BUCKETS:
        hist.append(
            jnp.sum((valid & (eff > prev) & (eff <= edge)).astype(jnp.int32))
        )
        prev = edge
    hist.append(jnp.sum((valid & (eff > prev)).astype(jnp.int32)))
    return jnp.stack(hist)


def effective_hist(
    proj: ProjectedGaussians,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
) -> jnp.ndarray:
    """The calibration histogram from projection outputs — the SAME code
    path (:func:`_nscale_prepack` + :func:`_eff_hist`) the device render
    reports in ``stats.area_hist``, exposed for the CPU probe
    (``render.area_histogram``). Equality is pinned by
    tests/test_packed_pipeline.py."""
    pk = _nscale_prepack(
        proj, tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tile_w, tile_h=tile_h
    )
    return _eff_hist(pk.valid, pk.eff)


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
    tiers: Optional[Tuple[Tuple[int, int], ...]] = None,
    skip_sort: bool = False,  # PROFILING ONLY: emission without sort/bounds
    want_depth: bool = False,  # decode per-lane depth from the sorted keys
    depth_bits: Optional[int] = None,  # override the derived key split
    _skip: Tuple[str, ...] = (),  # PROFILING ONLY: drop "hist"/"prune"/"wide"
    sat_cut_q: Optional[jnp.ndarray] = None,  # (num_tiles,) f32 per-tile
    # saturation cutoffs in depth-quantization units (satcull.tile_cutoff_q)
    # — enables the PER-POSITION saturation cull in the live scan and the
    # positional emitters: instances behind a fully-saturated tile stop
    # consuming sort lanes and compositor pairs.
) -> PackedInstances:
    del capacity
    num_tiles = tiles_x * tiles_y
    tile_bits = max(int(num_tiles).bit_length(), 1)
    if depth_bits is None:
        depth_bits = min(32 - tile_bits, 24)
    else:
        # Multi-chip strips pass the GLOBAL grid's depth_bits: a strip's
        # smaller local grid would otherwise quantize depth FINER than
        # the single-chip key, changing which nearby splats tie — and
        # alpha blending does not commute, so tie-group order changes
        # are visible wherever overdraw is heavy (caught at 100k-splat
        # scale by tools/multichip_scale_probe.py; toy scenes never
        # collided). The override is always ≤ the derived value, so the
        # local tile id still fits above it.
        assert tile_bits + depth_bits <= 32, (
            f"tile_bits {tile_bits} + depth_bits {depth_bits} > 32"
        )

    sat = None
    if sat_cut_q is not None:
        # Unmasked quantized depth (the same carrier the sort key uses;
        # invalid lanes are dead regardless, so masking can wait).
        span0 = jnp.maximum(jnp.float32(far) - jnp.float32(near), 1e-6)
        d01_raw = jnp.clip((proj.depth - near) / span0, 0.0, 1.0)
        sat = (
            sat_cut_q,
            (d01_raw * float((1 << depth_bits) - 1)).astype(jnp.uint32)
            .astype(jnp.float32),
        )
    pk = _nscale_prepack(
        proj, tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tile_w,
        tile_h=tile_h, skip_prune="prune" in _skip, sat=sat,
    )
    valid, area, eff, rows6 = pk.valid, pk.area, pk.eff, pk.rows6
    prune_all = pk.prune_all
    tmin_x, tmin_y = pk.tmin_x, pk.tmin_y
    rect_w, rect_h = pk.rect_w, pk.rect_h
    enum_ok = _enum_ok(tiles_x, tiles_y, tile_w, tile_h)
    abx = 0xFFF if enum_ok else 0xFFFF

    span = jnp.maximum(jnp.float32(far) - jnp.float32(near), 1e-6)
    depth01 = jnp.clip((proj.depth - near) / span, 0.0, 1.0)
    dmax = float((1 << depth_bits) - 1)
    depth_q = jnp.where(valid, (depth01 * dmax), 0.0).astype(jnp.uint32)

    n = area.shape[0]
    if tiers is None:
        tiers = default_tiers(n, tier_boost)
    # A (0, C) head entry is the COMPACTED-mode lane capacity (module
    # docstring) — NOT a class window, so it is split off before the
    # min(k, n) clamp (C routinely exceeds N: lanes count instances).
    capacity = None
    if tiers and int(tiers[0][0]) == 0:
        capacity = int(tiers[0][1])
        tiers = tuple(tiers)[1:]
    ladder = [(int(m), min(int(k), n)) for m, k in tiers]
    assert ladder, "tier ladder needs at least one class tier"
    assert all(
        ladder[i][0] < ladder[i + 1][0] for i in range(len(ladder) - 1)
    ), "tier areas must be strictly increasing"
    assert capacity is None or ladder[0][1] > 0, (
        "compacted mode (capacity head entry) requires a fully-windowed "
        "ladder (every tier k > 0)"
    )
    assert capacity is None or "wide" not in _skip, (
        "the 'wide' profiling knob cannot combine with compacted mode"
    )

    def emit(tx, ty, w, h, ok, dq, rows, m, prune, mm=False, lm=False):
        return _emit_tier(
            tx, ty, w, h, ok, dq, rows, prune,
            m=m,
            tiles_x=tiles_x,
            tile_w=tile_w,
            tile_h=tile_h,
            depth_bits=depth_bits,
            member_major=mm,
            live_mask=lm,
            aabb_bits=abx,
            sat_table=sat_cut_q,
        )

    m0 = ladder[0][0]

    # Effective-lane histogram over the AREA_BUCKETS edges — feeds the
    # session calibrator AND (when the tier bounds are bucket edges, as
    # calibrated ladders are) the windowed per-class counts below,
    # replacing one N-scale masked reduction per tier with tiny hist
    # slices. Buckets ≤ ENUM_AREA count LIVE tiles (eff), wider buckets
    # rect areas — exactly the quantity each class's lanes cost.
    if "hist" in _skip:
        area_hist = jnp.zeros((len(AREA_BUCKETS) + 1,), jnp.int32)
    else:
        area_hist = _eff_hist(valid, eff)
    edge_index = {e: i for i, e in enumerate(AREA_BUCKETS)}

    def class_count(m_lo, m_hi):
        """Count of valid Gaussians with eff ∈ (m_lo, m_hi] — from hist
        slices when the bounds resolve to bucket edges (calibrated
        ladders always do; the hist is over the same eff metric class
        membership uses in BOTH emission modes), else an N-scale masked
        sum. m_lo = 0 means 'from the smallest class' (fully-windowed
        ladders); m_hi ≥ num_tiles counts as unbounded exactly
        (screen-clipped areas cannot exceed num_tiles)."""
        if (m_lo == 0 or m_lo in edge_index) and "hist" not in _skip:
            lo_i = 0 if m_lo == 0 else edge_index[m_lo] + 1
            if m_hi in edge_index:
                return jnp.sum(area_hist[lo_i : edge_index[m_hi] + 1])
            if m_hi >= num_tiles:
                return jnp.sum(area_hist[lo_i:])
        return jnp.sum(
            (valid & (eff > m_lo) & (eff <= m_hi)).astype(jnp.int32)
        )

    # ---- emission modes ----------------------------------------------------
    # BASE mode (ladder[0] = (m0, 0)): every Gaussian gets m0 broadcast
    # lanes (lane cost m0·N regardless of class population) and only the
    # wider tiers are windowed — robust without calibration, wasteful when
    # most splats have area < m0.
    # FULLY-WINDOWED mode (ladder[0] = (m0, k>0)): EVERY tier, including
    # the narrowest, emits from an exact window of the descending-area
    # order, so total lanes ≈ Σ m_c·k_c ≈ the true instance count — the
    # measured v5e sort-cost knee (~5.8 ns/lane below ~8M lanes, +15 ms
    # above — PERF_NOTES round 3) makes this the fast mode at 3M-splat
    # scenes. calibrate_tiers picks the mode by measured cost model.
    windowed = ladder[0][1] > 0
    keys = []
    rows_out = []
    if not windowed:
        # Base tier: every Gaussian × m0 lanes, membership eff ≤ m0 —
        # the SAME metric the histogram (and so the calibrator that
        # sized this ladder) uses. For m0 ≤ ENUM_AREA the live mask
        # enumerates (a rect bigger than m0 with ≤ m0 LIVE tiles is a
        # base-tier member); wider m0 falls back to positional
        # enumeration, which covers every member because eff ≤ m0 with
        # area > ENUM_AREA implies area = eff ≤ m0.
        k1, r1 = emit(
            tmin_x, tmin_y, rect_w, rect_h,
            valid & (eff <= m0), depth_q, rows6, m0, prune_all,
            lm=enum_ok and m0 <= ENUM_AREA,
        )
        keys.append(k1)
        rows_out.append(r1)

    # ---- windowed tiers ----------------------------------------------------
    # Descending area ⇒ the classes occupy CONTIGUOUS segments of the
    # sorted order (widest first). Each tier emits from an EXACT window:
    # a dynamic_slice of size k_c starting at its class's (data-dependent)
    # segment start — a contiguous slice, not a gather, so it is cheap and
    # the tier's lane cost is exactly m_c·k_c (the round-1 prefix-window
    # scheme paid m_c·(k_c + all wider classes) instead). A class bigger
    # than its k_c is truncated tail-first and flagged via overflow.
    if "wide" not in _skip:
        wide = ladder if windowed else ladder[1:]
    else:
        wide = []
    # BOTH emission modes key class membership on the EFFECTIVE lane
    # count (live tiles for small rects — see _nscale_prepack): the
    # histogram the calibrator sizes ladders from is eff-based, so any
    # other runtime metric would systematically under-size windows
    # (caught in review: an area-keyed base mode truncated every frame
    # on ladders the eff-hist calibrated).
    overflow = jnp.any(valid & (eff > ladder[-1][0]))
    if wide:
        if windowed:
            # The 6 payload rows RIDE the area sort directly (7 stable
            # operands @N) — no gather at all, and every window below
            # slices the full-length sorted arrays. The quantized depth is
            # FOLDED into the area key's low bits (area ≤ num_tiles ≤
            # 2^tile_bits − 1 occupies the top tile_bits): one payload row
            # saved (~2.5 ms @3M), and the FINAL frame order is unchanged —
            # within an area class the fold reorders members by depth, but
            # the frame sort re-sorts on (tile, depth) anyway, and members
            # tied there (equal depth_q) keep their relative order under
            # both schemes (stable sorts, equal fold keys).
            amax = jnp.uint32((1 << tile_bits) - 1)
            akey = (
                (amax - eff.astype(jnp.uint32)) << depth_bits
            ) | depth_q
            sorted_sel = jax.lax.sort(
                (akey, *rows6), num_keys=1, is_stable=True
            )
            k_sel = n
            s_depth = sorted_sel[0] & jnp.uint32((1 << depth_bits) - 1)
            s_rows = tuple(sorted_sel[1:])
            if capacity is not None:
                # COMPACTED mode: pad the sorted arrays by the widest
                # window so every class window is HEAD-ALIGNED
                # (start + k_c ≤ n + pad ⇒ no start clamp ⇒ the class's
                # first count_c members sit at window positions
                # [0, count_c) — the invariant the dynamic_update_slice
                # placement below relies on). Pad lanes are masked by the
                # gpos < start + count test (start + count ≤ n always).
                pad = max(k for _, k in wide)
                k_sel = n + pad
                zpad = jnp.zeros((pad,), jnp.uint32)
                s_depth = jnp.concatenate([s_depth, zpad])
                s_rows = tuple(
                    jnp.concatenate([r, zpad]) for r in s_rows
                )
            s_ax, s_ay = s_rows[4], s_rows[5]
            s_ac, s_bop = s_rows[1], s_rows[2]
        else:
            _, idx_sorted = jax.lax.sort(
                (-eff, jnp.arange(n, dtype=jnp.int32)),
                num_keys=1,
                is_stable=True,
            )
            k_sel = min(sum(k for _, k in wide), n)
            sel_idx = idx_sorted[:k_sel]

            # ONE (7, N) lane-axis gather instead of per-field 1-D
            # gathers: measured ~9× cheaper per row (~11 ns vs ~105
            # ns/row at k_sel=1M — tools/gather_bench.py). Only depth +
            # the 6 packed rows ride the gather.
            sel_mat = jnp.stack((depth_q, *rows6), axis=0)  # (7, N) u32
            s_all = sel_mat[:, sel_idx]  # (7, k_sel)
            s_depth = s_all[0]
            s_rows = tuple(s_all[1 + i] for i in range(len(rows6)))
            s_ax, s_ay = s_all[5], s_all[6]
            s_ac, s_bop = s_all[2], s_all[3]

        # Tile rects are re-derived from the packed pixel AABB (bit-exact:
        # same integer stride division as projection.py), and the prune
        # constants are recomputed from the quantized conic + 16-bit
        # opacity (the same inputs the compositor kernel uses).
        s_xmin = ((s_ax >> 16) & abx).astype(jnp.int32)
        s_xmax = (s_ax & abx).astype(jnp.int32)
        s_ymin = (s_ay >> 16).astype(jnp.int32)
        s_ymax = (s_ay & 0xFFFF).astype(jnp.int32)
        s_tmin_x = jnp.clip(s_xmin // tile_w, 0, tiles_x - 1)
        s_tmax_x = jnp.clip(s_xmax // tile_w, 0, tiles_x - 1)
        s_tmin_y = jnp.clip(s_ymin // tile_h, 0, tiles_y - 1)
        s_tmax_y = jnp.clip(s_ymax // tile_h, 0, tiles_y - 1)
        s_w = s_tmax_x - s_tmin_x + 1
        s_h = s_tmax_y - s_tmin_y + 1
        s_prune = _prune_params(
            *_chol_conic(
                _dec_e6m10(s_ac >> 16),
                _dec_s1e6m9(s_bop >> 16),
                _dec_e6m10(s_ac & 0xFFFF),
            ),
            # 16-bit opacity — the same value the compositor kernel uses.
            (s_bop & 0xFFFF).astype(jnp.float32) * (1.0 / COLOR_SCALE),
        )
        if "prune" in _skip:
            s_prune = s_prune[:5] + (jnp.full((k_sel,), _PRUNE_OFF),)

        # Post-sort effective lane count, re-derived exactly as the
        # N-scale pass computed it: live-mask popcount for small rects
        # (the mask rides s_ax's spare nibbles through the area sort),
        # rect area otherwise. Compacted zero-pad lanes decode to
        # s_area_w == 1 with an empty mask → s_eff == 0 → excluded by
        # every class mask.
        s_area_w = s_w * s_h
        if enum_ok:
            s_mask8 = ((s_ax >> 28) & jnp.uint32(0xF)) | (
                ((s_ax >> 12) & jnp.uint32(0xF)) << 4
            )
            s_eff = jnp.where(
                s_area_w <= ENUM_AREA,
                jax.lax.population_count(s_mask8).astype(jnp.int32),
                s_area_w,
            )
        else:
            s_eff = s_area_w

        # Class populations and segment starts (device scalars). Class c of
        # tier (m_hi, k_c) is eff ∈ (m_lo, m_hi]; its segment starts
        # after every wider class in the descending order — INCLUDING the
        # uncovered giants (eff > the widest tier), which occupy the
        # sorted prefix without belonging to any class (possible only with
        # non-calibrated ladders; the overflow flag above already fires).
        # In windowed mode the narrowest class reaches down to eff 1
        # (m_lo = 0).
        first_lo = 0 if windowed else m0
        lo_list = [m for m, _ in ([(first_lo, 0)] + list(wide[:-1]))]
        cls_count = [
            class_count(m_lo, m_hi)
            for (m_hi, _), m_lo in zip(wide, lo_list)
        ]
        cls_start = [None] * len(wide)
        if ladder[-1][0] >= num_tiles:
            acc = jnp.int32(0)  # widest tier covers every possible area
        else:
            acc = class_count(ladder[-1][0], 1 << 30)
        for c in range(len(wide) - 1, -1, -1):  # widest class sorts first
            cls_start[c] = acc
            acc = acc + cls_count[c]

        if capacity is not None:
            # COMPACTED placement buffers: each tier's member-major window
            # lands at the running VALID-lane offset, so consecutive tiers
            # overwrite only their predecessor's masked (SENTINEL) window
            # tail. The allocation keeps the widest single window in
            # bounds even with the offset clamped at capacity; lanes
            # beyond `capacity` are sliced off before the frame sort
            # (overflow-flagged below when that drops valid lanes).
            max_win = max(m_c * k_c for m_c, k_c in wide)
            c_alloc = capacity + max_win
            key_buf = jnp.full((c_alloc,), SENTINEL, jnp.uint32)
            row_bufs = [jnp.zeros((c_alloc,), jnp.uint32) for _ in range(5)]
            off = jnp.int32(0)

        for c, ((m_hi, k), m_lo) in enumerate(zip(wide, lo_list)):
            k_c = min(k, k_sel)
            start = cls_start[c]
            start_cl = jnp.clip(start, 0, k_sel - k_c)

            def dsl(a, start_cl=start_cl, k_c=k_c):
                return jax.lax.dynamic_slice_in_dim(a, start_cl, k_c)

            gpos = start_cl + jnp.arange(k_c, dtype=jnp.int32)
            # Position window + class-metric re-check (from the re-derived
            # rects/masks — free). In the no-overflow regime the window
            # alone IS the class (contiguous segments, counts over the
            # same data); the metric mask is defense-in-depth for the
            # overflow regime: when a WIDER class exceeds its k, its
            # surplus members occupy sorted positions this class's clamped
            # window can cover, and without the mask they would emit at
            # the wrong tier width (silently truncating their rects). With
            # it they are masked out; the starved class's own members
            # beyond k_sel stay dropped — but that frame already raises
            # `overflow`, and the session response (auto_tier
            # recalibration) resizes the ladder. Truncation is flagged,
            # never silent.
            s_cm = dsl(s_eff)
            mask = (
                (gpos >= start)
                & (gpos < start + cls_count[c])
                & (s_cm > m_lo)
                & (s_cm <= m_hi)
            )
            use_mask = enum_ok and m_hi <= ENUM_AREA
            kk, rr = emit(
                dsl(s_tmin_x), dsl(s_tmin_y), dsl(s_w), dsl(s_h),
                mask, dsl(s_depth),
                tuple(dsl(r) for r in s_rows), m_hi,
                tuple(dsl(p) for p in s_prune),
                mm=capacity is not None,
                lm=use_mask,
            )
            if capacity is not None:
                off_cl = jnp.minimum(off, jnp.int32(capacity))
                key_buf = jax.lax.dynamic_update_slice_in_dim(
                    key_buf, kk, off_cl, 0
                )
                row_bufs = [
                    jax.lax.dynamic_update_slice_in_dim(b, r, off_cl, 0)
                    for b, r in zip(row_bufs, rr)
                ]
                # Advance past the emitted members only (head-aligned
                # windows: the first min(count, k_c) members are the
                # class; everything after is SENTINEL-masked tail).
                off = off + m_hi * jnp.clip(cls_count[c], 0, k_c)
            else:
                keys.append(kk)
                rows_out.append(rr)
            # Truncated iff the class extends past the emitted window.
            overflow |= (start + cls_count[c]) > (start_cl + k_c)

    # Center-encoding saturation: splats the fine 13.3 window cannot
    # hold route to the COARSE 1-px encode (see COARSE_BIT); only a
    # center beyond even the coarse window (±32768 px tile-local /
    # [−16384, +49151] px screen) clamps — and flags. Never silent.
    center_clipped = jnp.any(pk.clip_flag)

    if capacity is not None and wide:
        # Compacted: only TOTAL emission breaching the capacity truncates.
        overflow |= off > capacity
        key = key_buf[:capacity]
        rows = [b[:capacity] for b in row_bufs]
    else:
        key = jnp.concatenate(keys)
        rows = [jnp.concatenate(rs) for rs in zip(*rows_out)]
    # Instances actually emitted (post tier masking AND live-tile pruning).
    emitted = jnp.sum((key != SENTINEL).astype(jnp.int32))

    if skip_sort:
        # Profiling knob (tools/profile_stages2.py): emission-order output,
        # attributing build time to emission vs sort. NOT a render path —
        # tile_start/count are zeros, the compositor would draw nothing.
        # ALL 5 rows are stacked (and the key stays live through `emitted`)
        # so no emission work is dead-code-eliminated from the measurement.
        z = jnp.zeros((num_tiles,), jnp.int32)
        return PackedInstances(
            packed_feats=jnp.stack(rows, 0),
            tile_start=z,
            tile_count=z,
            total_instances=emitted,
            overflow=overflow,
            center_clipped=center_clipped,
            area_hist=area_hist,
        )

    # ---- ONE single-key stable sort carrying the 5 packed rows -------------
    sorted_ops = jax.lax.sort((key, *rows), num_keys=1, is_stable=True)
    key_sorted = sorted_ops[0]
    packed = jnp.stack(sorted_ops[1:], axis=0)  # (5, C) u32

    depth_f32 = None
    if want_depth:
        # Quantized depth (the sort key's low bits) → camera-space depth.
        # 21+-bit quantization over [near, far]; SENTINEL lanes decode to
        # garbage but sort past every tile range, so the kernel never
        # weights them.
        depth_f32 = jnp.float32(near) + (
            key_sorted & jnp.uint32((1 << depth_bits) - 1)
        ).astype(jnp.float32) * (span / dmax)
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
        total_instances=emitted,
        overflow=overflow,
        center_clipped=center_clipped,
        area_hist=area_hist,
        depth_f32=depth_f32,
    )
