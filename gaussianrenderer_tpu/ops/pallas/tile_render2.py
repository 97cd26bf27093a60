"""Pallas TPU kernel v3: per-tile front-to-back compositing, packed features.

Third-generation re-design of the reference hot loop ``renderGaussians``
(``src/core/cuda/render.cu:266-367``), informed by v5e microbenchmarks
(tools/micro_bench*.py):

* Features arrive PACKED: 5 uint32 rows per instance (v2 used 7, v1 16
  f32) — every payload row of the frame sort costs ~11-13 ms at the
  12M-lane production shape, so the conic is carried as custom 16-bit
  floats and colors at 10 bits (error budget: ops/instances.py module
  docstring — worst-case alpha deviation ~7e-4, PSNR gates stay >60 dB).
  Layout (one row per field, instances on lanes; fixed-point decodes are
  2-3 integer VPU ops; the only transcendental is one (1, K) log per
  chunk):

    row 0: center, tile-local 13.3 fixed point with +4096 offset (covers
           whole-screen-relative centers at ≤4K output):
           u16((cx_rel+4096)·8) << 16 | u16((cy_rel+4096)·8)
    row 1: chol u (e6m10) << 16 | chol w (e6m10) — 16-bit floats with a
           6-bit exponent window (f32 exponents [80, 143]), rel err 2^-11
    row 2: chol v (s1e6m9) << 16 | u16(op·65535) — the kernel rebuilds
           the quadratic constant q0 = −2·ln(op) from the 16-bit opacity
           (quantization 1.5e-5 ≪ the 1e-3 alpha threshold)

  (u, v, w) are the conic's upper Cholesky factors (A = u², B = 2uv,
  C = v² + w² — see ops/instances.py:_conic_chol): every bit pattern
  decodes to a PSD conic, so the MXU quadratic's md² is never
  indefinite even for needle splats where independently-rounded
  (A, B, C) would put det < 0 and explode alpha.
    row 3: r10 | g10 << 10 | b10 << 20   (colors are clamped [0,1])
    row 4: aabb, tile-local u8: xmin | ymin<<8 | xmax<<16 | ymax<<24

* The Mahalanobis quadratic runs on the MXU: with tile-local pixel coords
  the per-pixel basis is (P, 8) = [x², y², xy, x, y, 1, 0, 0] and the
  per-instance coefficient matrix (8, K) is
  [A, C, B, −(2A·cx + B·cy), −(2C·cy + B·cx), q0 + A·cx² + B·cx·cy + C·cy²]
  so  q = basis @ coeffs  gives  md² − 2·ln(op)  in one (P,8)·(8,K) matmul.
  Tile-local coords keep every operand small enough for the f32(=bf16x3)
  MXU path to be exact to ~1e-6 relative.

* alpha = exp(−½·q) — computed with jnp.exp (VPU transcendental); the
  remaining per-pair VPU work is the masks, the lane-doubling prefix
  product for transmittance, and one (P,K)·(K,3) MXU matmul for the color
  accumulation.

* Early termination (``render.cu:328``) at chunk granularity via the
  while_loop condition; per-pixel gating inside a chunk preserves the
  reference's exact stop-below-1e-3 semantics.

Output: one (3, P) block per tile into a (3, T·P) buffer; the host-side
wrapper reassembles (3, H, W). This keeps every store lane-aligned for any
logical tile shape (default 32×32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_EPS = 1e-3
T_EPS = 1e-3
ALPHA_MAX = 0.99

PACK_ROWS = 5

#: The kernel's HBM window and VMEM chunk pad the row axis to 8: Mosaic
#: requires memref slices sublane-aligned to 8, so a (5, chunk) DMA is
#: illegal on hardware. Only the DMA carries the dead rows — the sort
#: payload stays 5 rows (that's where row count costs ~11 ms each).
DMA_ROWS = 8

#: Lane padding of the per-tile saturation-index output block (Mosaic
#: requires 128-divisible last block dims; only [0, sat_blocks) carry data).
SAT_PAD = 128


#: Fixed-point encodings (must match ops/instances.py): 13.3 fixed point,
#: tile-local centers in [−4096, +4095.875] — exact for integer-quantized
#: centers, covers 4K framebuffers (saturation flagged at emission).
CENTER_OFFSET = 4096.0
CENTER_SCALE = 8.0
COLOR_SCALE = 65535.0
RGB_SCALE = 1023.0
#: Conic 16-bit float window (must match ops/instances.py).
CONIC_EXP_BIAS = 80


def _u2f(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 → f32 via i32 (Mosaic has no direct u32→f32 cast; values ≤ 2^16)."""
    return bits.astype(jnp.int32).astype(jnp.float32)


def _center_decode(bits_u16: jnp.ndarray) -> jnp.ndarray:
    """13.3 fixed-point tile-local coordinate with +4096 offset → f32."""
    return _u2f(bits_u16) * (1.0 / CENTER_SCALE) - CENTER_OFFSET


def _color_decode(bits_u16: jnp.ndarray) -> jnp.ndarray:
    return _u2f(bits_u16) * (1.0 / COLOR_SCALE)


def _rgb10_decode(bits_u10: jnp.ndarray) -> jnp.ndarray:
    return _u2f(bits_u10) * (1.0 / RGB_SCALE)


def _dec_e6m10(e: jnp.ndarray) -> jnp.ndarray:
    """16-bit e6m10 float (ops/instances.py:_enc_e6m10) → f32: rebias the
    6-bit exponent back into the f32 exponent field. 3 integer VPU ops."""
    bits = (e + (CONIC_EXP_BIAS << 10)) << 13
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _dec_s1e6m9(e: jnp.ndarray) -> jnp.ndarray:
    """16-bit s1e6m9 float (sign in bit 15) → f32."""
    bits = (((e & 0x7FFF) + (CONIC_EXP_BIAS << 9)) << 14) | ((e >> 15) << 31)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _fast_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp(x) for x ≤ 0 via exponent bit-stuffing + a degree-4 minimax poly.

    XLA's exp costs ~40-50 VPU slots; this is ~10. Max relative error
    2.6e-6 (fit range 2^t, t∈[0,1)) — far below the 1e-3 alpha threshold
    granularity, so blending is visually identical. Inputs ≤ −87 flush
    to 0: the input clamp keeps the exponent shift in int32 range and the
    exponent-bits clip floors the scale at +0.0 (bit pattern 0), so no
    separate underflow select is needed.
    """
    y = jnp.maximum(x, -88.0) * 1.4426950408889634  # log2(e)
    yi = jnp.floor(y)
    t = y - yi
    p = 1.0000026036 + t * (
        0.6930037261 + t * (0.2414429825 + t * (0.0520114241 + t * 0.013534055))
    )
    exp_bits = (yi.astype(jnp.int32) + 127) << 23
    scale = jax.lax.bitcast_convert_type(
        jnp.clip(exp_bits, 0, 254 << 23), jnp.float32
    )
    return p * scale


def _cumprod_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product along the lane (last) axis via doubling."""
    k = x.shape[-1]
    p = x.shape[0]
    offset = 1
    while offset < k:
        pad = jnp.ones((p, offset), dtype=x.dtype)
        x = x * jnp.concatenate([pad, x[:, :-offset]], axis=1)
        offset *= 2
    return x


def _tile_kernel(
    # scalar prefetch
    tile_start_ref,  # (T,) int32 SMEM
    tile_count_ref,  # (T,) int32 SMEM
    # inputs
    feats_hbm,  # (DMA_ROWS, C + 2*chunk) uint32, stays in HBM
    # outputs (sat_ref present only with sat_blocks)
    *refs,  # out_ref (3, P) VMEM [, sat_ref (1, B)], chunk scratch, sems
    tile_w: int,
    tile_h: int,
    chunk: int,
    precision=jax.lax.Precision.HIGHEST,
    mxu_q: bool = True,
    out_alpha: bool = False,
    out_depth: bool = False,
    term_stride: int = 1,
    dma_depth: int = 2,
    sat_blocks: int = 0,
    tiles_x: int = 0,
    width: int = 0,
    height: int = 0,
):
    if sat_blocks:
        out_ref, sat_ref, chunk_ref, sem_ref = refs
    else:
        out_ref, chunk_ref, sem_ref = refs
    k = chunk
    p = tile_h * tile_w
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    aligned_start = (start // k) * k
    span = start + count - aligned_start
    num_chunks = pl.cdiv(span, k)

    # Tile-local pixel coords, pixel-major (P, 1) columns.
    px_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % tile_w
    py_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) // tile_w
    px = px_i.astype(jnp.float32)
    py = py_i.astype(jnp.float32)
    if mxu_q:
        # MXU basis: [x², y², x·y, x, y, 1, 0, 0] → (P, 8).
        ones = jnp.ones_like(px)
        zeros = jnp.zeros_like(px)
        basis = jnp.concatenate(
            [px * px, py * py, px * py, px, py, ones, zeros, zeros], axis=1
        )  # (P, 8)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    if sat_blocks:
        # Saturation-depth census (ops/satcull.py): per 16×16 sub-block,
        # record the first sorted-lane index at which the block's max
        # transmittance over its IN-IMAGE pixels fell below T_EPS. Blocks
        # are (by, bx) row-major; chunk-granular recording rounds the
        # cutoff UP (conservative). Cost per chunk: sat_blocks masked
        # (P, 1) max-reduces — noise next to the (P, K) pair chain.
        sb = 16
        bw = tile_w // sb
        in_img = ((t % tiles_x) * tile_w + px_i < width) & (
            (t // tiles_x) * tile_h + py_i < height
        )  # (P, 1)
        sat_masks = []
        for b in range(sat_blocks):
            bx = b % bw
            by = b // bw
            sat_masks.append(
                in_img
                & (px_i >= bx * sb) & (px_i < (bx + 1) * sb)
                & (py_i >= by * sb) & (py_i < (by + 1) * sb)
            )

    def chunk_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(aligned_start + chunk_idx * k, k)],
            chunk_ref.at[slot],
            sem_ref.at[slot],
        )

    for j in range(dma_depth - 1):
        @pl.when(j < num_chunks)
        def _(j=j):
            chunk_dma(j % dma_depth, j).start()

    # Early-termination check cadence (the reference stops per-pixel,
    # render.cu:328; chunk granularity is this kernel's analog):
    #   term_stride=1  — max(T) reduce in the loop condition every chunk
    #   term_stride=s  — the (P,1) reduce runs every s-th chunk only (an
    #                    `alive` bool rides the carry); a terminating tile
    #                    may run ≤ s−1 extra chunks whose weights the
    #                    per-pixel gate zeroes, so output is IDENTICAL
    #   term_stride=0  — no early termination (measurement baseline)
    def cond(state):
        i, alive, transmittance = state[0], state[1], state[2]
        if term_stride == 0:
            return i < num_chunks
        if term_stride == 1:
            return jnp.logical_and(
                i < num_chunks, jnp.max(transmittance) >= T_EPS
            )
        return jnp.logical_and(i < num_chunks, alive)

    def body(state):
        i, alive, transmittance, rgb, sat = state

        @pl.when(i + (dma_depth - 1) < num_chunks)
        def _():
            chunk_dma(
                jax.lax.rem(i + (dma_depth - 1), dma_depth),
                i + (dma_depth - 1),
            ).start()

        chunk_dma(jax.lax.rem(i, dma_depth), i).wait()
        slot = jax.lax.rem(i, dma_depth)
        raw = chunk_ref[slot]  # (DMA_ROWS, K) u32 — rows 5-7 are DMA padding

        # Tile-local center: 13.3 fixed point, or the COARSE 1-px
        # encode (±32768 range) when rgb bit 30 is set — giant
        # background splats whose centers sit outside the fine window
        # (ops/instances.py COARSE_BIT). Per-INSTANCE selects on (1, K)
        # rows — not per pixel, so the pair budget is untouched.
        rgb_bits = raw[3:4, :]
        coarse = (rgb_bits >> 30) & 0x1
        c_scale = jnp.where(coarse != 0, 1.0, 1.0 / CENTER_SCALE)
        c_bias = jnp.where(coarse != 0, 32768.0, CENTER_OFFSET)
        cx = _u2f(raw[0:1, :] >> 16) * c_scale - c_bias
        cy = _u2f(raw[0:1, :] & 0xFFFF) * c_scale - c_bias
        # Conic from its quantized Cholesky factors — PSD by construction
        # (module docstring): 4 extra VPU mults on (1, K) rows.
        chu = _dec_e6m10(raw[1:2, :] >> 16)
        chw = _dec_e6m10(raw[1:2, :] & 0xFFFF)
        chv = _dec_s1e6m9(raw[2:3, :] >> 16)
        ca = chu * chu
        cb = 2.0 * chu * chv
        cc = chv * chv + chw * chw
        red = _rgb10_decode(rgb_bits & 0x3FF)
        grn = _rgb10_decode((rgb_bits >> 10) & 0x3FF)
        blu = _rgb10_decode((rgb_bits >> 20) & 0x3FF)
        # q0 = −2·ln(op) rebuilt from the 16-bit opacity (the emitter
        # guarantees op ≥ 1e-3 for real lanes; the max() guards padding
        # lanes against ln(0) → −inf reaching the MXU).
        op = jnp.maximum(_color_decode(raw[2:3, :] & 0xFFFF), 1e-6)
        q0 = -2.0 * jnp.log(op)
        aabb = raw[4:5, :].astype(jnp.int32)
        xmin = aabb & 0xFF  # (1, K) int32
        ymin = (aabb >> 8) & 0xFF
        xmax = (aabb >> 16) & 0xFF
        ymax = (aabb >> 24) & 0xFF

        if mxu_q:
            # Quadratic coefficients (8, K) for q = md² − 2·ln(op).
            coeffs = jnp.concatenate(
                [
                    ca,
                    cc,
                    cb,
                    -(2.0 * ca * cx + cb * cy),
                    -(2.0 * cc * cy + cb * cx),
                    q0 + ca * cx * cx + cb * cx * cy + cc * cy * cy,
                    jnp.zeros_like(ca),
                    jnp.zeros_like(ca),
                ],
                axis=0,
            )
            q = jax.lax.dot_general(
                basis,
                coeffs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (P, K)
        else:
            # Direct VPU quadratic on centered coords: ~9 (P,K) vector ops
            # with no catastrophic cancellation, and an exact f32 md² that
            # is closer to the reference math than the expanded-basis
            # matmul. Measured A/B at the c4 shape (profile_r3.jsonl):
            # wins at chunk=128 (132.2 vs 135.1 ms) but LOSES at the
            # default chunk=256 (131.6 vs 123.1 ms) — the MXU amortizes
            # its 6-pass f32 matmul over the longer chunk. Kept as a
            # measured alternative; mxu_q=True is the production path.
            dx = px - cx  # (P, K)
            dy = py - cy
            md2 = (ca * dx + cb * dy) * dx + cc * dy * dy
            q = md2 + q0
        alpha = jnp.minimum(_fast_exp(-0.5 * q), ALPHA_MAX)

        # Per-pixel AABB test — REQUIRED semantics, not an optimization:
        # the reference's hot loop rect-tests every pixel before the
        # alpha threshold (render.cu:316-317). Folded to 2 unsigned
        # compares per axis:
        # 0 ≤ px−xmin ≤ xmax−xmin as a single unsigned ≤ (negative wraps
        # high) — 2 int subs + 2 cmps instead of 4 cmps + an extra and.
        ux = (px_i - xmin).astype(jnp.uint32)  # (P, K)
        uy = (py_i - ymin).astype(jnp.uint32)
        inside = (ux <= (xmax - xmin).astype(jnp.uint32)) & (
            uy <= (ymax - ymin).astype(jnp.uint32)
        )
        slot_idx = aligned_start + i * k + lane_iota
        k_valid = (slot_idx >= start) & (slot_idx < start + count)
        alpha = jnp.where(inside & (alpha >= ALPHA_EPS) & k_valid, alpha, 0.0)

        u = _cumprod_lanes(1.0 - alpha)  # (P, K) inclusive ∏(1−α)
        u_excl = jnp.concatenate(
            [jnp.ones((p, 1), dtype=u.dtype), u[:, :-1]], axis=1
        )
        t_before = transmittance * u_excl
        gate = t_before >= T_EPS
        # weight = α·T_before (= T·(u_excl − u) algebraically, but the
        # product form is cheaper AND matches the oracle's α·T rounding);
        # gate applies the per-pixel stop rule.
        weights = jnp.where(gate, t_before * alpha, 0.0)

        colors = jnp.concatenate([red, grn, blu], axis=0)  # (3, K)
        if out_depth:
            # Row 5 of the DMA window carries the per-lane camera-space
            # depth as f32 bits (see composite_tiles_packed) — the
            # expected-depth accumulation rides the same weights.
            dlane = jax.lax.bitcast_convert_type(raw[5:6, :], jnp.float32)
            colors = jnp.concatenate([colors, dlane], axis=0)  # (4, K)
        rgb = rgb + jax.lax.dot_general(
            weights,
            colors,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (P, 3|4)
        # T *= ∏(1−α) UNGATED: once a pixel's t_before falls below the stop
        # threshold its gate is false in every later chunk regardless
        # (T only decreases), so skipping the reference's freeze-at-stop
        # bookkeeping changes no emitted weight — and saves a where + a
        # lane reduction per chunk.
        transmittance = transmittance * u[:, -1:]
        if term_stride > 1:
            alive = jax.lax.cond(
                jax.lax.rem(i, term_stride) == term_stride - 1,
                lambda t: jnp.max(t) >= T_EPS,
                lambda t: alive,
                transmittance,
            )
        if sat_blocks:
            # Conservative: the crossing happened somewhere inside this
            # chunk; record its LAST real lane (cutoffs only round up).
            lane_end = jnp.minimum(
                aligned_start + (i + 1) * k, start + count
            ) - 1
            sat = tuple(
                jnp.where(
                    (jnp.max(jnp.where(sat_masks[b], transmittance, 0.0))
                     < T_EPS) & (sat[b] < 0),
                    lane_end,
                    sat[b],
                )
                for b in range(sat_blocks)
            )
        return i + 1, alive, transmittance, rgb, sat

    init = (
        jnp.int32(0),
        jnp.bool_(True),
        jnp.ones((p, 1), dtype=jnp.float32),
        jnp.zeros((p, 4 if out_depth else 3), dtype=jnp.float32),
        tuple(jnp.int32(-1) for _ in range(sat_blocks)),
    )
    i_end, _, t_final, rgb, sat_fin = jax.lax.while_loop(cond, body, init)
    if sat_blocks:
        # The out block is lane-padded to SAT_PAD (Mosaic requires
        # 128-divisible last block dims); positions ≥ sat_blocks carry −1.
        row = jnp.full((1, SAT_PAD), -1, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SAT_PAD), 1)
        for b in range(sat_blocks):
            row = jnp.where(lane == b, sat_fin[b], row)
        sat_ref[:] = row

    # Drain the prefetched-but-unconsumed DMAs after an early exit
    # (started = [0, min(num_chunks, i_end + dma_depth − 1)), waited =
    # [0, i_end); j ≤ dma_depth − 2 makes the min redundant).
    for j in range(dma_depth - 1):
        @pl.when(i_end + j < num_chunks)
        def _(j=j):
            chunk_dma(jax.lax.rem(i_end + j, dma_depth), i_end + j).wait()

    # Output rows: rgb(3), [alpha], [depth] — matching _finish_fb's
    # channel convention. Accumulated alpha = 1 − final transmittance;
    # the kernel's T update is UNGATED past the 1e-3 stop (see the note
    # in `body`), so converged pixels report alpha ∈ [0.999, 1] rather
    # than freezing exactly at the stop value like the gated
    # xla/diff/oracle paths — a ≤1e-3 difference, the same envelope as
    # the stop rule itself.
    cols = [rgb[:, :3]]
    if out_alpha:
        cols.append(1.0 - t_final)
    if out_depth:
        cols.append(rgb[:, 3:4])
    out_ref[:] = (jnp.concatenate(cols, axis=1) if len(cols) > 1 else rgb).T


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "tiles_y", "tile_w", "tile_h", "width", "height",
        "chunk", "precision", "mxu_q", "out_alpha", "term_stride",
        "dma_depth", "with_sat",
    ),
)
def composite_tiles_packed(
    packed_feats: jnp.ndarray,  # (PACK_ROWS, C) uint32, sorted instance order
    tile_start: jnp.ndarray,  # (T,) int32
    tile_count: jnp.ndarray,  # (T,) int32
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    width: int,
    height: int,
    chunk: int = 128,
    precision=jax.lax.Precision.HIGHEST,
    mxu_q: bool = True,
    out_alpha: bool = False,
    depth_row: "jnp.ndarray | None" = None,  # (C,) f32 camera-space depth
    term_stride: int = 1,
    dma_depth: int = 2,
    with_sat: bool = False,
) -> jnp.ndarray:
    """Composite all tiles from packed features; returns (3, H, W) f32,
    plus optional rows in [alpha, depth] order: accumulated alpha
    (``out_alpha``) and expected depth Σ w·d (``depth_row`` — rides the
    spare DMA row 5, costing the sort nothing).

    ``with_sat=True`` additionally returns the (T·B,) int32 per-sub-block
    saturation lane indices (B = 16×16 blocks per tile, (by, bx)
    row-major; −1 = never saturated) — the input of
    ``ops.satcull.cutoff_from_sat``."""
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w
    sat_blocks = (tile_w // 16) * (tile_h // 16) if with_sat else 0
    if with_sat:
        assert tile_w % 16 == 0 and tile_h % 16 == 0, (
            "sat census needs 16px-divisible tiles"
        )
    # Pad the instance axis so every aligned chunk window is in bounds, and
    # the row axis 5 → DMA_ROWS=8 (Mosaic sublane alignment; see DMA_ROWS).
    c = packed_feats.shape[1]
    feats = jnp.zeros((DMA_ROWS, c + 2 * chunk), dtype=packed_feats.dtype)
    feats = jax.lax.dynamic_update_slice(feats, packed_feats, (0, 0))
    out_depth = depth_row is not None
    if out_depth:
        feats = jax.lax.dynamic_update_slice(
            feats,
            jax.lax.bitcast_convert_type(
                depth_row.astype(jnp.float32), jnp.uint32
            )[None, :],
            (PACK_ROWS, 0),
        )

    nc = 3 + int(out_alpha) + int(out_depth)
    kernel = functools.partial(
        _tile_kernel, tile_w=tile_w, tile_h=tile_h, chunk=chunk,
        precision=precision, mxu_q=mxu_q, out_alpha=out_alpha,
        out_depth=out_depth, term_stride=term_stride, dma_depth=dma_depth,
        sat_blocks=sat_blocks, tiles_x=tiles_x, width=width, height=height,
    )
    fb_spec = pl.BlockSpec(
        (nc, p), lambda t, *prefetch: (0, t), memory_space=pltpu.VMEM
    )
    fb_shape = jax.ShapeDtypeStruct((nc, num_tiles * p), jnp.float32)
    if with_sat:
        out_specs = [
            fb_spec,
            pl.BlockSpec(
                (1, SAT_PAD),
                lambda t, *prefetch: (0, t),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            fb_shape,
            jax.ShapeDtypeStruct((1, num_tiles * SAT_PAD), jnp.int32),
        ]
    else:
        out_specs = fb_spec
        out_shape = fb_shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((dma_depth, DMA_ROWS, chunk), jnp.uint32),
            pltpu.SemaphoreType.DMA((dma_depth,)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_count, feats)
    sat = None
    if with_sat:
        out, sat = out
        sat = sat.reshape(num_tiles, SAT_PAD)[:, :sat_blocks].reshape(-1)

    fb = out.reshape(nc, tiles_y, tiles_x, tile_h, tile_w)
    fb = fb.transpose(0, 1, 3, 2, 4).reshape(
        nc, tiles_y * tile_h, tiles_x * tile_w
    )
    fb = fb[:, :height, :width]
    return (fb, sat) if with_sat else fb
