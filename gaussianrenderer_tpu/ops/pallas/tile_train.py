"""Differentiable Pallas compositor: forward + hand-written backward.

The training path's hot loop. ``composite_tiles_diff``
(ops/compositing.py) is a fixed-trip ``lax.scan`` so reverse-mode AD
works — but every tile pays ``max_chunks`` dense (K, P) chunk bodies
with no early exit, and the checkpointed backward recomputes all of
them: 789 ms/step at 100k splats / 512² on the v5e (train_bench.jsonl),
~50× the packed forward render of the same scene.

This module is the TPU-native analog of the reference ecosystem's
``diff-gaussian-rasterization`` CUDA backward (the reference itself
never built training — reference README.md:17): a Pallas forward with
the packed kernel's structure (grid over tiles, double-buffered chunk
DMA, early termination) on FULL-F32 features, plus a reverse-walk
backward kernel, wired as one ``jax.custom_vjp``.

Forward semantics — the ``composite_tiles_diff`` chunk body exactly
(compositing.py:198-264), at THIS kernel's chunk partition:

  * md² = clip(A·dx² + B·dx·dy + C·dy², 0, 80); α = min(op·e^(−½md²),
    0.99); zeroed outside the AABB, below 1e-3, and beyond the tile's
    instance range.
  * within a chunk: t_before = T_carry · ungated exclusive cumprod of
    (1−α); weight = α·t_before gated by t_before ≥ 1e-3.
  * across chunks: the carry freezes per pixel at the stop threshold —
    T_next = T_carry · Π_{gated}(1−α) (the reference freeze-at-stop,
    ``render.cu:328``).
  * chunks are K-ALIGNED windows over [start, start+count) (DMA lane
    alignment), where the scan path slices at start+i·K — partitions
    differ only in where the chunk-boundary freeze lands, the same
    ≤1e-3 stop envelope as the packed-vs-xla agreement
    (tests/test_grad_kernel.py pins both).

Backward — chunk-reversed walk with two tricks that keep it exact and
division-free where it matters:

  * the forward checkpoints T_carry to HBM at every chunk boundary
    (4 KB per chunk), so the backward recomputes each chunk's
    t_before/weights BIT-IDENTICALLY (same doubling cumprod) with no
    T-reconstruction divisions (dividing T_final back up by ∏(1−α) is
    the standard CUDA approach; across a whole chunk the product can
    underflow f32).
  * the cross-chunk cotangent rides in premultiplied ("elasticity")
    form A_p = ∂L/∂T_carry · T_carry, which updates as a pure sum:
    A_entry = A_exit + Σ_chunk (g·c_j)·w_jp, seeded with
    A = gT · T_final (the alpha-row cotangent). The only division left
    is by (1−α) ≥ 0.01.

    Per instance i (gate g_i = [t_before ≥ 1e-3], prefix along lanes):
      ∂L/∂α_i = g_i·(g·c_i)·t_before_i − (S_i + g_i·A_exit)/(1−α_i)
    where S_i = Σ_{j>i, same chunk} (g·c_j)·w_jp is a strictly-upper
    triangular MXU matmul. From ∂α the chain to (cx, cy, A, B, C, op,
    rgb) is elementwise + six (1,P)·(P,K) reductions and one
    (3,P)·(P,K) color matmul.

  * per-instance gradients are accumulated into the (16, C) output by
    chunk-granular read-modify-write DMA: adjacent tiles' aligned
    windows can overlap by < K lanes, and the sequential Pallas grid
    plus a full drain before each tile ends makes RMW race-free. The
    output is zero-seeded via ``input_output_aliases``.

Gradients through the AABB rows and the depth row are structurally zero
(masks / not differentiated), matching jax.grad of the scan compositor.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianrenderer_tpu.ops.compositing import (
    ALPHA_EPS,
    ALPHA_MAX,
    FEAT_CONIC_A,
    FEAT_CONIC_B,
    FEAT_CONIC_C,
    FEAT_CX,
    FEAT_CY,
    FEAT_DIM,
    FEAT_OPACITY,
    FEAT_R,
    FEAT_XMAX,
    FEAT_XMIN,
    FEAT_YMAX,
    FEAT_YMIN,
    T_EPS,
)

#: Stats-block rows per tile: rgb(3), T_final, i_end (f32), 3 pad (DMA
#: sublane alignment).
STATS_ROWS = 8
MD2_CLIP = 80.0


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


def _chunk_fields(raw):
    """Split a (16, K) f32 feature chunk into (1, K) field rows."""
    return dict(
        cx=raw[FEAT_CX : FEAT_CX + 1],
        cy=raw[FEAT_CY : FEAT_CY + 1],
        ca=raw[FEAT_CONIC_A : FEAT_CONIC_A + 1],
        cb=raw[FEAT_CONIC_B : FEAT_CONIC_B + 1],
        cc=raw[FEAT_CONIC_C : FEAT_CONIC_C + 1],
        op=raw[FEAT_OPACITY : FEAT_OPACITY + 1],
        colors=raw[FEAT_R : FEAT_R + 3],  # (3, K)
        xmin=raw[FEAT_XMIN : FEAT_XMIN + 1],
        ymin=raw[FEAT_YMIN : FEAT_YMIN + 1],
        xmax=raw[FEAT_XMAX : FEAT_XMAX + 1],
        ymax=raw[FEAT_YMAX : FEAT_YMAX + 1],
    )


def _alpha_terms(f, px, py, valid):
    """The diff compositor's alpha math on a (16, K) chunk vs (P, 1)
    pixel columns; returns everything the backward chain reuses."""
    dx = px - f["cx"]  # (P, K)
    dy = py - f["cy"]
    md2_raw = f["ca"] * dx * dx + f["cb"] * dx * dy + f["cc"] * dy * dy
    md2 = jnp.clip(md2_raw, 0.0, MD2_CLIP)
    e = jnp.exp(-0.5 * md2)
    alpha_raw = f["op"] * e
    alpha_min = jnp.minimum(alpha_raw, ALPHA_MAX)
    inside = (
        (px >= f["xmin"])
        & (px <= f["xmax"])
        & (py >= f["ymin"])
        & (py <= f["ymax"])
    )
    mask = inside & (alpha_min >= ALPHA_EPS) & valid
    alpha = jnp.where(mask, alpha_min, 0.0)
    return alpha, dict(
        dx=dx, dy=dy, md2_raw=md2_raw, e=e, alpha_raw=alpha_raw, mask=mask
    )


# --------------------------------------------------------------- forward
def _fwd_kernel(
    tile_start_ref,  # (T,) int32 SMEM (scalar prefetch)
    tile_count_ref,  # (T,) int32 SMEM
    chk_offset_ref,  # (T,) int32 SMEM — per-tile checkpoint row offset
    feats_hbm,  # (16, Cpad) f32, stays in HBM
    stats_ref,  # (STATS_ROWS, P) VMEM block for this tile
    chk_hbm,  # (T_blk*8, P) f32 HBM — chunk-entry T, 8 chunks per block
    chunk_ref,  # (2, 16, K) f32 VMEM double buffer
    chk_scratch,  # (8, P) f32 VMEM — checkpoint staging block
    sem_ref,  # (2,) DMA semaphores
    chk_sem,  # () DMA semaphore for checkpoint writes
    *,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
):
    k = chunk
    p = tile_h * tile_w
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    chk_base = chk_offset_ref[t]
    aligned_start = (start // k) * k
    num_chunks = pl.cdiv(start + count - aligned_start, k)

    # GLOBAL pixel coordinates — the f32 features carry global centers
    # and AABBs (build_features), unlike the packed path's tile-local
    # encodings.
    px_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % tile_w
    py_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) // tile_w
    px = (px_i + (t % tiles_x) * tile_w).astype(jnp.float32)
    py = (py_i + (t // tiles_x) * tile_h).astype(jnp.float32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def chunk_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(aligned_start + chunk_idx * k, k)],
            chunk_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def cond(state):
        i, transmittance, _ = state
        return jnp.logical_and(i < num_chunks, jnp.max(transmittance) >= T_EPS)

    def body(state):
        i, transmittance, rgb = state

        @pl.when(i + 1 < num_chunks)
        def _():
            chunk_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        # Checkpoint T_carry (the chunk-entry transmittance) for the
        # backward's bit-identical within-chunk recompute. Staged as row
        # i%8 of an (8, P) VMEM block, flushed every 8th chunk (HBM
        # slices must be 8-sublane aligned; Mosaic has no (P,1)<->(8,P/8)
        # reshape, so rows are written via transpose).
        chk_scratch[pl.ds(jax.lax.rem(i, 8), 1), :] = transmittance.T

        @pl.when(jax.lax.rem(i, 8) == 7)
        def _():
            flush = pltpu.make_async_copy(
                chk_scratch,
                chk_hbm.at[pl.ds((chk_base + i // 8) * 8, 8), :],
                chk_sem,
            )
            flush.start()
            flush.wait()

        chunk_dma(jax.lax.rem(i, 2), i).wait()
        raw = chunk_ref[jax.lax.rem(i, 2)]  # (16, K) f32

        slot_idx = aligned_start + i * k + lane_iota
        valid = (slot_idx >= start) & (slot_idx < start + count)
        f = _chunk_fields(raw)
        alpha, _ = _alpha_terms(f, px, py, valid)

        u = _cumprod_lanes(1.0 - alpha)  # (P, K) inclusive ∏(1−α)
        u_excl = jnp.concatenate(
            [jnp.ones((p, 1), dtype=u.dtype), u[:, :-1]], axis=1
        )
        t_before = transmittance * u_excl
        gate = t_before >= T_EPS
        weights = jnp.where(gate, alpha * t_before, 0.0)

        rgb = rgb + jax.lax.dot_general(
            weights,
            f["colors"],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, 3)
        # Gated carry — the reference freeze-at-stop (render.cu:328), as
        # the scan compositor implements it (min over gated u ≡ the
        # product of gated (1−α): gates are a prefix along the chunk).
        transmittance = transmittance * jnp.min(
            jnp.where(gate, u, 1.0), axis=1, keepdims=True
        )
        return i + 1, transmittance, rgb

    init = (
        jnp.int32(0),
        jnp.ones((p, 1), dtype=jnp.float32),
        jnp.zeros((p, 3), dtype=jnp.float32),
    )
    i_end, t_final, rgb = jax.lax.while_loop(cond, body, init)

    @pl.when(i_end < num_chunks)
    def _():
        chunk_dma(jax.lax.rem(i_end, 2), i_end).wait()

    # Flush the trailing partial checkpoint block (rows ≥ i_end%8 are
    # stale; the backward never reads past chunk i_end−1).
    @pl.when(jax.lax.rem(i_end, 8) != 0)
    def _():
        flush = pltpu.make_async_copy(
            chk_scratch,
            chk_hbm.at[pl.ds((chk_base + i_end // 8) * 8, 8), :],
            chk_sem,
        )
        flush.start()
        flush.wait()

    out = jnp.concatenate(
        [
            rgb,  # rows 0-2
            t_final,  # row 3
            jnp.full((p, 1), i_end, dtype=jnp.float32),  # row 4
            jnp.zeros((p, STATS_ROWS - 5), dtype=jnp.float32),
        ],
        axis=1,
    )
    stats_ref[:] = out.T


# -------------------------------------------------------------- backward
def _bwd_kernel(
    tile_start_ref,
    tile_count_ref,
    chk_offset_ref,
    feats_hbm,  # (16, Cpad) f32 HBM
    gout_ref,  # (STATS_ROWS, P) VMEM block: rows 0-2 dL/drgb, 3 dL/dT_final
    stats_ref,  # (STATS_ROWS, P) VMEM block from the forward
    zeros_hbm,  # (16, Cpad) f32 HBM — zero donor, aliased to d_feats
    chk_hbm,  # (T_blk*8, P) f32 HBM
    d_feats_hbm,  # (16, Cpad) f32 HBM output (aliased to zeros_hbm)
    chunk_ref,  # (16, K) f32 VMEM — feature chunk
    grad_ref,  # (16, K) f32 VMEM — RMW gradient block
    chk_scratch,  # (8, P) f32 VMEM — checkpoint block
    sem_ref,  # (3,) DMA semaphores: feats read / grad RMW / chk read
    *,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
):
    del zeros_hbm  # only exists to zero-seed d_feats via aliasing
    k = chunk
    p = tile_h * tile_w
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    chk_base = chk_offset_ref[t]
    aligned_start = (start // k) * k

    px_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % tile_w
    py_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) // tile_w
    px = (px_i + (t % tiles_x) * tile_w).astype(jnp.float32)
    py = (py_i + (t // tiles_x) * tile_h).astype(jnp.float32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    # Strictly-upper suffix matrix: S_(p,i) = Σ_{j>i} y_(p,j) = y @ UT.
    ut = (
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    ).astype(jnp.float32)

    g_rgb = gout_ref[0:3].T  # (P, 3) dL/drgb for this tile's pixels
    g_tfin = gout_ref[3:4].T  # (P, 1) dL/dT_final
    t_final = stats_ref[3:4].T  # (P, 1)
    i_end = stats_ref[4, 0].astype(jnp.int32)

    def cond(state):
        return state[0] >= 0

    def body(state):
        i, acc = state  # acc: (P, 1) premultiplied cotangent A

        pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(aligned_start + i * k, k)],
            chunk_ref,
            sem_ref.at[0],
        ).start()
        # The checkpoint block covers 8 chunks; on the reverse walk a new
        # block is entered at i%8 == 7 (plus the first iteration, which
        # may land mid-block). Fetching it every chunk would re-read the
        # same (8, P) block — 8 KB at P=256, as much as the feature chunk
        # itself — 8× over.
        need_chk = jnp.logical_or(i == i_end - 1, jax.lax.rem(i, 8) == 7)

        @pl.when(need_chk)
        def _():
            pltpu.make_async_copy(
                chk_hbm.at[pl.ds((chk_base + i // 8) * 8, 8), :],
                chk_scratch,
                sem_ref.at[2],
            ).start()

        # RMW read: current gradient content of this chunk's window
        # (nonzero only in the < K-lane overlap with the next tile's
        # aligned window, already processed by this sequential grid).
        pltpu.make_async_copy(
            d_feats_hbm.at[:, pl.ds(aligned_start + i * k, k)],
            grad_ref,
            sem_ref.at[1],
        ).start()

        pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(aligned_start + i * k, k)],
            chunk_ref,
            sem_ref.at[0],
        ).wait()

        @pl.when(need_chk)
        def _():
            pltpu.make_async_copy(
                chk_hbm.at[pl.ds((chk_base + i // 8) * 8, 8), :],
                chk_scratch,
                sem_ref.at[2],
            ).wait()
        raw = chunk_ref[:]
        # Select row i%8 of the checkpoint block (dynamic sublane
        # indexing via masked reduce), back to a (P, 1) column.
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, p), 0)
        t_carry = jnp.sum(
            jnp.where(row_iota == jax.lax.rem(i, 8), chk_scratch[:], 0.0),
            axis=0,
            keepdims=True,
        ).T

        slot_idx = aligned_start + i * k + lane_iota
        valid = (slot_idx >= start) & (slot_idx < start + count)
        f = _chunk_fields(raw)
        alpha, aux = _alpha_terms(f, px, py, valid)

        # Bit-identical forward recompute of this chunk.
        one_minus = 1.0 - alpha
        u = _cumprod_lanes(one_minus)
        u_excl = jnp.concatenate(
            [jnp.ones((p, 1), dtype=u.dtype), u[:, :-1]], axis=1
        )
        t_before = t_carry * u_excl
        gate = t_before >= T_EPS
        weights = jnp.where(gate, alpha * t_before, 0.0)

        # gc_(p,j) = g_p · c_j  (per-pair channel dot, on the MXU).
        gc = jax.lax.dot_general(
            g_rgb,
            f["colors"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, K)
        y = gc * weights
        s_chunk = jax.lax.dot_general(
            y,
            ut,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, K): Σ_{j>i} y_j
        gate_f = gate.astype(jnp.float32)
        d_alpha = gate_f * gc * t_before - (
            s_chunk + gate_f * acc
        ) / one_minus
        # Chain through min(·, 0.99), the mask, and clip(md², 0, 80).
        d_alpha = jnp.where(
            aux["mask"] & (aux["alpha_raw"] < ALPHA_MAX), d_alpha, 0.0
        )
        d_op_pk = d_alpha * aux["e"]
        d_md2 = jnp.where(
            (aux["md2_raw"] > 0.0) & (aux["md2_raw"] < MD2_CLIP),
            -0.5 * d_alpha * aux["alpha_raw"],
            0.0,
        )
        dx, dy = aux["dx"], aux["dy"]

        ones_p = jnp.ones((1, p), dtype=jnp.float32)

        def red(x):  # Σ over pixels → (1, K)
            return jax.lax.dot_general(
                ones_p,
                x,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        d_colors = jax.lax.dot_general(
            g_rgb,
            weights,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (3, K)
        ca, cb = f["ca"], f["cb"]
        cc = f["cc"]
        d_cx = red(d_md2 * (-(2.0 * ca * dx + cb * dy)))
        d_cy = red(d_md2 * (-(2.0 * cc * dy + cb * dx)))
        d_ca = red(d_md2 * dx * dx)
        d_cb = red(d_md2 * dx * dy)
        d_cc = red(d_md2 * dy * dy)
        d_op = red(d_op_pk)

        zeros_row = jnp.zeros((1, k), dtype=jnp.float32)
        grad_block = jnp.concatenate(
            [
                d_cx,  # FEAT_CX = 0
                d_cy,  # FEAT_CY = 1
                d_ca,  # FEAT_CONIC_A = 2
                d_cb,
                d_cc,
                d_op,  # FEAT_OPACITY = 5
                d_colors,  # FEAT_R..FEAT_B = 6..8
            ]
            + [zeros_row] * (FEAT_DIM - 9),  # aabb/depth/pad: no grads
            axis=0,
        )

        pltpu.make_async_copy(
            d_feats_hbm.at[:, pl.ds(aligned_start + i * k, k)],
            grad_ref,
            sem_ref.at[1],
        ).wait()
        grad_ref[:] = grad_ref[:] + grad_block
        wb = pltpu.make_async_copy(
            grad_ref,
            d_feats_hbm.at[:, pl.ds(aligned_start + i * k, k)],
            sem_ref.at[1],
        )
        wb.start()

        # A_entry = A_exit + Σ_chunk (g·c_j)·w_j — premultiplied form.
        acc = acc + jnp.sum(y, axis=1, keepdims=True)
        wb.wait()
        return i - 1, acc

    # Seed: A = dL/dT_final · T_final (T_final = Π of every gated (1−α)).
    jax.lax.while_loop(cond, body, (i_end - 1, g_tfin * t_final))


# ------------------------------------------------------------ host wiring
def _pad_feats_t(sorted_feats: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(C+K, 16) row-major sorted features → (16, Cpad) lane-major with
    enough lane padding that every aligned chunk window is in bounds."""
    c = sorted_feats.shape[0]
    cpad = (-(-c // chunk)) * chunk + chunk
    feats_t = jnp.zeros((FEAT_DIM, cpad), dtype=jnp.float32)
    return jax.lax.dynamic_update_slice(feats_t, sorted_feats.T, (0, 0))


def _chunk_offsets(tile_start, tile_count, chunk):
    """Per-tile checkpoint offset in 8-chunk BLOCKS (each tile's chunks
    start at a fresh block so its block index is just chunk//8)."""
    aligned = (tile_start // chunk) * chunk
    nchunks = -(-(tile_start + tile_count - aligned) // chunk)
    nblocks = -(-nchunks // 8)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblocks)[:-1]]
    ).astype(jnp.int32)


def _run_forward(feats_t, tile_start, tile_count, chk_offset, *, num_tiles,
                 num_tiles_x, tile_w, tile_h, chunk, t_chk):
    p = tile_w * tile_h
    kernel = functools.partial(
        _fwd_kernel, tiles_x=num_tiles_x, tile_w=tile_w, tile_h=tile_h, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (STATS_ROWS, p),
                lambda t, *prefetch: (0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_DIM, chunk), jnp.float32),
            pltpu.VMEM((8, p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    interpret = jax.default_backend() != "tpu"
    stats, chk = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((STATS_ROWS, num_tiles * p), jnp.float32),
            jax.ShapeDtypeStruct((t_chk * 8, p), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_count, chk_offset, feats_t)
    return stats, chk


def _run_backward(feats_t, tile_start, tile_count, chk_offset, gout, stats,
                  chk, *, num_tiles, num_tiles_x, tile_w, tile_h, chunk):
    p = tile_w * tile_h
    kernel = functools.partial(
        _bwd_kernel, tiles_x=num_tiles_x, tile_w=tile_w, tile_h=tile_h, chunk=chunk
    )
    tile_block = pl.BlockSpec(
        (STATS_ROWS, p), lambda t, *prefetch: (0, t), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # feats_t
            tile_block,  # gout
            tile_block,  # stats
            pl.BlockSpec(memory_space=pl.ANY),  # zeros donor
            pl.BlockSpec(memory_space=pl.ANY),  # chk
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((FEAT_DIM, chunk), jnp.float32),
            pltpu.VMEM((FEAT_DIM, chunk), jnp.float32),
            pltpu.VMEM((8, p), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    zeros = jnp.zeros_like(feats_t)
    d_feats_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(feats_t.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={6: 0},  # zeros donor → d_feats (3 prefetch
        # args + feats_t + gout + stats precede it in the flat arg list)
    )(tile_start, tile_count, chk_offset, feats_t, gout, stats, zeros, chk)
    return d_feats_t


# ------------------------------------------------------------- custom_vjp
@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10)
)
def _composite_train_core(
    sorted_feats,  # (C + K, 16) f32, sorted instance order (diff layout)
    tile_start,  # (T,) int32
    tile_count,  # (T,) int32
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    width: int,
    height: int,
    chunk: int,
    return_alpha: bool,
):
    out, _ = _composite_train_fwd(
        sorted_feats, tile_start, tile_count, tiles_x, tiles_y, tile_w,
        tile_h, width, height, chunk, return_alpha,
    )
    return out


def _assemble(stats, *, tiles_x, tiles_y, tile_w, tile_h, width, height,
              return_alpha):
    nc = 4 if return_alpha else 3
    rows = stats[:3] if not return_alpha else jnp.concatenate(
        [stats[:3], 1.0 - stats[3:4]], axis=0
    )
    fb = rows.reshape(nc, tiles_y, tiles_x, tile_h, tile_w)
    fb = fb.transpose(0, 1, 3, 2, 4).reshape(
        nc, tiles_y * tile_h, tiles_x * tile_w
    )
    return fb[:, :height, :width]


def _composite_train_fwd(
    sorted_feats, tile_start, tile_count, tiles_x, tiles_y, tile_w, tile_h,
    width, height, chunk, return_alpha,
):
    num_tiles = tiles_x * tiles_y
    c = sorted_feats.shape[0]
    # Blocks of 8 chunks: Σ_t cdiv(cdiv(span_t, K), 8) ≤
    # (cdiv(C, K) + 2T)/8 + T.
    t_chk = (-(-c // chunk) + 2 * num_tiles) // 8 + num_tiles + 1
    feats_t = _pad_feats_t(sorted_feats, chunk)
    chk_offset = _chunk_offsets(tile_start, tile_count, chunk)
    stats, chk = _run_forward(
        feats_t, tile_start, tile_count, chk_offset, num_tiles=num_tiles,
        num_tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h, chunk=chunk,
        t_chk=t_chk,
    )
    fb = _assemble(
        stats, tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tile_w,
        tile_h=tile_h, width=width, height=height, return_alpha=return_alpha,
    )
    return fb, (feats_t, tile_start, tile_count, chk_offset, stats, chk, c)


def _composite_train_bwd(
    tiles_x, tiles_y, tile_w, tile_h, width, height, chunk, return_alpha,
    res, d_fb,
):
    feats_t, tile_start, tile_count, chk_offset, stats, chk, c = res
    num_tiles = tiles_x * tiles_y
    p = tile_w * tile_h
    fh, fw = tiles_y * tile_h, tiles_x * tile_w
    # Cotangent rows per pixel: pad d_fb back to the padded tile grid,
    # then to per-tile (STATS_ROWS, P) blocks matching the stats layout.
    d_fb = jnp.pad(
        d_fb, ((0, 0), (0, fh - d_fb.shape[1]), (0, fw - d_fb.shape[2]))
    )
    if return_alpha:
        # alpha row = 1 − T_final ⇒ dL/dT_final = −d_alpha.
        d_rgb, d_alpha = d_fb[:3], d_fb[3:4]
        rows = jnp.concatenate([d_rgb, -d_alpha], axis=0)
    else:
        rows = jnp.concatenate(
            [d_fb, jnp.zeros((1, fh, fw), jnp.float32)], axis=0
        )
    rows = jnp.concatenate(
        [rows, jnp.zeros((STATS_ROWS - 4, fh, fw), jnp.float32)], axis=0
    )
    gout = (
        rows.reshape(STATS_ROWS, tiles_y, tile_h, tiles_x, tile_w)
        .transpose(0, 1, 3, 2, 4)
        .reshape(STATS_ROWS, num_tiles * p)
    )
    d_feats_t = _run_backward(
        feats_t, tile_start, tile_count, chk_offset, gout, stats, chk,
        num_tiles=num_tiles, num_tiles_x=tiles_x, tile_w=tile_w,
        tile_h=tile_h, chunk=chunk,
    )
    d_sorted = d_feats_t[:, :c].T

    def int_zero(x):  # integer primals take float0 cotangents
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return d_sorted, int_zero(tile_start), int_zero(tile_count)


_composite_train_core.defvjp(_composite_train_fwd, _composite_train_bwd)


def composite_tiles_train(
    sorted_feats: jnp.ndarray,  # (C + K, 16) f32 (compositing.py layout)
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    width: int,
    height: int,
    chunk_size: int = 128,
    return_alpha: bool = False,
) -> jnp.ndarray:
    """Drop-in differentiable replacement for ``composite_tiles_diff``
    (same inputs/outputs, no ``max_chunks`` truncation — the kernel runs
    each tile's full instance range with early termination).

    Requires a 128-lane-aligned tile (``tile_w·tile_h % 128 == 0``, like
    the packed kernel); callers gate on :func:`train_kernel_compatible`
    and fall back to the scan compositor otherwise.
    """
    return _composite_train_core(
        sorted_feats.astype(jnp.float32), tile_start, tile_count, tiles_x,
        tiles_y, tile_w, tile_h, width, height, chunk_size, return_alpha,
    )


def train_kernel_compatible(tile_w: int, tile_h: int) -> bool:
    return (tile_w * tile_h) % 128 == 0
