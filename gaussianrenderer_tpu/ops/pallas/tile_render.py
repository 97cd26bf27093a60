"""Pallas TPU kernel: per-tile front-to-back alpha compositing.

The TPU-native re-design of the reference hot loop ``renderGaussians``
(``src/core/cuda/render.cu:266-367``). Grid = the tile grid; each grid step
owns one (tile_h × tile_w) framebuffer block in VMEM (the analog of the
reference's per-tile shared-memory accumulators, ``render.cu:268-283``) and
walks that tile's sorted instance range in chunks of K = 128 instances:

  HBM feature matrix (16 × C, instance-minor) --async DMA--> VMEM (16 × K)
  VPU:  P×K alpha evaluation + lane-wise exclusive prefix-product
  MXU:  rgb += weights · colorsᵀ            (P,K)·(K,3)

Layout notes (the TPU-shaped decisions):

* Features are stored transposed — one row per field, instances on the lane
  (minor) dimension — so a chunk DMA is a (16, 128) lane-aligned slice.
  Mosaic requires minor-dim slices in multiples of 128.
* DMA starts are rounded down to the 128 boundary; the sub-chunk lead-in is
  masked off via the per-lane global slot index.
* Compositing math runs pixel-major: (P, K) arrays with P = tile_h·tile_w
  pixels on sublanes and the K chunk instances on lanes, so per-instance
  fields broadcast as (1, K) rows and per-pixel state as (P, 1) columns.
* The sequential transmittance recurrence becomes a lane-wise inclusive
  prefix product (Hillis-Steele doubling — jnp.cumprod has no Mosaic
  lowering), and color accumulation is one (P,K)×(K,3) MXU matmul.

Early termination (``render.cu:328``) happens at chunk granularity: the
while_loop stops as soon as every pixel's transmittance is below 1e-3.
Unlike the reference's one-Gaussian-at-a-time shared-memory staging
(``render.cu:303-307``), 128 instances are in flight per step, with a
double-buffered DMA hiding HBM latency behind the current chunk's compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianrenderer_tpu.ops.compositing import (
    ALPHA_EPS,
    ALPHA_MAX,
    FEAT_DIM,
    T_EPS,
)

#: Chunk size of the instance walk — fixed at the TPU lane width so feature
#: DMAs are lane-aligned and every (P, K) vector op is fully packed.
CHUNK = 128


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
    tile_start_ref,  # (T,) int32 in SMEM
    tile_count_ref,  # (T,) int32 in SMEM
    # inputs
    feats_hbm,  # (16, C + 2*CHUNK) float32, stays in HBM
    # outputs
    out_ref,  # (3, tile_h, tile_w) VMEM block
    # scratch
    chunk_ref,  # (2, 16, CHUNK) VMEM double buffer
    sem_ref,  # (2,) DMA semaphores
    *,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
):
    k = CHUNK
    p = tile_h * tile_w
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * tiles_x + tx
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    # Round the DMA window down to the lane boundary; mask the lead-in.
    aligned_start = (start // k) * k
    span = start + count - aligned_start
    num_chunks = pl.cdiv(span, k)

    # Global pixel coordinates for this tile, pixel-major (P, 1).
    gx = (
        jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % tile_w
        + tx * tile_w
    ).astype(jnp.float32)
    gy = (
        jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) // tile_w
        + ty * tile_h
    ).astype(jnp.float32)
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
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < num_chunks)
        def _():
            chunk_dma(next_slot, i + 1).start()

        chunk_dma(slot, i).wait()
        feats = chunk_ref[slot]  # (16, K), one field per row

        cx = feats[0:1, :]  # (1, K) — broadcasts over pixels
        cy = feats[1:2, :]
        ca = feats[2:3, :]
        cb = feats[3:4, :]
        cc = feats[4:5, :]
        op = feats[5:6, :]
        colors = feats[6:9, :]  # (3, K)
        xmin = feats[9:10, :]
        ymin = feats[10:11, :]
        xmax = feats[11:12, :]
        ymax = feats[12:13, :]

        dx = gx - cx  # (P, K)
        dy = gy - cy
        md2 = ca * dx * dx + cb * dx * dy + cc * dy * dy
        alpha = jnp.minimum(op * jnp.exp(-0.5 * md2), ALPHA_MAX)

        inside = (gx >= xmin) & (gx <= xmax) & (gy >= ymin) & (gy <= ymax)
        slot_idx = aligned_start + i * k + lane_iota  # (1, K) global slots
        k_valid = (slot_idx >= start) & (slot_idx < start + count)
        alpha = jnp.where(inside & (alpha >= ALPHA_EPS) & k_valid, alpha, 0.0)

        one_minus = 1.0 - alpha
        u = _cumprod_lanes(one_minus)  # (P, K) inclusive
        u_excl = jnp.concatenate(
            [jnp.ones((p, 1), dtype=u.dtype), u[:, :-1]], axis=1
        )
        t_before = transmittance * u_excl  # (P,1)*(P,K)
        gate = t_before >= T_EPS
        weights = jnp.where(gate, alpha * t_before, 0.0)

        rgb = rgb + jax.lax.dot_general(
            weights,
            colors,
            dimension_numbers=(((1,), (1,)), ((), ())),  # contract K
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # full-f32 color accumulation
        )  # (P, 3)
        # Gated product of (1-α) = u at the last gated lane. The gate is a
        # prefix (monotone true→false) and u a non-increasing positive prefix
        # product, so that value is min(where(gate, u, 1)) — a plain reduce
        # (reduce_prod has no Mosaic lowering either).
        transmittance = transmittance * jnp.min(
            jnp.where(gate, u, 1.0), axis=1, keepdims=True
        )
        return i + 1, transmittance, rgb

    init = (
        jnp.int32(0),
        jnp.ones((p, 1), dtype=jnp.float32),
        jnp.zeros((p, 3), dtype=jnp.float32),
    )
    i_end, _, rgb = jax.lax.while_loop(cond, body, init)

    # Drain the prefetched-but-unconsumed DMA after an early exit so the
    # scratch buffer is quiescent before the next grid step reuses it.
    @pl.when(i_end < num_chunks)
    def _():
        chunk_dma(jax.lax.rem(i_end, 2), i_end).wait()

    out_ref[:] = rgb.T.reshape(3, tile_h, tile_w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x",
        "tiles_y",
        "tile_w",
        "tile_h",
        "width",
        "height",
        "chunk_size",
    ),
)
def composite_tiles_pallas(
    sorted_feats: jnp.ndarray,  # (C + chunk, 16) float32, instance-major
    tile_start: jnp.ndarray,  # (T,) int32
    tile_count: jnp.ndarray,  # (T,) int32
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    width: int,
    height: int,
    chunk_size: int = CHUNK,  # accepted for API parity; kernel uses CHUNK
) -> jnp.ndarray:
    """Composite all tiles with the Pallas kernel; returns (3, H, W)."""
    del chunk_size
    # Transpose to field-major (16, C) and pad the instance axis so every
    # aligned chunk window is in bounds.
    feats_t = sorted_feats.T
    pad = jnp.zeros((FEAT_DIM, 2 * CHUNK), dtype=feats_t.dtype)
    feats_t = jnp.concatenate([feats_t, pad], axis=1)

    kernel = functools.partial(
        _tile_kernel,
        tiles_x=tiles_x,
        tile_w=tile_w,
        tile_h=tile_h,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (3, tile_h, tile_w),
            lambda ty, tx, *prefetch: (0, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_DIM, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # On non-TPU backends (CPU test runs) execute the kernel interpreted.
    interpret = jax.default_backend() != "tpu"
    fb = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (3, tiles_y * tile_h, tiles_x * tile_w), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_count, feats_t)
    return fb[:, :height, :width]
