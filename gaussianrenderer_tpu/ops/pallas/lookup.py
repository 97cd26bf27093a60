"""Tiny-table lookup without gathers: one-hot matmul on the MXU.

Instance/N-scale gathers are scalar-core bound on TPU (~8 ns per output
element — PERF_NOTES.md layout rules), so a 3M-splat lookup into even a
tiny table costs ~24 ms through ``jnp.take``. The saturation-cull pass
(ops/satcull.py) needs exactly that shape — N per-splat indices into a
≲16k-entry flattened cutoff pyramid — once per frame.

This kernel factors the flat index into (row, column) of a (R, Q) view
of the table and evaluates

    out[n] = Σ_q  (one_hot(idx>>log2 Q) @ table)[n, q] · one_hot(idx&(Q−1))[n, q]

per 1024-index block: one (1024, R)·(R, Q) bf16 MXU matmul (one-hot ×
value products are exact) plus two iota-compares and a lane reduce on
the VPU. Measured cost model: ~R·Q MACs per index — ~1 ms at N = 3M,
R = Q = 128 (vs ~24 ms for the gather).

The table rides in bf16 (8-bit mantissa): callers whose values must not
round DOWN (the conservative saturation cutoffs) pre-round UP with
:func:`bf16_ceil`. Monotone-safe: one-hot selection returns the bf16
value exactly.

Reference context: the reference has no analog — its per-thread CUDA
loops index freely; this is the TPU-native replacement for "read one
small table per thread".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Indices per grid step (8 sublanes × 128 lanes keeps every op 2-D).
BLOCK = 1024


def bf16_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """f32 → bf16 rounded toward +inf for non-negative finite inputs
    (truncate the low mantissa bits after adding their max value), so a
    conservative threshold never shrinks when the table is stored bf16."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    up = (bits + jnp.uint32(0xFFFF)) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(up, jnp.float32).astype(jnp.bfloat16)


def _lookup_kernel(idx_ref, table_ref, out_ref, *, r: int, q: int):
    idx = idx_ref[:]  # (BLOCK, 1) int32
    hi = idx // q
    lo = idx - hi * q
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1)
    oh_hi = (hi == iota_r).astype(jnp.bfloat16)  # (BLOCK, R)
    rows = jax.lax.dot_general(
        oh_hi,
        table_ref[:],  # (R, Q) bf16
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK, Q) f32 — exact: products are 0/1 × bf16 value
    oh_lo = (lo == iota_q).astype(jnp.float32)
    out_ref[:] = jnp.sum(rows * oh_lo, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("r", "q"))
def table_lookup(
    table: jnp.ndarray,  # (M,) f32/bf16 — M ≤ r·q; padded internally
    idx: jnp.ndarray,  # (N,) int32 in [0, M)
    *,
    r: int = 128,
    q: int = 128,
) -> jnp.ndarray:
    """``table[idx]`` as (N,) f32 with zero gathers (module docstring).

    ``table`` values pass through bf16 — pre-round with :func:`bf16_ceil`
    (or pre-quantize) when the direction of that rounding matters.
    Out-of-range indices are clamped.
    """
    m = table.shape[0]
    assert m <= r * q, f"table of {m} entries exceeds the {r}x{q} view"
    n = idx.shape[0]
    nb = -(-n // BLOCK)
    idx2 = jnp.clip(idx, 0, m - 1).astype(jnp.int32)
    idx2 = jnp.pad(idx2, (0, nb * BLOCK - n)).reshape(nb * BLOCK, 1)
    tab = jnp.zeros((r * q,), jnp.bfloat16).at[:m].set(
        table.astype(jnp.bfloat16)
    ).reshape(r, q)

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, r=r, q=q),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda b: (b, 0)),
            pl.BlockSpec((r, q), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, 1), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * BLOCK, 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idx2, tab)
    return out[:n, 0]
