"""Tiny-table lookup without gathers: one-hot matmul on the MXU.

Instance/N-scale gathers are scalar-core bound on TPU (~8 ns per output
element — PERF_NOTES.md layout rules), so a 3M-splat lookup into even a
tiny table costs ~24 ms through ``jnp.take``. The saturation-cull pass
(ops/satcull.py) needs exactly that shape — N per-splat indices into a
≲16k-entry flattened cutoff table/pyramid — once per frame.

This kernel factors the flat index into (row, column) of an (R, Q) view
of the table and evaluates, per 1024-index block,

    out[n] = Σ_q (tableᵀ @ one_hot(idx>>log2 Q))[q, n] · one_hot(idx&(Q−1))[q, n]

— one (Q, R)·(R, B) bf16 MXU matmul (one-hot × value products are
exact) plus two iota-compares and a sublane reduce on the VPU. All
shapes are lane-major (last dim 1024/128-wide): degenerate (N, 1)
layouts fed to/from a pallas custom-call sent XLA's layout assignment
into scalar-space (S(1)) allocations at 3M scale, OOMing the backend —
the lane-major formulation avoids minor-dim-1 arrays entirely.
Measured cost model: ~R·Q MACs per index — ~1 ms at N = 3M, R = Q = 128
(vs ~24 ms for the gather).

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

#: Indices per grid step. Sized so the (Q, BLOCK) one-hot/row
#: intermediates stay a few MB of VMEM while the Pallas per-grid-step
#: fixed cost (~1 µs — same class as the compositor's chunk fixed term)
#: amortizes: at 1024 lanes/step a 24M-lookup frame paid ~25 ms of pure
#: grid overhead; at 8192 it is ~3k steps total.
BLOCK = 8192


def bf16_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """f32 → bf16 rounded toward +inf for non-negative finite inputs
    (truncate the low mantissa bits after adding their max value), so a
    conservative threshold never shrinks when the table is stored bf16."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    up = (bits + jnp.uint32(0xFFFF)) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(up, jnp.float32).astype(jnp.bfloat16)


def _lookup_kernel(idx_ref, table_ref, out_ref, *, r: int, q: int):
    idx = idx_ref[:]  # (1, BLOCK) int32
    hi = idx // q
    lo = idx - hi * q
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (q, 1), 0)
    ohr = (hi == iota_r).astype(table_ref.dtype)  # (R, BLOCK)
    rows = jax.lax.dot_general(
        table_ref[:],  # (Q, R) bf16 — the transposed table view
        ohr,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, BLOCK) f32 — exact: products are 0/1 × bf16 value
    ohq = (lo == iota_q).astype(jnp.float32)  # (Q, BLOCK)
    out_ref[:] = jnp.sum(rows * ohq, axis=0, keepdims=True)



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
    idx2 = jnp.pad(idx2, (0, nb * BLOCK - n)).reshape(1, nb * BLOCK)
    # bf16 table on the real MXU; the CPU interpreter has no
    # bf16×bf16→f32 dot, so it runs the (already bf16-rounded) values
    # as f32 — bit-identical results either way.
    interpret = jax.default_backend() != "tpu"
    tdt = jnp.float32 if interpret else jnp.bfloat16
    tab = (
        jnp.zeros((r * q,), tdt)
        .at[:m]
        .set(table.astype(jnp.bfloat16).astype(tdt))
        .reshape(r, q)
        .T  # (Q, R): the kernel consumes the transposed view
    )

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, r=r, q=q),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, BLOCK), lambda b: (0, b)),
            pl.BlockSpec((q, r), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((1, nb * BLOCK), jnp.float32),
        interpret=interpret,
    )(idx2, tab)
    return out.reshape(-1)[:n]
