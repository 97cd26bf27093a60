"""EXPERIMENTAL: Pallas bitonic block sort — run formation for a TPU merge
sort (docs/sort_plan.md).

Sorts each (9, R) block of a (9, C) u32 matrix (key row 0, payload rows
1..8) independently by the key row, entirely in VMEM. This is phase 1 of
the planned `lax.sort` replacement: R-sized sorted runs that later merge
levels combine. NOT wired into the render path yet — the merge kernel is
round-2 work; this kernel exists to validate the compare-exchange
machinery (XOR-distance pairing via two rolls + selects) against
`lax.sort` on both CPU-interpret and real TPU.

Bitonic compare-exchange at XOR distance d over a logical 1-D array held
as (S, 128) u32 (row-major, S = R/128 sublanes):

* d < 128: partner lanes are `roll(x, ±d)` along the lane axis; element i
  takes the min/max depending on bit d of its lane index and bit log2(R/…)
  of the bitonic direction mask.
* d ≥ 128: partners are whole-row swaps — `roll` along the sublane axis.

Directions follow the standard bitonic network: stage k (block size 2^k),
substage j (distance 2^j, j = k-1 … 0); ascending iff bit k of the element
index is 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS = 9  # key + 8 payloads


def _index_bit_set(shape, bit):
    """(S, 128) bool: bit `bit` of each element's linear index is set.

    Produced directly as a comparison (Mosaic cannot lower int→i1 vector
    truncation).
    """
    s, l = shape
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (s, l), 0) * l
        + jax.lax.broadcasted_iota(jnp.int32, (s, l), 1)
    )
    return ((lin >> bit) & 1) > 0


def _block_sort_kernel(x_ref, o_ref, *, r: int):
    """Bitonic sort of one (ROWS, r) block by row 0 (u32 ascending)."""
    lanes = 128
    s = r // lanes
    rows = [x_ref[i].reshape(s, lanes) for i in range(ROWS)]

    log_r = r.bit_length() - 1
    for k in range(1, log_r + 1):
        # ascending iff bit k of the linear index is 0 (automatically true
        # everywhere on the final stage since indices < 2^log_r).
        asc = ~_index_bit_set((s, lanes), k)
        for j in range(k - 1, -1, -1):
            d = 1 << j
            # True ⇒ this element is the higher index of its XOR-d pair.
            upper = _index_bit_set((s, lanes), j)
            if d < lanes:
                partner = lambda a: jnp.where(
                    upper, jnp.roll(a, d, axis=1), jnp.roll(a, -d, axis=1)
                )
            else:
                sd = d // lanes
                partner = lambda a, sd=sd: jnp.where(
                    upper, jnp.roll(a, sd, axis=0), jnp.roll(a, -sd, axis=0)
                )
            pk = partner(rows[0])
            key = rows[0]
            # keep = min for the lower element of an ascending pair etc.
            # (pure i1 logic — a where() over boolean operands trips
            # Mosaic's i8→i1 truncation)
            want_low = upper != asc
            take_self = (want_low & (key <= pk)) | (~want_low & (key >= pk))
            new_rows = []
            for a in rows:
                pa = partner(a)
                new_rows.append(jnp.where(take_self, a, pa))
            rows = new_rows

    for i in range(ROWS):
        o_ref[i] = rows[i].reshape(r)


@functools.partial(jax.jit, static_argnames=("run",))
def block_sort_runs(x: jnp.ndarray, run: int = 2048) -> jnp.ndarray:
    """Sort each `run`-sized block of (ROWS, C) u32 by row 0.

    C must be a multiple of `run`; `run` a power of two ≥ 256.
    """
    rows, c = x.shape
    assert rows == ROWS and c % run == 0 and run & (run - 1) == 0
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_block_sort_kernel, r=run)
    return pl.pallas_call(
        kernel,
        grid=(c // run,),
        in_specs=[pl.BlockSpec((ROWS, run), lambda i: (0, i))],
        out_specs=pl.BlockSpec((ROWS, run), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.uint32),
        interpret=interpret,
    )(x)
