"""Sorting components: packed-key sort, LSD radix composition, oracles.

The reference carries three sorting layers (SURVEY.md §2.6): a hand-written
GPU "OneSweep" decoupled-lookback radix sort (``onesweep.cu``), a
per-record variant fused into the render path (``render.cu:10-264``), and
CUB ``DeviceRadixSort`` as both the live path and the correctness oracle
(``cub_sort.cu``). On TPU the warp/lookback machinery has no counterpart —
XLA's ``lax.sort`` is the vendor sort — so the TPU-native layering is:

* :func:`sort_packed` — the production path: (tile, depth) packed into ONE
  32-bit key (``(tile << depth_bits) | depth_q``) + ``lax.sort``. The
  64-bit ``(tile << 32) | depth`` key of the reference (``render.cu:850``)
  splits into tile bits + quantized-depth bits because TPU lanes are
  32-bit.
* :func:`radix_sort_u32` — an LSD radix composition: d-bit digit passes,
  each pass a *stable* sort on the digit alone. This is the structural
  analog of the reference's multi-pass OneSweep (``onesweep.cu:190-251``
  fixes 4×8-bit passes) and exists for the same reason the reference kept
  its hand sort next to CUB: an independent implementation to check the
  vendor path against, and a harness fixture (apps/radix_test.py,
  apps/onesweep.py).
* :func:`sort_two_key` — the 2-key lexicographic ``lax.sort`` used as the
  correctness oracle (the "CUB" of the harnesses).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pack_key(
    tile_id: jnp.ndarray, depth_q: jnp.ndarray, depth_bits: int
) -> jnp.ndarray:
    """((tile << depth_bits) | depth) as uint32 — the production sort key."""
    return (tile_id.astype(jnp.uint32) << depth_bits) | (
        depth_q.astype(jnp.uint32) & jnp.uint32((1 << depth_bits) - 1)
    )


def unpack_key(key: jnp.ndarray, depth_bits: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return (key >> depth_bits).astype(jnp.int32), key & jnp.uint32(
        (1 << depth_bits) - 1
    )


def sort_packed(key: jnp.ndarray, *payloads: jnp.ndarray):
    """Stable single-key sort — the production instance sort."""
    return jax.lax.sort((key, *payloads), num_keys=1, is_stable=True)


def sort_two_key(k_hi: jnp.ndarray, k_lo: jnp.ndarray, *payloads: jnp.ndarray):
    """Lexicographic (hi, lo) sort — the oracle the harnesses compare to."""
    return jax.lax.sort((k_hi, k_lo, *payloads), num_keys=2)


def radix_sort_u32(
    keys: jnp.ndarray,
    *payloads: jnp.ndarray,
    total_bits: int = 32,
    digit_bits: int = 8,
):
    """LSD radix sort: ceil(total_bits/digit_bits) stable digit passes.

    Mirrors the pass structure of the reference OneSweep host wrapper
    (``onesweep.cu:190-251``: 4 passes × 8 bits, ping-pong buffers); each
    pass here is a stable single-digit sort, so the composition is sorted
    on the full key by the LSD invariant. Exists as an independent
    implementation for the correctness harnesses; the production path uses
    :func:`sort_packed` directly.
    """
    num_passes = -(-total_bits // digit_bits)
    mask = jnp.uint32((1 << digit_bits) - 1)
    ops = (keys.astype(jnp.uint32), *payloads)
    for p in range(num_passes):
        digit = (ops[0] >> (p * digit_bits)) & mask
        sorted_ops = jax.lax.sort((digit, *ops), num_keys=1, is_stable=True)
        ops = sorted_ops[1:]
    return ops


def is_nondecreasing(keys: jnp.ndarray) -> jnp.ndarray:
    """Monotonicity invariant check (reference ``onesweep.cpp:100-103``)."""
    return jnp.all(keys[1:] >= keys[:-1])
