"""Blocked Pallas matmul kernel — the reference's GEMM artifact, TPU-shaped.

The reference keeps a hand-tiled shared-memory CUDA GEMM with register
blocking and prefetch as a learning/benchmark artifact
(``src/core/cuda/test.cu:9-82``, harness ``matrix_test.cpp``). The TPU
equivalent: a Pallas kernel with a (bm, bn) output grid, a k-loop as the
trailing grid dimension, bf16 inputs feeding the MXU, and an f32 VMEM
accumulator — against which ``jnp.dot`` (XLA's cuBLAS analog) is the
oracle and bar (apps/matrix_test.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(a_ref, b_ref, out_ref, acc_ref, *, k_steps: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def matmul_pallas(
    a: jnp.ndarray,  # (M, K)
    b: jnp.ndarray,  # (K, N)
    # Default blocking = the measured v5e optimum at the harness's 8192
    # shape: 165 TFLOP/s vs 127 at 512^3 (84% of bf16 peak; larger blocks
    # exceed the VMEM/compile envelope — PERF_NOTES.md sweep).
    bm: int = 512,
    bn: int = 1024,
    bk: int = 1024,
) -> jnp.ndarray:
    m, k = a.shape
    _, n = b.shape
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, "pad to block multiples"
    k_steps = k // bk
    grid = (m // bm, n // bn, k_steps)
    kernel = functools.partial(_mm_kernel, k_steps=k_steps)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(a, b)
