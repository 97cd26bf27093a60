"""Timing: EMA frame timer + tunnel-safe device-time measurement.

The reference measures with cudaEvents inside each sort wrapper plus
wall-clock around them (SURVEY.md §5). On this TPU host the runtime tunnel
makes ``block_until_ready`` non-blocking and a D2H sync costs ~30 ms, so
accurate device timing requires looping the op on-device inside one jitted
``fori_loop`` — with every input perturbed per-iteration (so XLA cannot
hoist the op) and the full output consumed (so it cannot dead-code-eliminate
parts of it) — then subtracting the sync floor.
"""

from __future__ import annotations

import statistics
import time
from typing import Optional

import jax
import jax.numpy as jnp


class FrameTimer:
    """EMA ms/frame + FPS (reference ``cull_sort_test.cpp:17-18,53-63``)."""

    def __init__(self, alpha: float = 0.1, report_every: int = 60):
        self.alpha = alpha
        self.report_every = report_every
        self.ema_ms: Optional[float] = None
        self.frames = 0
        self._last: Optional[float] = None

    def tick(self) -> Optional[str]:
        now = time.perf_counter()
        if self._last is not None:
            ms = (now - self._last) * 1e3
            self.ema_ms = (
                ms
                if self.ema_ms is None
                else self.alpha * ms + (1 - self.alpha) * self.ema_ms
            )
        self._last = now
        self.frames += 1
        if self.ema_ms is not None and self.frames % self.report_every == 0:
            return (
                f"frame {self.frames}: {self.ema_ms:.3f} ms/frame "
                f"({1000.0 / self.ema_ms:.1f} FPS)"
            )
        return None


def _sync(x) -> float:
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    # Prefer a non-bool leaf; fall back to casting a bool one.
    lead = next((l for l in leaves if l.dtype != jnp.bool_), leaves[0])
    return float(jnp.sum(lead.astype(jnp.float32).ravel()[:1]))


def measure_floor(reps: int = 7) -> float:
    """Median round-trip of a trivial synced computation, ms."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    _sync(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def device_time(
    fn,
    *args,
    iters: int = 10,
    floor: Optional[float] = None,
    reps: int = 3,
    perturb_ints: bool = True,
) -> float:
    """Per-call device time of ``fn(*args)`` in ms (tunnel-safe).

    ``perturb_ints=False`` leaves integer inputs bit-exact across loop
    iterations: XOR-with-1 perturbation is fine for sort keys but mutates
    packed feature bits (AABB/color fields), subtly changing the workload
    of packed-pipeline stages. Floats are always eps-perturbed, which is
    enough to stop hoisting when at least one float input exists.
    """
    if floor is None:
        floor = measure_floor()

    def loop(loop_args):
        def body(i, acc):
            eps = i.astype(jnp.float32) * jnp.float32(1e-30)
            bit = (i & 1).astype(jnp.int32)

            def perturb(a):
                if not hasattr(a, "dtype"):
                    return a
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + eps.astype(a.dtype)
                if a.dtype == jnp.bool_ or not perturb_ints:
                    return a
                return a ^ bit.astype(a.dtype)

            args_i = jax.tree_util.tree_map(perturb, loop_args)
            out = fn(*args_i)
            s = sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(out)
                if hasattr(l, "dtype") and l.dtype != jnp.bool_
            )
            return acc + s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # args must be jit ARGUMENTS: closed-over arrays are baked into the
    # HLO as constants (gigabytes at scene scale, and the remote compiler
    # rejects oversized programs).
    jloop = jax.jit(loop)
    _sync(jloop(args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(jloop(args))
        ts.append((time.perf_counter() - t0) * 1e3)
    wall = statistics.median(ts)
    return max(wall - floor, 0.0) / iters
