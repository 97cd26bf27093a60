"""Device-time measurement that works through the high-latency axon tunnel.

``block_until_ready`` does not block on the tunneled backend and any D2H
sync costs ~28 ms round-trip, so single-shot wall timing is useless. Instead
an op is run ``iters`` times inside one jitted ``lax.fori_loop`` (with an
iteration-dependent input perturbation so XLA cannot hoist it), synced once
via a scalar fetch, and the tunnel floor is subtracted.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _sync(x) -> float:
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def measure_floor(reps: int = 5) -> float:
    """Median round-trip time of a trivial synced computation, ms."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    _sync(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def device_time(fn, *args, iters: int = 20, floor: float | None = None) -> float:
    """Per-call device time of ``fn(*args)`` in ms.

    ``fn`` must return a pytree whose first leaf is float-convertible. The op
    runs ``iters`` times in a fori_loop; a scalar derived from each iteration's
    output is accumulated so no iteration can be dead-code-eliminated.
    """
    if floor is None:
        floor = measure_floor()

    def loop(args):
        def body(i, acc):
            # Perturb EVERY input by an i-dependent value so XLA cannot
            # hoist the (otherwise loop-invariant) op out of the loop:
            # floats get +i*1e-30, ints get ^ (i & 1). Perturbing only
            # floats lets integer-only ops (sorts, scans, scatters) be
            # hoisted and measured as ~free — a bug that produced bogus
            # "fast path" readings in early measurement rounds.
            eps = i.astype(jnp.float32) * jnp.float32(1e-30)
            bit = (i & 1).astype(jnp.int32)

            def perturb(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + eps.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.integer):
                    return a ^ bit.astype(a.dtype)
                return a

            args_i = jax.tree_util.tree_map(perturb, args)
            out = fn(*args_i)
            # Consume the FULL output (sum) — consuming one element lets
            # XLA dead-code-eliminate most of the op (slice-of-dot etc.).
            s = sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(out)
            )
            return acc + s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jl = jax.jit(loop)
    _sync(jl(args))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(jl(args))
        ts.append((time.perf_counter() - t0) * 1e3)
    wall = sorted(ts)[len(ts) // 2]
    return max(wall - floor, 0.0) / iters
