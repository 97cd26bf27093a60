"""Persistent XLA compilation cache (compile-time attack, VERDICT r1 #7).

The packed pipeline's jit graph takes 90-120 s to compile at 1080p/3M on
this backend; the reference recompiles nothing at runtime (its kernels are
AOT, ``canvas.cpp:198-224`` resizes instantly). JAX's persistent
compilation cache makes the second process-lifetime of any (shape, config)
bucket load from disk instead of recompiling — sessions, benches, and
resize buckets all benefit across process restarts.

Call :func:`enable_compilation_cache` before the first jit execution.
Safe to call multiple times; never raises (some backends — including
remote-compile relays — may not support it; the renderer must not care).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "GR_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/gaussianrenderer_tpu/xla")
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Enable the JAX persistent compilation cache; returns success."""
    global _enabled
    if _enabled:
        return True
    try:
        import jax

        path = cache_dir or _DEFAULT_DIR
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took meaningful time; tiny programs are
        # cheaper to recompile than to hash + deserialize.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # knob renamed/absent on some jax versions
        _enabled = True
        return True
    except Exception:
        return False
