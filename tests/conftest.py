"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``xla_force_host_platform_device_count``); real-TPU benchmarking happens
separately via bench.py.

Note: a pytest plugin imports jax before this conftest runs, so the env var
alone is not enough — ``jax.config.update`` still works because the backend
is not initialized until first use.
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic persistent-compile-cache dir: the default is shared with any
# concurrently running TPU bench/session processes, and a concurrent
# writer once segfaulted the suite inside the cache READ path
# (jax compilation_cache.get_executable_and_time). CPU test compiles are
# cheap; isolation costs nothing.
os.environ["GR_TPU_COMPILE_CACHE"] = tempfile.mkdtemp(
    prefix="gr_test_xla_cache_"
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache is OFF for the suite: serializing
# some CPU executables segfaulted jax 0.9 (observed in both the cache
# READ path — stale entry from a concurrent TPU writer — and the WRITE
# path, racing Canvas.init's prewarm thread which AOT-compiles
# concurrently with the main thread). Tests that call
# enable_compilation_cache() still exercise that code path (it sets the
# dir), but this master switch keeps the cache inert; CPU test compiles
# are cheap.
jax.config.update("jax_enable_compilation_cache", False)
