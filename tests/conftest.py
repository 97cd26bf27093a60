"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``xla_force_host_platform_device_count``); real-TPU benchmarking happens
separately via bench.py.

Note: a pytest plugin imports jax before this conftest runs, so the env var
alone is not enough — ``jax.config.update`` still works because the backend
is not initialized until first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
