"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding code is exercised without TPU hardware (the strategy the
reference has no analogue of — it ships zero tests, SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere. Hard override: the driver
# environment pins JAX_PLATFORMS to the TPU tunnel, which would route every
# test op through it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache: recompiles across pytest runs are the
# dominant cost on small CPU hosts.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
