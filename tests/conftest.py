"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding code is exercised without TPU hardware (the strategy the
reference has no analogue of — it ships zero tests, SURVEY.md §4).

Note: the driver environment pre-imports jax via sitecustomize with
JAX_PLATFORMS pinned to the TPU tunnel, so env vars set here are too late —
the overrides must go through jax.config.update(), which still works because
no backend has been initialized yet when conftest loads.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn

import jax  # noqa: E402 (already imported by sitecustomize — config still open)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache: recompiles across pytest runs are the
# dominant cost on small CPU hosts.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
