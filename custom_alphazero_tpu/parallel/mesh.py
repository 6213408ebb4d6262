"""Device mesh + sharding utilities.

The TPU-native replacement for the reference's entire distribution story
(HTTP serving tier + joblib process fan-out + per-role CUDA_VISIBLE_DEVICES
pinning, SURVEY.md §2 parallelism inventory): games/batches are sharded over
a ``data`` mesh axis, parameters are replicated over ``data`` and optionally
tensor-sharded over a ``model`` axis, and XLA's GSPMD partitioner inserts the
gradient all-reduce (psum over ICI) from the sharding annotations — no
explicit collectives in user code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from custom_alphazero_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    mp = max(cfg.model_parallelism, 1)
    dp = cfg.data_parallelism or max(len(devices) // mp, 1)
    if dp * mp > len(devices):
        raise ValueError(
            f"Mesh {dp}x{mp} needs {dp * mp} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Shard the leading (games / batch) axis over `data`."""
    return NamedSharding(mesh, P(cfg.data_axis))


def shard_batch(tree, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Place a pytree of batched arrays with the leading axis over `data`."""
    sharding = data_sharding(mesh, cfg)
    return jax.device_put(tree, sharding)


def shard_params(params, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Place network parameters: replicated over `data`; Dense kernels
    column-sharded over `model` when model_parallelism > 1 (tensor
    parallelism for the policy/value head matmuls — the net's only large
    matmuls; conv filters stay replicated, they are small)."""

    def spec_for(path, leaf) -> P:
        if cfg.model_parallelism > 1 and leaf.ndim == 2:
            is_kernel = any(getattr(k, "key", None) == "kernel" for k in path)
            if is_kernel and leaf.shape[-1] % cfg.model_parallelism == 0:
                return P(None, cfg.model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, spec_for(path, leaf))
        ),
        params,
    )


def local_batch_size(global_batch: int, mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> int:
    dp = mesh.shape[cfg.data_axis]
    if global_batch % dp:
        raise ValueError(f"batch {global_batch} not divisible by data axis {dp}")
    return global_batch // dp
