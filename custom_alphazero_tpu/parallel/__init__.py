"""Mesh + sharding utilities."""

from custom_alphazero_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
