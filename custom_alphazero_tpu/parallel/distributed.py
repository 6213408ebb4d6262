"""Multi-host initialization and cross-host utilities.

The reference's control plane was an HTTP run-id handshake
(/root/reference/custom_alphazero/serving/factory.py:58-66); on a TPU pod
slice the control plane is ``jax.distributed.initialize`` + the shared
filesystem, and all data-plane traffic is XLA collectives over ICI/DCN
(SURVEY.md §2 parallelism table).

Usage on a multi-host slice (one process per host, all started the same
way — e.g. via the TPU VM launcher):

    from custom_alphazero_tpu.parallel import distributed
    distributed.initialize()           # no-op on single-host
    cfg = ...                          # identical on every host
    runtime.loop.run(cfg)              # mesh covers all global devices

``jax.devices()`` then returns the global device set and
``parallel.mesh.make_mesh`` builds the (data, model) mesh across hosts;
pjit/GSPMD routes gradient and statistics reductions over ICI. Host-local
code (checkpointing, metrics, solver scoring) should be gated on
``is_coordinator()``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's multi-host runtime.

    With no arguments, honors the standard environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) and is a
    no-op when the environment describes a single process.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def broadcast_flag(value: bool) -> bool:
    """The coordinator's boolean, agreed on every host via a device psum.

    Use for host-divergent decisions that must not split the SPMD program
    across hosts — e.g. the STOP-file check (runtime/loop.py): a plain
    per-host ``os.path.exists`` can observe the file on some hosts and not
    others within the same generation boundary, leaving part of the pod
    inside the next generation's collectives (a distributed hang). Here
    every host contributes the flag only for the coordinator's devices, the
    sum is reduced on-device, and every host reads the same scalar.
    Single-host: identity."""
    if jax.process_count() == 1:
        return bool(value)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("all",))
    # device_put of a host-local array to a global sharding fills only this
    # host's addressable shards from it, so non-coordinator hosts' slots
    # carry 0 regardless of their local flag value.
    local = jnp.full(
        (len(devices),),
        float(bool(value)) if is_coordinator() else 0.0,
        jnp.float32,
    )
    arr = jax.device_put(local, NamedSharding(mesh, P("all")))
    total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(
        arr
    )
    return bool(int(total) > 0)


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier via a tiny global psum (safe under SPMD)."""
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("all",))
    ones = jax.device_put(
        jnp.ones((len(devices),)), NamedSharding(mesh, P("all"))
    )
    total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(
        ones
    )
    assert int(total) == len(devices), name
