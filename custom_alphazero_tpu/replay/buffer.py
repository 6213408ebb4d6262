"""Device-resident FIFO replay buffer.

Replaces the reference's JSON-over-HTTP sample queue + host-side capped FIFO
(/root/reference/custom_alphazero/serving/api/queue.py,
train.py:16-38, config.py:83-84) with a jit-pure ring buffer living in device
memory (shardable over the data mesh axis). Semantics preserved:

- bounded FIFO of capacity `capacity` (oldest samples evicted first),
- training waits for `min_size` samples (warmup),
- uniform batch sampling *without replacement* (reference train.py:60-69).

Observations can be stored bit-packed (replay/codec.py, ~32x less HBM —
required for chess-scale rings to stay device-resident): pass the env's
``BitplaneCodec`` to init/add/sample and the ring holds uint32 words that
are encoded at append and decoded at sample time, both on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from custom_alphazero_tpu.replay.codec import (
    BitplaneCodec,
    PackedObs,
    TopKPolicyCodec,
)
from custom_alphazero_tpu.runtime.selfplay import SelfPlayBatch


@struct.dataclass
class ReplayState:
    obs: jnp.ndarray     # (C, H, W, ch) float32, or PackedObs when a codec
    #     is in use (words (C, n_words) uint32 + scalars (C, n_scalars))
    policy: jnp.ndarray  # (C, A), or TopKPolicy when a policy codec is in
    #     use (values/indices (C, K) — sparse top-K rows for chess-scale A)
    value: jnp.ndarray   # (C,)
    head: jnp.ndarray    # () next write slot
    size: jnp.ndarray    # () filled entries, <= C


def replay_init(
    capacity: int,
    obs_shape,
    num_actions: int,
    codec: Optional[BitplaneCodec] = None,
    policy_codec: Optional[TopKPolicyCodec] = None,
) -> ReplayState:
    obs = (
        codec.packed_zeros((capacity,))
        if codec is not None
        else jnp.zeros((capacity,) + tuple(obs_shape), jnp.float32)
    )
    policy = (
        policy_codec.packed_zeros((capacity,))
        if policy_codec is not None
        else jnp.zeros((capacity, num_actions), jnp.float32)
    )
    return ReplayState(
        obs=obs,
        policy=policy,
        value=jnp.zeros((capacity,), jnp.float32),
        head=jnp.int32(0),
        size=jnp.int32(0),
    )


def replay_add(
    state: ReplayState,
    batch: SelfPlayBatch,
    codec: Optional[BitplaneCodec] = None,
    policy_codec: Optional[TopKPolicyCodec] = None,
) -> ReplayState:
    """Masked FIFO append: valid samples land at consecutive ring slots in
    order; invalid rows scatter out-of-bounds and are dropped by XLA.

    When one batch holds more than `capacity` valid samples (e.g. chess
    defaults: 256 games x 512 plies >> a 10k ring), only the NEWEST
    `capacity` are written — wrapped slots would otherwise duplicate, and
    XLA keeps an arbitrary duplicate, silently mixing old and new rows."""
    capacity = state.value.shape[0]
    mask = batch.valid
    total = mask.sum().astype(jnp.int32)
    offsets = jnp.cumsum(mask.astype(jnp.int32)) - 1
    mask = mask & (offsets >= total - capacity)
    # Re-rank the surviving samples from 0 so slots stay consecutive.
    offsets = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slots = jnp.where(mask, (state.head + offsets) % capacity, capacity)
    count = mask.sum().astype(jnp.int32)
    # The generation may already have packed its observations in-scan
    # (selfplay obs_codec — the chess-scale memory fix); accept either.
    already_packed = isinstance(batch.obs, PackedObs)
    if codec is not None and not already_packed:
        obs_rows = codec.encode(batch.obs)
    else:
        obs_rows = batch.obs
    policy_rows = (
        policy_codec.encode(batch.policy)
        if policy_codec is not None else batch.policy
    )
    return state.replace(
        obs=jax.tree.map(
            lambda store, rows: store.at[slots].set(rows), state.obs, obs_rows
        ),
        policy=jax.tree.map(
            lambda store, rows: store.at[slots].set(rows),
            state.policy, policy_rows,
        ),
        value=state.value.at[slots].set(batch.value),
        head=(state.head + count) % capacity,
        size=jnp.minimum(state.size + count, capacity),
    )


def replay_sample(
    state: ReplayState,
    rng,
    batch_size: int,
    codec: Optional[BitplaneCodec] = None,
    policy_codec: Optional[TopKPolicyCodec] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform sample of `batch_size` entries without replacement
    (Gumbel-top-k over the filled region). Requires size >= batch_size —
    enforced by the warmup gate like the reference (train.py:59)."""
    capacity = state.value.shape[0]
    scores = jax.random.uniform(rng, (capacity,))
    scores = jnp.where(jnp.arange(capacity) < state.size, scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, batch_size)
    obs = jax.tree.map(lambda a: a[idx], state.obs)
    if codec is not None:
        obs = codec.decode(obs)
    policy = jax.tree.map(lambda a: a[idx], state.policy)
    if policy_codec is not None:
        policy = policy_codec.decode(policy)
    return obs, policy, state.value[idx]
