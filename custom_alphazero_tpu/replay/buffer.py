"""Device-resident FIFO replay buffer.

Replaces the reference's JSON-over-HTTP sample queue + host-side capped FIFO
(/root/reference/custom_alphazero/serving/api/queue.py,
train.py:16-38, config.py:83-84) with a jit-pure ring buffer living in device
memory (shardable over the data mesh axis). Semantics preserved:

- bounded FIFO of capacity `capacity` (oldest samples evicted first),
- training waits for `min_size` samples (warmup),
- uniform batch sampling *without replacement* (reference train.py:60-69).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from custom_alphazero_tpu.runtime.selfplay import SelfPlayBatch


@struct.dataclass
class ReplayState:
    obs: jnp.ndarray     # (C, H, W, ch)
    policy: jnp.ndarray  # (C, A)
    value: jnp.ndarray   # (C,)
    head: jnp.ndarray    # () next write slot
    size: jnp.ndarray    # () filled entries, <= C


def replay_init(capacity: int, obs_shape, num_actions: int) -> ReplayState:
    return ReplayState(
        obs=jnp.zeros((capacity,) + tuple(obs_shape), jnp.float32),
        policy=jnp.zeros((capacity, num_actions), jnp.float32),
        value=jnp.zeros((capacity,), jnp.float32),
        head=jnp.int32(0),
        size=jnp.int32(0),
    )


def replay_add(state: ReplayState, batch: SelfPlayBatch) -> ReplayState:
    """Masked FIFO append: valid samples land at consecutive ring slots in
    order; invalid rows scatter out-of-bounds and are dropped by XLA.

    When one batch holds more than `capacity` valid samples (e.g. chess
    defaults: 256 games x 512 plies >> a 10k ring), only the NEWEST
    `capacity` are written — wrapped slots would otherwise duplicate, and
    XLA keeps an arbitrary duplicate, silently mixing old and new rows."""
    capacity = state.obs.shape[0]
    mask = batch.valid
    total = mask.sum().astype(jnp.int32)
    offsets = jnp.cumsum(mask.astype(jnp.int32)) - 1
    mask = mask & (offsets >= total - capacity)
    # Re-rank the surviving samples from 0 so slots stay consecutive.
    offsets = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slots = jnp.where(mask, (state.head + offsets) % capacity, capacity)
    count = mask.sum().astype(jnp.int32)
    return state.replace(
        obs=state.obs.at[slots].set(batch.obs),
        policy=state.policy.at[slots].set(batch.policy),
        value=state.value.at[slots].set(batch.value),
        head=(state.head + count) % capacity,
        size=jnp.minimum(state.size + count, capacity),
    )


def replay_sample(
    state: ReplayState, rng, batch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform sample of `batch_size` entries without replacement
    (Gumbel-top-k over the filled region). Requires size >= batch_size —
    enforced by the warmup gate like the reference (train.py:59)."""
    capacity = state.obs.shape[0]
    scores = jax.random.uniform(rng, (capacity,))
    scores = jnp.where(jnp.arange(capacity) < state.size, scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, batch_size)
    return state.obs[idx], state.policy[idx], state.value[idx]
