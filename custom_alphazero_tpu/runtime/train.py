"""Training step + state.

Replaces the reference trainer (model/tensorflow/train.py:14-44: one
``model.fit`` on a 256-sample batch per iteration, step-count-driven LR,
L2-regularized SGD+momentum) with a jit-pure gradient step over the Flax
policy-value net. Under a sharded mesh the same function is the data-parallel
learner: jit + NamedSharding inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from custom_alphazero_tpu.config import ModelConfig
from custom_alphazero_tpu.models.losses import (
    l2_penalty,
    learning_rate_schedule,
    make_optimizer,
    policy_loss,
    value_loss,
)
from custom_alphazero_tpu.models.policy_value import PolicyValueNet


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    steps: jnp.ndarray  # cumulative optimizer steps (reference model.steps)


class TrainMetrics(NamedTuple):
    loss: jnp.ndarray
    policy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    l2: jnp.ndarray
    learning_rate: jnp.ndarray
    steps: jnp.ndarray
    # Auxiliary solver-value MSE (0 when the aux target is off,
    # LoopConfig.solver_labels_path). Default is a HOST scalar on
    # purpose: a jnp scalar here would initialize an XLA backend at
    # import time, which breaks jax.distributed.initialize ordering in
    # multi-process entrypoints (tests/test_multihost.py).
    solver_value_loss: Any = 0.0
    # Auxiliary labeled-policy cross-entropy (0 when off,
    # LoopConfig.solver_policy_weight) — same host-scalar default rule.
    solver_policy_loss: Any = 0.0


def init_train_state(
    net: PolicyValueNet, cfg: ModelConfig, rng, obs_shape
) -> TrainState:
    variables = net.init(rng, jnp.zeros((1,) + tuple(obs_shape)), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    optimizer = make_optimizer(cfg)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        steps=jnp.int32(0),
    )


def make_train_step(
    net: PolicyValueNet, cfg: ModelConfig, aux_value_weight: float = 0.0,
    aux_value_batch: int = 256, aux_policy_weight: float = 0.0,
) -> Callable[..., Tuple[TrainState, TrainMetrics]]:
    """The jit-pure gradient step. With ``aux_value_weight > 0`` the
    returned step takes extra args — ``(rng, aux_obs, aux_z[, aux_pi])``,
    the full device-resident labeled arrays (LoopConfig
    .solver_labels_path) — and adds ``weight * MSE(value(aux_batch),
    exact_z)`` to the loss, drawing a fresh uniform row subset each step;
    with ``aux_policy_weight > 0`` the same subset also contributes
    ``weight * CE(policy(aux_batch), aux_pi)`` (round 5: engine-labeled
    tactics / oracle-policy distillation). The aux forward runs in eval
    mode (no batch_stats mutation): the labeled set's distribution must
    not steer the BN running stats that self-play inference uses."""
    optimizer = make_optimizer(cfg)
    schedule = learning_rate_schedule(cfg)

    def train_step(state: TrainState, obs, target_pi, target_z,
                   rng=None, aux_obs=None, aux_z=None, aux_pi=None):
        def loss_fn(params):
            (logits, value), mutated = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                obs,
                train=True,
                mutable=["batch_stats"],
            )
            lp = policy_loss(logits, target_pi)
            lv = value_loss(value, target_z)
            l2 = l2_penalty(params, cfg.l2)
            laux = jnp.float32(0.0)
            laux_pi = jnp.float32(0.0)
            if aux_value_weight > 0.0 or aux_policy_weight > 0.0:
                n = aux_obs.shape[0]
                k = min(n, aux_value_batch)
                idx = jax.random.randint(rng, (k,), 0, n)
                aux_logits, aux_value = net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    jnp.take(aux_obs, idx, axis=0),
                    train=False,
                )
                if aux_value_weight > 0.0:
                    laux = value_loss(
                        aux_value, jnp.take(aux_z, idx, axis=0)
                    )
                if aux_policy_weight > 0.0:
                    laux_pi = policy_loss(
                        aux_logits, jnp.take(aux_pi, idx, axis=0)
                    )
            total = (lp + lv + l2 + aux_value_weight * laux
                     + aux_policy_weight * laux_pi)
            return total, (lp, lv, l2, laux, laux_pi,
                           mutated["batch_stats"])

        (loss, (lp, lv, l2, laux, laux_pi, batch_stats)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            steps=state.steps + 1,
        )
        metrics = TrainMetrics(
            loss=loss, policy_loss=lp, value_loss=lv, l2=l2,
            learning_rate=schedule(state.steps), steps=new_state.steps,
            solver_value_loss=laux, solver_policy_loss=laux_pi,
        )
        return new_state, metrics

    return train_step


def make_evaluate_fn(net: PolicyValueNet):
    """Wrap net variables into the MCTS leaf-evaluation closure: full softmax
    probabilities + value, matching the reference net output contract
    (model/tensorflow/model.py:182-188); legal masking happens in expand."""

    def evaluate(params, batch_stats, obs):
        logits, value = net.apply(
            {"params": params, "batch_stats": batch_stats}, obs, train=False
        )
        return jax.nn.softmax(logits, axis=-1), value

    return evaluate
