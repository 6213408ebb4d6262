"""AlphaZero losses and optimizer.

Parity with the reference (model/tensorflow/base_layers.py:12-17,
model.py:162-166, train.py:34-43):

- policy loss: mean over batch of soft cross-entropy  -sum(pi * log p)
- value loss: mean squared error to the game outcome z
- L2 penalty 1e-4 on all kernel weights (Keras l2 regularizers)
- SGD with momentum 0.9 and a piecewise-constant LR schedule keyed on the
  cumulative optimizer step count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from custom_alphazero_tpu.config import ModelConfig


def policy_loss(logits: jnp.ndarray, target_pi: jnp.ndarray) -> jnp.ndarray:
    """Soft cross-entropy vs the search policy pi.

    The reference computes -sum(pi * log(softmax + eps)) on probabilities
    (base_layers.py:12-13); on logits the numerically-stable equivalent is
    -sum(pi * log_softmax).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_pi * log_probs, axis=-1))


def value_loss(value: jnp.ndarray, target_z: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(value - target_z))


def l2_penalty(params, scale: float) -> jnp.ndarray:
    """L2 on conv/dense kernels only (Keras regularizes kernels, not
    biases/BN; base_layers.py:41,49 model.py:92-93,133-138)."""
    leaves = [
        leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if any(getattr(k, "key", None) == "kernel" for k in path)
    ]
    return scale * sum(jnp.sum(jnp.square(leaf)) for leaf in leaves)


def learning_rate_schedule(cfg: ModelConfig) -> optax.Schedule:
    """Piecewise constant LR by optimizer step (config.py:64-69)."""
    boundaries = {int(b): cfg.lr_values[i + 1] / cfg.lr_values[i]
                  for i, b in enumerate(cfg.lr_boundaries)}
    return optax.piecewise_constant_schedule(cfg.lr_values[0], boundaries)


def make_optimizer(cfg: ModelConfig) -> optax.GradientTransformation:
    sgd = optax.sgd(learning_rate_schedule(cfg), momentum=cfg.momentum)
    if cfg.grad_clip_norm > 0:
        # NOTE: toggling clipping changes the opt_state pytree, so a
        # checkpoint written with one setting cannot resume with the other.
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), sgd)
    return sgd
