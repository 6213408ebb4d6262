"""Flax policy-value residual network.

Re-implements the reference TF2 Keras architecture
(/root/reference/custom_alphazero/model/tensorflow/model.py:152-218,
base_layers.py:20-125) as a Flax linen module designed for the TPU MXU:

- Residual tower: an initial conv->BN->relu block, then ``depth`` residual
  blocks of (conv->BN->relu, conv->BN) + a 1x1-conv-BN projection of the
  block input, added then relu'd (the reference's OuterConvBlock always
  projects the identity through a 1x1 conv, base_layers.py:101-113 — kept
  for architecture parity).
- Policy head: 1x1 conv (2 filters) -> BN -> relu -> flatten -> dense to the
  action space; emits *logits* (the reference bakes softmax into the dense,
  model.py:90-95 — we apply legal-move masking + softmax outside, which is
  both more numerically sound and lets search fold masking in).
- Value head: 1x1 conv (1 filter) -> BN -> relu -> flatten -> dense(256)
  -> relu -> dense(1) -> tanh (model.py:106-149).

Compute runs in bfloat16 on the MXU with float32 parameters and heads'
final dense in float32 for stable losses.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from custom_alphazero_tpu.config import ModelConfig


class ConvBlock(nn.Module):
    """conv -> BN -> optional relu (reference InnerConvBlock,
    base_layers.py:20-66)."""

    filters: int
    kernel: Tuple[int, int] = (3, 3)
    activate: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, self.kernel, padding="SAME", use_bias=True,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        if self.activate:
            x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    """Two 3x3 convs + 1x1 projected identity, add, relu (reference
    OuterConvBlock, base_layers.py:69-125)."""

    filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBlock(self.filters, dtype=self.dtype)(x, train)
        y = ConvBlock(self.filters, activate=False, dtype=self.dtype)(y, train)
        identity = ConvBlock(self.filters, kernel=(1, 1), activate=False,
                             dtype=self.dtype)(x, train)
        return nn.relu(identity + y)


class PolicyValueNet(nn.Module):
    """Trunk + policy/value heads. Returns (policy_logits, value)."""

    num_actions: int
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, obs, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x = obs.astype(dtype)
        x = ConvBlock(cfg.filters, dtype=dtype)(x, train)
        for _ in range(cfg.depth):
            x = ResidualBlock(cfg.filters, dtype=dtype)(x, train)

        p = ConvBlock(cfg.policy_filters, kernel=(1, 1), dtype=dtype)(x, train)
        p = p.reshape((p.shape[0], -1))
        logits = nn.Dense(self.num_actions, dtype=jnp.float32)(p.astype(jnp.float32))

        v = ConvBlock(cfg.value_filters, kernel=(1, 1), dtype=dtype)(x, train)
        v = v.reshape((v.shape[0], -1))
        v = nn.relu(nn.Dense(cfg.value_hidden, dtype=dtype)(v))
        v = nn.Dense(1, dtype=jnp.float32)(v.astype(jnp.float32))
        value = jnp.tanh(v)[:, 0]
        return logits, value


def masked_policy(logits: jnp.ndarray, legal_mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over legal actions only; illegal actions get probability 0.

    Replaces the reference's post-hoc mask-and-renormalize of softmax output
    (mcts/mcts.py:148-150, mcts/utils.py:4-16). If every action is illegal
    (terminal state), returns the uniform distribution like the reference's
    normalize_probabilities fallback.
    """
    neg_inf = jnp.finfo(logits.dtype).min
    masked = jnp.where(legal_mask, logits, neg_inf)
    probs = jnp.where(
        legal_mask.any(axis=-1, keepdims=True),
        nn.softmax(masked, axis=-1),
        jnp.ones_like(logits) / logits.shape[-1],
    )
    return probs
