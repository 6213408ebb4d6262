"""Cross-framework parity: the torch mirror of the policy-value net must
reproduce the Flax forward from exported weights (capability parity with the
reference's model/pytorch second-framework implementation)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from custom_alphazero_tpu.config import ConnectNConfig, ModelConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.models.torch_mirror import export_to_torch


def test_torch_mirror_matches_flax():
    env = ConnectN(ConnectNConfig())
    cfg = dataclasses.replace(
        ModelConfig(depth=2, filters=16, value_hidden=32),
        compute_dtype="float32",
    )
    net = PolicyValueNet(env.num_actions, cfg)
    variables = net.init(
        jax.random.PRNGKey(7), jnp.zeros((1,) + env.obs_shape), train=False
    )
    # Non-trivial batch stats: run a few train-mode updates first.
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.random((16,) + env.obs_shape), jnp.float32)
    _, mutated = net.apply(variables, obs, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}

    ref_logits, ref_value = jax.device_get(
        net.apply(variables, obs, train=False)
    )
    mirror = export_to_torch(
        variables["params"], variables["batch_stats"],
        in_channels=env.obs_shape[-1], num_actions=env.num_actions,
        cfg=cfg, board_hw=env.obs_shape[:2],
    )
    with torch.no_grad():
        got_logits, got_value = mirror(torch.from_numpy(np.asarray(obs)))
    np.testing.assert_allclose(ref_logits, got_logits.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ref_value, got_value.numpy(),
                               rtol=2e-4, atol=2e-5)
