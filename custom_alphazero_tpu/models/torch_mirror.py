"""PyTorch mirror of the policy-value network.

The reference ships a second-framework implementation of its model
(/root/reference/custom_alphazero/model/pytorch/ — feature-complete but
disconnected from the pipeline). The capability it represents — the same
network, loadable in another framework — is provided here *with weight
portability*: ``export_to_torch`` converts trained Flax parameters into a
torch module whose outputs match the JAX forward bit-for-bit-ish (fp32,
eval-mode BN), verified by tests/test_torch_mirror.py. Useful for serving
from CPU/CUDA stacks without JAX.

torch is an optional dependency: import of this module requires it, the
rest of the framework never does.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import torch
import torch.nn as nn

from custom_alphazero_tpu.config import ModelConfig


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout, kernel=3):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, padding=kernel // 2)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x, activate=True):
        x = self.bn(self.conv(x))
        return torch.relu(x) if activate else x


class TorchResidualBlock(nn.Module):
    def __init__(self, filters):
        super().__init__()
        self.conv1 = TorchConvBlock(filters, filters)
        self.conv2 = TorchConvBlock(filters, filters)
        self.proj = TorchConvBlock(filters, filters, kernel=1)

    def forward(self, x):
        y = self.conv1(x)
        y = self.conv2(y, activate=False)
        identity = self.proj(x, activate=False)
        return torch.relu(identity + y)


class TorchPolicyValueNet(nn.Module):
    """NHWC-in (like the JAX net); flattens in NHWC order so Flax dense
    kernels transfer directly (the reference torch model permutes the same
    way, model/pytorch/model.py:167-172)."""

    def __init__(self, in_channels: int, num_actions: int,
                 cfg: ModelConfig = ModelConfig(),
                 board_hw: tuple = (6, 7)):
        super().__init__()
        self.cfg = cfg
        h, w = board_hw
        self.stem = TorchConvBlock(in_channels, cfg.filters)
        self.blocks = nn.ModuleList(
            [TorchResidualBlock(cfg.filters) for _ in range(cfg.depth)]
        )
        self.policy_conv = TorchConvBlock(cfg.filters, cfg.policy_filters, 1)
        self.policy_dense = nn.Linear(cfg.policy_filters * h * w, num_actions)
        self.value_conv = TorchConvBlock(cfg.filters, cfg.value_filters, 1)
        self.value_dense1 = nn.Linear(cfg.value_filters * h * w, cfg.value_hidden)
        self.value_dense2 = nn.Linear(cfg.value_hidden, 1)

    def forward(self, obs_nhwc):
        x = obs_nhwc.permute(0, 3, 1, 2)  # NHWC -> NCHW
        x = self.stem(x)
        for block in self.blocks:
            x = block(x)
        p = self.policy_conv(x).permute(0, 2, 3, 1).flatten(1)  # NHWC flatten
        logits = self.policy_dense(p)
        v = self.value_conv(x).permute(0, 2, 3, 1).flatten(1)
        v = torch.relu(self.value_dense1(v))
        value = torch.tanh(self.value_dense2(v))[:, 0]
        return logits, value


def _to_torch(x) -> torch.Tensor:
    # Copy: jax buffers arrive as non-writable numpy views, which torch
    # cannot safely wrap (it warns and later writes would be UB).
    return torch.from_numpy(np.array(x, dtype=np.float32))


def _load_conv_block(block: TorchConvBlock, params: Any, stats: Any) -> None:
    # Flax Conv kernel (kh, kw, cin, cout) -> torch (cout, cin, kh, kw).
    block.conv.weight.data = _to_torch(params["Conv_0"]["kernel"]).permute(
        3, 2, 0, 1
    )
    block.conv.bias.data = _to_torch(params["Conv_0"]["bias"])
    bn_p, bn_s = params["BatchNorm_0"], stats["BatchNorm_0"]
    block.bn.weight.data = _to_torch(bn_p["scale"])
    block.bn.bias.data = _to_torch(bn_p["bias"])
    block.bn.running_mean.data = _to_torch(bn_s["mean"])
    block.bn.running_var.data = _to_torch(bn_s["var"])


def export_to_torch(flax_params: Any, flax_batch_stats: Any,
                    in_channels: int, num_actions: int,
                    cfg: ModelConfig = ModelConfig(),
                    board_hw: tuple = (6, 7)) -> TorchPolicyValueNet:
    """Build a torch mirror initialized from trained Flax variables."""
    net = TorchPolicyValueNet(in_channels, num_actions, cfg, board_hw)
    p, s = flax_params, flax_batch_stats

    _load_conv_block(net.stem, p["ConvBlock_0"], s["ConvBlock_0"])
    for i, block in enumerate(net.blocks):
        bp = p[f"ResidualBlock_{i}"]
        bs = s[f"ResidualBlock_{i}"]
        _load_conv_block(block.conv1, bp["ConvBlock_0"], bs["ConvBlock_0"])
        _load_conv_block(block.conv2, bp["ConvBlock_1"], bs["ConvBlock_1"])
        _load_conv_block(block.proj, bp["ConvBlock_2"], bs["ConvBlock_2"])

    _load_conv_block(
        net.policy_conv, p[f"ConvBlock_{1}"], s[f"ConvBlock_{1}"]
    )
    # Flax Dense kernel (in, out) -> torch Linear (out, in).
    net.policy_dense.weight.data = _to_torch(p["Dense_0"]["kernel"]).T
    net.policy_dense.bias.data = _to_torch(p["Dense_0"]["bias"])
    _load_conv_block(net.value_conv, p["ConvBlock_2"], s["ConvBlock_2"])
    net.value_dense1.weight.data = _to_torch(p["Dense_1"]["kernel"]).T
    net.value_dense1.bias.data = _to_torch(p["Dense_1"]["bias"])
    net.value_dense2.weight.data = _to_torch(p["Dense_2"]["kernel"]).T
    net.value_dense2.bias.data = _to_torch(p["Dense_2"]["bias"])
    net.eval()
    return net
