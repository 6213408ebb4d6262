"""Solver-distillation learning-capacity check (tools/distill.py).

Verifies that the net + train step can fit exact-solver targets: a small
net trained on oracle-labeled positions must reach perfect oracle move
accuracy on its training set. This isolates learning machinery from
self-play data quality (no reference analogue; the reference's only
supervised signal is self-play, self_play.py:69-78)."""

import numpy as np
import pytest

from custom_alphazero_tpu.config import ModelConfig
from custom_alphazero_tpu.tools.distill import labeled_dataset, run_distillation


@pytest.mark.slow
def test_distillation_fits_oracle_targets():
    data = labeled_dataset(80, seed=11, min_ply=16, max_ply=30)
    assert data["obs"].shape == (80, 6, 7, 4)
    assert data["pi"].shape == (80, 7)
    assert np.allclose(data["pi"].sum(1), 1.0)
    assert set(np.unique(data["z"])) <= {-1.0, 0.0, 1.0}
    # Every one-hot policy target marks a value-optimal move.
    chosen = data["pi"].argmax(1)
    assert data["optimal"][np.arange(80), chosen].all()

    result = run_distillation(
        {k: v[:64] for k, v in data.items()},
        {k: v[64:] for k, v in data.items()},
        ModelConfig(depth=2, filters=32, value_hidden=64),
        steps=300,
        batch_size=64,
        log_every=300,
    )
    assert result["train"]["move_accuracy"] == 1.0
    assert result["train"]["value_accuracy"] >= 0.95
