"""Lineage strength-progression tool (tools/lineage.py): walks every
promoted ``evaluation/iteration_N`` checkpoint and scores each one on a
labeled position set, prepending the random-init baseline row."""

import os

import jax
import numpy as np

from custom_alphazero_tpu import paths
from custom_alphazero_tpu.config import Config, apply_overrides, to_json
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.io.checkpoint import (
    list_evaluation_iterations,
    save_checkpoint,
)
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.train import init_train_state
from custom_alphazero_tpu.tools.lineage import format_table, lineage_report


def _make_run(tmp_path, run_id, iterations):
    cfg = apply_overrides(Config(), {
        "model.depth": "1",
        "model.filters": "8",
        "model.value_hidden": "16",
        "run.results_dir": str(tmp_path),
        "run.run_id": run_id,
    })
    paths.create_all_directories(str(tmp_path), "connect_n", run_id)
    run_dir = paths.run_path(str(tmp_path), "connect_n", run_id)
    with open(os.path.join(run_dir, paths.CONFIG_FILE), "w") as fp:
        fp.write(to_json(cfg))
    env = ConnectN(cfg.connect_n)
    net = PolicyValueNet(env.num_actions, cfg.model)
    eval_dir = paths.evaluation_path(str(tmp_path), "connect_n", run_id)
    for i, it in enumerate(iterations):
        state = init_train_state(
            net, cfg.model, jax.random.PRNGKey(i + 1), env.obs_shape
        ).replace(steps=it)
        save_checkpoint(
            os.path.join(eval_dir, f"iteration_{it}"), state, 0.01
        )
    return cfg


def _labels(tmp_path, n=6):
    obs = np.zeros((n, 6, 7, 4), np.float32)
    obs[..., 0] = 1.0
    obs[..., 3] = 1.0
    np.savez(
        tmp_path / "labels.npz",
        obs=obs,
        optimal=np.ones((n, 7), bool),
        z=np.ones((n,), np.float32),
    )
    return str(tmp_path / "labels.npz")


def test_list_evaluation_iterations_sorted(tmp_path):
    _make_run(tmp_path, "lin1", [20, 4, 12])
    found = list_evaluation_iterations(
        paths.evaluation_path(str(tmp_path), "connect_n", "lin1")
    )
    assert [n for n, _ in found] == [4, 12, 20]


def test_lineage_report_scores_every_promotion(tmp_path):
    _make_run(tmp_path, "lin2", [4, 8])
    labels = _labels(tmp_path)
    report = lineage_report(
        "lin2", results_dir=str(tmp_path), labels=labels, probe_games=0
    )
    assert [e["iteration"] for e in report["entries"]] == [
        "random-init", 4, 8,
    ]
    # Every legal move is marked optimal in the synthetic labels, so each
    # checkpoint scores 1.0 — the tool is exercised end-to-end.
    for e in report["entries"]:
        assert e["move_accuracy"] == 1.0
        assert e["positions"] == 6
    assert report["entries"][1]["steps"] == 4
    table = format_table(report)
    assert "random-init" in table and "| 8 |" in table
