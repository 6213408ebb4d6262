"""Strength evaluation vs the exact solver: the oracle policy must be
move-perfect; weak policies must score lower; arena logs replay correctly."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.config import ArenaConfig, ConnectNConfig, MCTSConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.runtime.arena import make_arena_fn
from custom_alphazero_tpu.solver import make_solver_evaluate_fn
from custom_alphazero_tpu.tools.strength import evaluate_strength, score_arena_log

ENV = ConnectN(ConnectNConfig())
A = ENV.num_actions


def uniform_eval(obs):
    return jnp.ones((obs.shape[0], A)) / A, jnp.zeros((obs.shape[0],))


def test_oracle_policy_is_move_perfect():
    oracle = make_solver_evaluate_fn(A)
    # MCTS with oracle priors, few sims, vs random opponent; start from
    # midgame-ish states by letting the random opponent reply. All tested
    # moves must be value-optimal and every game must be won (first mover
    # has a theoretical win on 7x6).
    report = evaluate_strength(
        ENV, oracle, num_games=2, use_mcts=True,
        mcts_cfg=MCTSConfig(simulations=12),
        opponent="random", seed=1, max_positions=8,
    )
    # Perfect play from whatever the random opening left behind: every
    # scored move is value-optimal (the opening may have surrendered the
    # theoretical win, so game results are not asserted).
    assert report["positions"] > 0
    assert report["move_accuracy"] == 1.0
    assert report["blunders"] == 0


def test_uniform_policy_is_imperfect():
    report = evaluate_strength(
        ENV, uniform_eval, num_games=3, use_mcts=False,
        opponent="random", seed=3, max_positions=18,
    )
    assert report["positions"] > 0
    assert report["move_accuracy"] < 1.0  # raw argmax of uniform is poor
    assert 0.0 <= report["mean_rank_score"] <= 1.0


def test_score_arena_log_bounds():
    arena = make_arena_fn(ENV, ArenaConfig(), MCTSConfig(), max_plies=42)
    result = jax.jit(lambda k: arena(uniform_eval, uniform_eval, k, 6))(
        jax.random.PRNGKey(0)
    )
    score = score_arena_log(jax.device_get(result.log))
    assert 0.0 < score <= 1.0


def test_run_report_summarizes_metrics(tmp_path):
    import json
    import os

    from custom_alphazero_tpu import paths
    from custom_alphazero_tpu.tools.run_report import load, summarize

    tb = paths.tensorboard_path(str(tmp_path), "connect_n", "r")
    os.makedirs(tb)
    rows = (
        [{"tag": "train/loss", "step": i, "value": 3.0 - i * 0.01,
          "wall_time": 0} for i in range(1, 101)]
        + [{"tag": "self_play/games", "step": 1, "value": 64, "wall_time": 0}]
        + [{"tag": "self_play/samples", "step": 1, "value": 900, "wall_time": 0}]
        + [{"tag": "evaluation/winning_score", "step": 50, "value": 0.6,
            "wall_time": 0},
           {"tag": "evaluation/winning_score", "step": 100, "value": 0.5,
            "wall_time": 0}]
        + [{"tag": "evaluation/solver_score", "step": 50, "value": 0.7,
            "wall_time": 0}]
    )
    with open(os.path.join(tb, "metrics.jsonl"), "w") as fp:
        for r in rows:
            fp.write(json.dumps(r) + "\n")
    report = summarize(load(str(tmp_path), "connect_n", "r"))
    assert report["steps"] == 100
    assert report["loss_first"] > report["loss_last"]
    assert report["generations"] == 1 and report["games_total"] == 64
    assert report["promotions"] == 1 and report["arenas"] == 2
    assert report["solver_score_history"] == [(50, 0.7)]
