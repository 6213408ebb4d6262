"""End-to-end actor-learner loop test (runtime/loop.py): a tiny real run on
the CPU mesh — self-play generations, training iterations, arena gating,
checkpointing — then resume, and model loading through the strength tool."""

import numpy as np
import pytest

from custom_alphazero_tpu.config import Config, apply_overrides


def _tiny_cfg(tmp_path, run_id, generations):
    overrides = {
        "mcts.simulations": "8",
        "self_play.games_per_generation": "8",
        "model.depth": "1",
        "model.filters": "8",
        "model.value_hidden": "16",
        "model.batch_size": "16",
        "replay.capacity": "2000",
        "replay.min_size": "32",
        "loop.train_iterations_per_generation": "2",
        "loop.generations": str(generations),
        "loop.samples_checkpoint_frequency": "2",
        "arena.games": "8",
        "arena.evaluation_frequency": "4",
        "arena.checkpoint_frequency": "4",
        "run.results_dir": str(tmp_path),
        "run.run_id": run_id,
    }
    return apply_overrides(Config(), overrides)


@pytest.mark.slow
def test_loop_end_to_end_and_resume(tmp_path):
    from custom_alphazero_tpu.runtime.loop import run
    from custom_alphazero_tpu.tools.strength import (
        labeled_policy_accuracy,
        load_run_model,
    )

    summary = run(_tiny_cfg(tmp_path, "t1", 3))
    assert summary["iterations"] == 6
    assert summary["last_arena_score"] is not None

    # Resume: steps continue from the checkpoint, not from zero.
    summary2 = run(_tiny_cfg(tmp_path, "t1", 2))
    assert summary2["iterations"] > 6

    # The training checkpoint loads through the strength tool; an arena
    # checkpoint (winner lineage) exists and loads as "best".
    env, evaluate_fn, cfg, meta = load_run_model(
        "t1", str(tmp_path), which="last"
    )
    assert meta["steps"] >= 6
    env, evaluate_fn, cfg, meta = load_run_model(
        "t1", str(tmp_path), which="best"
    )
    assert meta["iteration"] >= 4

    # labeled_policy_accuracy consumes a labels npz (synthetic here).
    obs = np.zeros((4, 6, 7, 4), np.float32)
    obs[..., 0] = 1.0  # empty board planes
    obs[..., 3] = 1.0
    labels = {
        "obs": obs,
        "optimal": np.ones((4, 7), bool),
        "z": np.ones((4,), np.float32),
    }
    npz = tmp_path / "labels.npz"
    np.savez(npz, **labels)
    acc = labeled_policy_accuracy(evaluate_fn, str(npz))
    assert acc["move_accuracy"] == 1.0  # every column marked optimal
    assert acc["positions"] == 4


@pytest.mark.slow
def test_stop_file_graceful_exit_and_final_checkpoint(tmp_path):
    """A STOP file in the run dir stops the loop before the next
    generation, a final checkpoint makes the exit state resumable, and a
    resume consumes the stale STOP file and keeps training."""
    import os

    from custom_alphazero_tpu import paths
    from custom_alphazero_tpu.io.checkpoint import checkpoint_exists
    from custom_alphazero_tpu.runtime.loop import run

    run_dir = paths.run_path(str(tmp_path), "connect_n", "t2")
    os.makedirs(run_dir)
    open(os.path.join(run_dir, "STOP"), "w").close()

    # Pre-existing STOP is consumed at startup: the run still trains.
    summary = run(_tiny_cfg(tmp_path, "t2", 2))
    assert summary["iterations"] == 4
    assert not os.path.exists(os.path.join(run_dir, "STOP"))
    # Final checkpoint exists even though 4 iterations is not a
    # checkpoint_frequency boundary multiple... (freq=4: it is; assert
    # resumability directly instead).
    assert checkpoint_exists(
        paths.training_path(str(tmp_path), "connect_n", "t2")
    )

    # Mid-run STOP: a run-forever loop (generations=0) must exit cleanly
    # once the operator touches the file.
    import threading
    import time as _time

    done = {}

    def _run_forever():
        done["summary"] = run(_tiny_cfg(tmp_path, "t2", 0))

    t = threading.Thread(target=_run_forever)
    t.start()
    deadline = _time.time() + 120
    # Wait until it has made progress past the resumed 4 iterations...
    marker = os.path.join(run_dir, "STOP")
    while _time.time() < deadline and not done:
        _time.sleep(0.5)
        open(marker, "w").close()
    t.join(timeout=120)
    assert not t.is_alive(), "loop did not honor mid-run STOP"
    assert done["summary"]["iterations"] >= 4


def test_loop_with_solver_aux_value_target(tmp_path):
    """LoopConfig.solver_labels_path mixes an exact-value MSE term into
    every train step (VERDICT r3 next-round #3 lever (a)): the loop loads
    the labels, reports train/solver_value_loss, and runs end to end."""
    import jax
    import numpy as np

    from custom_alphazero_tpu.runtime.loop import run

    rng = np.random.default_rng(0)
    labels = {
        "obs": rng.standard_normal((64, 6, 7, 4)).astype(np.float32),
        "z": rng.choice([-1.0, 0.0, 1.0], 64).astype(np.float32),
    }
    path = tmp_path / "labels.npz"
    np.savez(path, **labels)

    cfg = _tiny_cfg(tmp_path, "aux1", 2)
    cfg = apply_overrides(cfg, {
        "loop.solver_labels_path": str(path),
        "loop.solver_value_weight": "0.5",
        "loop.solver_value_batch": "16",
    })
    summary = run(cfg)
    assert summary["iterations"] == 4

    # The scalar is in the metrics stream (tensorboard event files exist
    # and the loop printed it); cheapest check: a fresh Learner exposes
    # the loaded labels and an aux-aware train step.
    from custom_alphazero_tpu.runtime.loop import Learner

    learner = Learner(cfg)
    assert learner.solver_labels is not None
    assert learner.solver_labels[0].shape == (64, 6, 7, 4)


def test_sample_reuse_guardrail_clamps_and_reports(tmp_path):
    """LoopConfig.max_sample_reuse (round 5, VERDICT r4 weak #4): with a
    train/generate ratio that would push sample reuse way above 1 (the
    c4-r4 leg-2 silent regression), the loop clamps the per-generation
    train iterations to the bound and reports train/sample_reuse in the
    metrics stream."""
    import json
    import os

    from custom_alphazero_tpu import paths
    from custom_alphazero_tpu.runtime.loop import run

    cfg = _tiny_cfg(tmp_path, "reuse1", 2)
    cfg = apply_overrides(cfg, {
        # 50 iters x 16 batch = 800 trained samples/gen against ~100-200
        # fresh ones: reuse would be ~4-8 unclamped.
        "loop.train_iterations_per_generation": "50",
        "loop.max_sample_reuse": "1.0",
        "arena.evaluation_frequency": "0",
        "arena.checkpoint_frequency": "0",
    })
    summary = run(cfg)
    assert 2 <= summary["iterations"] < 100  # clamped well below 2 x 50

    jsonl = os.path.join(
        paths.tensorboard_path(str(tmp_path), "connect_n", "reuse1"),
        "metrics.jsonl",
    )
    reuse_values = [
        json.loads(line)["value"]
        for line in open(jsonl)
        if json.loads(line)["tag"] == "train/sample_reuse"
    ]
    assert reuse_values, "train/sample_reuse not reported"
    assert all(v <= 1.0 + 1e-6 for v in reuse_values)


def test_loop_with_aux_policy_target(tmp_path):
    """loop.solver_policy_weight (round 5): a labels npz carrying `pi`
    trains the policy head on the labeled subset each step; the loop
    loads it, reports train/solver_policy_loss, and runs end to end."""
    import json
    import os

    import numpy as np

    from custom_alphazero_tpu import paths
    from custom_alphazero_tpu.runtime.loop import Learner, run

    rng = np.random.default_rng(0)
    n = 64
    pi = np.zeros((n, 7), np.float32)
    pi[np.arange(n), rng.integers(0, 7, n)] = 1.0
    np.savez(
        tmp_path / "labels.npz",
        obs=rng.standard_normal((n, 6, 7, 4)).astype(np.float32),
        z=rng.choice([-1.0, 0.0, 1.0], n).astype(np.float32),
        pi=pi,
    )

    cfg = _tiny_cfg(tmp_path, "auxpi1", 2)
    cfg = apply_overrides(cfg, {
        "loop.solver_labels_path": str(tmp_path / "labels.npz"),
        "loop.solver_value_weight": "0.5",
        "loop.solver_policy_weight": "0.5",
        "loop.solver_value_batch": "16",
    })
    summary = run(cfg)
    assert summary["iterations"] == 4

    learner = Learner(cfg)
    assert learner.solver_labels_pi is not None

    jsonl = os.path.join(
        paths.tensorboard_path(str(tmp_path), "connect_n", "auxpi1"),
        "metrics.jsonl",
    )
    tags = {json.loads(line)["tag"] for line in open(jsonl)}
    assert "train/solver_policy_loss" in tags


def test_grad_clip_and_nonfinite_loss_abort(tmp_path):
    """model.grad_clip_norm + the loop's non-finite-loss abort (round 5):
    the engine-labeled tactics aux target at weight 1.0 from a random init
    diverged to NaN within 4 SGD steps at the default LR; with clipping
    the same regime trains, and without it the loop fails LOUD instead of
    continuing on NaN parameters."""
    import jax
    import jax.numpy as jnp
    import optax
    import pytest as _pytest

    from custom_alphazero_tpu.config import ModelConfig
    from custom_alphazero_tpu.models.losses import make_optimizer
    from custom_alphazero_tpu.runtime.loop import run

    # Optimizer unit: the clipped update is bounded by clip_norm * lr.
    import dataclasses
    cfg_m = dataclasses.replace(
        ModelConfig(), grad_clip_norm=1.0, lr_values=(0.1,), lr_boundaries=()
    )
    opt = make_optimizer(cfg_m)
    p = {"kernel": jnp.zeros((4,))}
    state = opt.init(p)
    updates, _ = opt.update({"kernel": jnp.full((4,), 1e6)}, state, p)
    assert float(optax.global_norm(updates)) <= 0.1 + 1e-6

    # Loop: absurd LR with no clipping must raise the divergence abort.
    cfg = _tiny_cfg(tmp_path, "nanabort", 3)
    cfg = apply_overrides(cfg, {
        "model.lr_values": "(1000000.0,)",
        "model.lr_boundaries": "()",
        "loop.train_iterations_per_generation": "8",
        "arena.evaluation_frequency": "0",
        "arena.checkpoint_frequency": "0",
    })
    with _pytest.raises(RuntimeError, match="non-finite"):
        run(cfg)


def test_solver_score_veto_blocks_regressing_candidate(tmp_path, monkeypatch):
    """arena.solver_score_veto (round 5, from the c4-r5 finding): the
    head-to-head gate promoted a net that regressed against the oracle.
    With the veto on, a candidate that wins the arena is still blocked
    when its oracle-scored move quality drops below the reigning best's
    promotion-time score minus the margin."""
    from custom_alphazero_tpu.runtime.loop import run
    from custom_alphazero_tpu.tools import strength

    # Oracle scores per arena: first promotion seeds best at 0.8; the
    # second candidate scores 0.5 -> vetoed; the third scores 0.85 ->
    # passes.
    scores = iter([0.8, 0.5, 0.85])
    monkeypatch.setattr(strength, "score_arena_log", lambda log: next(scores))

    cfg = _tiny_cfg(tmp_path, "veto1", 3)
    cfg = apply_overrides(cfg, {
        # Every arena "wins" head-to-head; the veto is the only gate.
        "arena.promote_threshold": "0.0",
        "arena.evaluate_with_solver": "true",
        "arena.solver_score_veto": "true",
        "arena.solver_score_veto_margin": "0.02",
        "arena.evaluation_frequency": "2",
        "arena.checkpoint_frequency": "2",
        "loop.train_iterations_per_generation": "2",
    })
    summary = run(cfg)
    # Arenas at steps 2, 4, 6...: promote, veto, promote.
    assert summary["promotions"] == 2


def test_solver_score_veto_requires_solver_arena():
    from custom_alphazero_tpu.config import Config, apply_overrides
    import pytest as _pytest

    with _pytest.raises(ValueError, match="solver_score_veto"):
        apply_overrides(Config(), {"arena.solver_score_veto": "true"})
