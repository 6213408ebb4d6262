"""The actor-learner loop: one SPMD program.

Replaces the reference's three cooperating OS processes — uvicorn serving
(serving/api/main.py), joblib self-play (self_play.py:122-188) and the
polling trainer (train.py:41-92) — with a single program:

  per generation:
    1. self-play a lockstep batch of games with the *best* params
       (the reference's best-model pull, self_play.py:142-151, becomes an
       in-memory param reference);
    2. push samples into the device-resident replay (the HTTP queue);
    3. run K training iterations on the *candidate* params; every
       `checkpoint_frequency` iterations checkpoint, every
       `evaluation_frequency` iterations run the arena and promote the
       candidate to best on a >= 0.55 score (train_and_report,
       model/tensorflow/train.py:47-116).

Run:  python -m custom_alphazero_tpu.runtime.loop --mcts.simulations=64 ...
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu import paths
from custom_alphazero_tpu.config import (
    Config,
    apply_overrides,
    parse_cli_overrides,
    to_json,
)
from custom_alphazero_tpu.envs import core as env_core
from custom_alphazero_tpu.envs import connect_n as _register_connect_n  # noqa: F401
from custom_alphazero_tpu.io.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_async,
)
from custom_alphazero_tpu.io.metrics import MetricsWriter
from custom_alphazero_tpu.models.losses import learning_rate_schedule
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from custom_alphazero_tpu.replay.buffer import (
    replay_add,
    replay_init,
    replay_sample,
)
from custom_alphazero_tpu.runtime.arena import make_arena_fn
from custom_alphazero_tpu.runtime.selfplay import make_selfplay_fn
from custom_alphazero_tpu.runtime.train import (
    init_train_state,
    make_evaluate_fn,
    make_train_step,
)


def max_game_plies(cfg: Config) -> int:
    if cfg.game == "connect_n":
        return cfg.connect_n.width * cfg.connect_n.height
    return 512  # chess ply cap: truncated games score as draws


def make_env(cfg: Config):
    if cfg.game == "connect_n":
        return env_core.make("connect_n", cfg.connect_n)
    if cfg.game == "chess":
        from custom_alphazero_tpu.envs import chess as _register_chess  # noqa: F401

        return env_core.make("chess", cfg.chess)
    raise ValueError(f"Unknown game {cfg.game!r}")


@dataclass
class Learner:
    """All jitted programs + mutable run state for one training run."""

    cfg: Config
    env: Any = field(init=False)
    net: PolicyValueNet = field(init=False)

    def __post_init__(self):
        cfg = self.cfg
        self.env = make_env(cfg)
        self.net = PolicyValueNet(self.env.num_actions, cfg.model)
        self.mesh = make_mesh(cfg.mesh)
        self.evaluate = make_evaluate_fn(self.net)
        self.schedule = learning_rate_schedule(cfg.model)
        max_plies = max_game_plies(cfg)

        selfplay = make_selfplay_fn(self.env, cfg.mcts, cfg.self_play, max_plies)
        batch_size = cfg.self_play.games_per_generation

        def generate(params, batch_stats, rng):
            return selfplay(
                lambda obs: self.evaluate(params, batch_stats, obs),
                rng,
                batch_size,
            )

        self.generate = jax.jit(generate)
        self.train_step = jax.jit(make_train_step(self.net, cfg.model))
        self.replay_add = jax.jit(replay_add)
        self.replay_sample = jax.jit(
            lambda r, k: replay_sample(r, k, cfg.model.batch_size)
        )

        arena = make_arena_fn(self.env, cfg.arena, cfg.mcts, max_plies)

        def run_arena(cand_params, cand_stats, best_params, best_stats, rng):
            return arena(
                lambda obs: self.evaluate(cand_params, cand_stats, obs),
                lambda obs: self.evaluate(best_params, best_stats, obs),
                rng,
                cfg.arena.games,
            )

        self.run_arena = jax.jit(run_arena)

    # -- state setup -------------------------------------------------------

    def init_state(self, rng):
        cfg = self.cfg
        train_state = init_train_state(self.net, cfg.model, rng, self.env.obs_shape)
        train_state = train_state.replace(
            params=shard_params(train_state.params, self.mesh, cfg.mesh)
        )
        replay = replay_init(
            cfg.replay.capacity, self.env.obs_shape, self.env.num_actions
        )
        return train_state, replay


def _visualize_tree(learner, best, generation, results_dir, game, run_id,
                    updated: bool = False):
    """Render one search tree from the opening position with the current
    best params (parity with visualize_mcts_iteration, utils.py:136-162):
    a 'light' (visited-edges) render per iteration; when the best model just
    changed (`updated`), archive light + full renders under
    self_play/updated_mcts/ as well (utils.py:153-162)."""
    from custom_alphazero_tpu.search.mcts import MCTS
    from custom_alphazero_tpu.tools.visualize import save_tree

    cfg = learner.cfg
    mcts = MCTS(learner.env, cfg.mcts)
    roots = jax.vmap(lambda _: learner.env.init())(jnp.arange(1))
    if not hasattr(learner, "_viz_search"):
        learner._viz_search = jax.jit(
            lambda p, s, r, k: mcts.search(
                r,
                lambda obs: learner.evaluate(p, s, obs),
                k,
                cfg.mcts.simulations,
            )
        )
    tree = learner._viz_search(best[0], best[1], roots,
                               jax.random.PRNGKey(generation))
    out = os.path.join(
        paths.self_play_iteration_path(results_dir, game, run_id, generation),
        f"mcts_iteration_{generation}_light",
    )
    save_tree(tree, learner.env, out, c_puct=cfg.mcts.c_puct)
    if updated:
        updated_dir = paths.updated_mcts_path(results_dir, game, run_id)
        save_tree(
            tree, learner.env,
            os.path.join(updated_dir, f"mcts_iteration_{generation}_light"),
            c_puct=cfg.mcts.c_puct,
        )
        save_tree(
            tree, learner.env,
            os.path.join(updated_dir, f"mcts_iteration_{generation}_full"),
            c_puct=cfg.mcts.c_puct, min_visits=0,
        )


def run(cfg: Config, generations: Optional[int] = None) -> dict:
    """Train; returns a summary dict (for tests and tools)."""
    run_id = cfg.run.run_id or paths.new_run_id()
    results_dir, game = cfg.run.results_dir, cfg.game
    paths.create_all_directories(results_dir, game, run_id)
    run_dir = paths.run_path(results_dir, game, run_id)
    with open(os.path.join(run_dir, paths.CONFIG_FILE), "w") as fp:
        fp.write(to_json(cfg))

    learner = Learner(cfg)
    rng = jax.random.PRNGKey(cfg.run.seed)
    rng, k_init = jax.random.split(rng)

    train_state, replay = learner.init_state(k_init)
    training_dir = paths.training_path(results_dir, game, run_id)
    if checkpoint_exists(training_dir):
        train_state, meta, saved_replay = load_checkpoint(
            training_dir, train_state, replay
        )
        if saved_replay is not None:
            replay = saved_replay
        print(f"Resumed training state at step {meta['steps']} "
              f"(replay={int(jax.device_get(replay.size))})")

    # Best params start as the candidate's (the reference serves a
    # random-weight model until the first promotion, serving/api/main.py:26);
    # on resume, reload the newest promoted lineage checkpoint
    # (reference best_saved_model, utils.py:64-78).
    best = (train_state.params, train_state.batch_stats)
    from custom_alphazero_tpu.io.checkpoint import latest_evaluation_iteration

    latest_best = latest_evaluation_iteration(
        paths.evaluation_path(results_dir, game, run_id)
    )
    if latest_best is not None:
        best_state, _ = load_checkpoint(latest_best[1], train_state)
        best = (best_state.params, best_state.batch_stats)
        print(f"Restored best model from iteration {latest_best[0]}")

    metrics = MetricsWriter(paths.tensorboard_path(results_dir, game, run_id))
    iteration = int(train_state.steps)
    total = generations if generations is not None else cfg.loop.generations
    generation = 0
    summary = {"run_id": run_id, "iterations": 0, "promotions": 0,
               "last_arena_score": None}
    pending_save = None
    best_updated = False

    heartbeat = None
    watchdog = None
    if cfg.run.watchdog_minutes > 0:
        from custom_alphazero_tpu.runtime.watchdog import (
            Heartbeat,
            start_watchdog,
        )

        heartbeat = Heartbeat(cfg.run.watchdog_minutes * 60.0)
        # Armed only after the first generation completes: generation 0
        # includes the self-play program's trace+compile (minutes at chess
        # scale), which must not count against a steady-state timeout.
        # Size the timeout to cover the longest single phase that can
        # still occur later — notably the FIRST arena evaluation, which
        # compiles too.

    def _armed():
        nonlocal watchdog
        if heartbeat is not None and watchdog is None:
            watchdog = start_watchdog(heartbeat)
            print(f"Stall watchdog armed: {cfg.run.watchdog_minutes:g} min")

    print(f"Starting run {run_id} on {jax.devices()}")
    while total == 0 or generation < total:
        gen_start = time.time()
        rng, k_gen = jax.random.split(rng)
        batch, stats = learner.generate(best[0], best[1], k_gen)
        replay = learner.replay_add(replay, batch)
        valid_host = jax.device_get(batch.valid)
        samples = int(valid_host.sum())
        gen_time = time.time() - gen_start
        if heartbeat is not None:
            heartbeat.beat()
            _armed()

        freq = cfg.loop.samples_checkpoint_frequency
        if freq and (generation + 1) % freq == 0:
            # Per-generation sample archive (reference samples.npz,
            # self_play.py:170-178, read back by offline analysis only).
            it_dir = paths.self_play_iteration_path(
                results_dir, game, run_id, generation
            )
            os.makedirs(it_dir, exist_ok=True)
            host = jax.device_get(batch)
            np.savez(
                os.path.join(it_dir, paths.SAMPLES_FILE),
                states=host.obs[valid_host],
                policies=host.policy[valid_host],
                values=host.value[valid_host],
            )
        vfreq = cfg.loop.visualize_frequency
        if vfreq and (generation + 1) % vfreq == 0:
            # `updated` = the best model changed since the last render
            # (reference self_play.py:163-187 + utils.py:153-162).
            _visualize_tree(learner, best, generation,
                            results_dir, game, run_id,
                            updated=best_updated)
            best_updated = False
            if heartbeat is not None:
                heartbeat.beat()
        sims = int(stats.plies) * cfg.mcts.simulations
        print(
            f"[gen {generation}] {samples} samples from "
            f"{int(stats.games)} games in {gen_time:.2f}s "
            f"({sims / max(gen_time, 1e-9):,.0f} sims/s), replay={int(jax.device_get(replay.size))}"
        )
        metrics.scalars(
            {
                "self_play/samples": samples,
                "self_play/games": int(stats.games),
                "self_play/mean_game_length": float(stats.mean_game_length),
                "self_play/draws": int(stats.draws),
                "self_play/sims_per_second": sims / max(gen_time, 1e-9),
            },
            iteration,
        )

        warmup = max(cfg.replay.min_size, cfg.model.batch_size)
        if int(jax.device_get(replay.size)) >= warmup:
            for _ in range(cfg.loop.train_iterations_per_generation):
                rng, k_batch = jax.random.split(rng)
                obs_b, pi_b, z_b = learner.replay_sample(replay, k_batch)
                train_state, m = learner.train_step(train_state, obs_b, pi_b, z_b)
                iteration = int(m.steps)
                if heartbeat is not None:
                    heartbeat.beat()
                summary["iterations"] = iteration
                metrics.scalars(
                    {
                        "train/loss": float(m.loss),
                        "train/policy_loss": float(m.policy_loss),
                        "train/value_loss": float(m.value_loss),
                        "train/learning_rate": float(m.learning_rate),
                        "train/steps": iteration,
                    },
                    iteration,
                )

                cfreq = cfg.arena.checkpoint_frequency
                if cfreq and iteration % cfreq == 0:
                    # Async: disk IO off the training thread; serialized by
                    # the module lock, joined before run() returns.
                    pending_save = save_checkpoint_async(
                        training_dir,
                        train_state,
                        float(learner.schedule(train_state.steps)),
                        replay if cfg.loop.checkpoint_replay else None,
                    )
                efreq = cfg.arena.evaluation_frequency
                if efreq and iteration % efreq == 0:
                    rng, k_arena = jax.random.split(rng)
                    result = learner.run_arena(
                        train_state.params, train_state.batch_stats,
                        best[0], best[1], k_arena,
                    )
                    score = float(jax.device_get(result.score))
                    promoted = bool(jax.device_get(result.promote))
                    summary["last_arena_score"] = score
                    print(
                        f"[iter {iteration}] arena score={score:.3f} "
                        f"(+{int(result.wins)}/-{int(result.losses)}/="
                        f"{int(result.draws)}) promoted={promoted}"
                    )
                    metrics.scalar("evaluation/winning_score", score, iteration)
                    if (cfg.arena.evaluate_with_solver
                            and cfg.game == "connect_n"
                            and cfg.connect_n == type(cfg.connect_n)()):
                        # Oracle-scored candidate moves (reference
                        # evaluate.py:53-59; default 7x6 board only — the
                        # native solver is compiled for it).
                        from custom_alphazero_tpu.tools.strength import (
                            score_arena_log,
                        )

                        solver_score = score_arena_log(
                            jax.device_get(result.log)
                        )
                        print(f"[iter {iteration}] solver score="
                              f"{solver_score:.3f}")
                        metrics.scalar(
                            "evaluation/solver_score", solver_score, iteration
                        )
                    if promoted:
                        best = (train_state.params, train_state.batch_stats)
                        summary["promotions"] += 1
                        best_updated = True
                    # The *winner*'s weights land in evaluation/iteration_N —
                    # the candidate when promoted, the incumbent otherwise
                    # (reference model/tensorflow/train.py:92-102).
                    winner_state = train_state.replace(
                        params=best[0], batch_stats=best[1]
                    )
                    save_checkpoint(
                        paths.evaluation_iteration_path(
                            results_dir, game, run_id, iteration
                        ),
                        winner_state,
                        float(learner.schedule(train_state.steps)),
                    )
                    if heartbeat is not None:
                        heartbeat.beat()
        generation += 1
    if watchdog is not None:
        watchdog.disarm()
    if pending_save is not None:
        pending_save.join()
    metrics.close()
    return summary


def main(argv=None):
    overrides = parse_cli_overrides(sys.argv[1:] if argv is None else argv)
    cfg = apply_overrides(Config(), overrides)
    run(cfg)


if __name__ == "__main__":
    main()
