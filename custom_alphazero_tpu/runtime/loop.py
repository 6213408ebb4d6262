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

import math
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
from custom_alphazero_tpu.parallel import distributed, sharded
from custom_alphazero_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from custom_alphazero_tpu.replay.buffer import (
    replay_add,
    replay_init,
    replay_sample,
)
from custom_alphazero_tpu.replay.codec import TopKPolicyCodec, codec_for_env
from custom_alphazero_tpu.runtime.arena import make_arena_fn
from custom_alphazero_tpu.runtime.selfplay import make_selfplay_fn
from custom_alphazero_tpu.runtime.train import (
    init_train_state,
    make_evaluate_fn,
    make_train_step,
)


def max_game_plies(cfg: Config) -> int:
    if cfg.self_play.max_plies:
        return cfg.self_play.max_plies
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


def _auto_data_parallelism(cfg: Config, available: int) -> int:
    """Largest data-axis size <= `available` that divides the workload:
    games per generation, train batch, and replay capacity. The arena does
    NOT constrain the axis — an indivisible arena.games (reference default
    150) rounds its per-shard count up instead (sharded.make_sharded_arena;
    VERDICT r3 weak #2). Explicit cfg.mesh.data_parallelism bypasses this
    and lets the sharded builders raise on indivisible sizes."""
    import math

    dp = math.gcd(max(available, 1), cfg.self_play.games_per_generation)
    dp = math.gcd(dp, cfg.model.batch_size)
    dp = math.gcd(dp, cfg.replay.capacity)
    return max(dp, 1)


@dataclass
class Learner:
    """All jitted programs + mutable run state for one training run."""

    cfg: Config
    devices: Any = None  # default: jax.devices()
    env: Any = field(init=False)
    net: PolicyValueNet = field(init=False)

    def __post_init__(self):
        import dataclasses as _dc

        cfg = self.cfg
        self.env = make_env(cfg)
        self.net = PolicyValueNet(self.env.num_actions, cfg.model)
        devices = list(self.devices if self.devices is not None
                       else jax.devices())
        mesh_cfg = cfg.mesh
        if not mesh_cfg.data_parallelism:  # 0 = auto (all devices that fit)
            mp = max(mesh_cfg.model_parallelism, 1)
            auto_dp = _auto_data_parallelism(cfg, len(devices) // mp)
            mesh_cfg = _dc.replace(mesh_cfg, data_parallelism=auto_dp)
            if auto_dp * mp < len(devices):
                print(
                    f"mesh: data axis clamped to {auto_dp} (of "
                    f"{len(devices)} devices) to divide the workload; set "
                    "mesh.data_parallelism or pick divisible sizes to use "
                    "every device"
                )
        self.mesh = make_mesh(mesh_cfg, devices)
        self.evaluate = make_evaluate_fn(self.net)
        self.schedule = learning_rate_schedule(cfg.model)
        max_plies = max_game_plies(cfg)

        # Fused-kernel auto-selection keys off the MESH devices' platform,
        # not jax.default_backend(): a CPU dryrun mesh can coexist with a
        # visible TPU plugin.
        platform = self.mesh.devices.flat[0].platform
        # Config-time guard (ADVICE r4): on the TPU backend, PUCT search
        # with root Dirichlet noise at compressed tree width K >= 128 is
        # un-runnable either way — the expansion top_k at K >= 128 needs
        # an optimization_barrier to dodge a fusion-emitter CHECK-fail,
        # and that barrier inside the generation ply scan combined with
        # noise sampling kernel-faults the worker (PARITY.md rounds 2-4).
        # Reject it here with a clear error instead of a mid-run crash.
        if platform == "tpu" and cfg.mcts.use_dirichlet and (
            not cfg.mcts.use_gumbel
        ):
            from custom_alphazero_tpu.search.mcts import MCTS

            _k = MCTS(self.env, cfg.mcts).prior_width(cfg.mcts.simulations)
            if _k >= 128 and _k < self.env.num_actions:
                raise ValueError(
                    f"mcts: compressed tree width K={_k} >= 128 with "
                    "use_dirichlet on the TPU backend kernel-faults "
                    "(PARITY.md rounds 2-4). Lower mcts.simulations / "
                    "mcts.topk_actions below 128, disable noise, or use "
                    "mcts.use_gumbel=true."
                )
        self.codec = (
            codec_for_env(self.env) if cfg.replay.compress_obs else None
        )
        # Large observations (chess: 30 KB/sample f32) are bit-packed
        # INSIDE the generation scan: the raw per-ply sample buffer is
        # T*B x obs bytes (~4 GB at 256 chess games x 512 plies — enough
        # to OOM the chip with transients; observed as a TPU worker crash
        # at batch >= 128, round 3). Small observations (Connect-4: 672 B)
        # keep the raw path — packing there only adds per-ply work.
        obs_codec = (
            self.codec
            if self.codec is not None
            and int(np.prod(self.env.obs_shape)) >= 2048
            else None
        )
        selfplay = make_selfplay_fn(
            self.env, cfg.mcts, cfg.self_play, max_plies,
            fused=None if platform == "tpu" else False,
            obs_codec=obs_codec,
        )
        batch_size = cfg.self_play.games_per_generation
        self.dp = self.mesh.shape[cfg.mesh.data_axis]
        # Solver-distilled auxiliary value target (LoopConfig
        # .solver_labels_path): exact-value-labeled positions kept on
        # device; every train step adds a value MSE term on a random
        # subset (runtime/train.py make_train_step aux args).
        self.solver_labels = None
        self.solver_labels_pi = None
        if cfg.loop.solver_labels_path:
            labels = np.load(cfg.loop.solver_labels_path)
            self.solver_labels = (
                jnp.asarray(labels["obs"], jnp.float32),
                jnp.asarray(labels["z"], jnp.float32),
            )
            print(
                f"solver aux value target: {len(labels['z'])} labeled "
                f"positions from {cfg.loop.solver_labels_path} "
                f"(weight={cfg.loop.solver_value_weight}, "
                f"batch={cfg.loop.solver_value_batch})"
            )
            if cfg.loop.solver_policy_weight > 0.0:
                assert "pi" in labels, (
                    "loop.solver_policy_weight > 0 needs a 'pi' array in "
                    f"{cfg.loop.solver_labels_path}"
                )
                self.solver_labels_pi = jnp.asarray(
                    labels["pi"], jnp.float32
                )
                print(
                    "solver aux policy target: weight="
                    f"{cfg.loop.solver_policy_weight}"
                )
        self.train_step = jax.jit(make_train_step(
            self.net, cfg.model,
            aux_value_weight=(
                cfg.loop.solver_value_weight if self.solver_labels else 0.0
            ),
            aux_value_batch=cfg.loop.solver_value_batch,
            aux_policy_weight=(
                cfg.loop.solver_policy_weight
                if self.solver_labels_pi is not None else 0.0
            ),
        ))
        self.policy_codec = (
            TopKPolicyCodec(self.env.num_actions, cfg.replay.policy_topk)
            if cfg.replay.policy_topk else None
        )

        if self.dp > 1:
            # Multi-device / multi-host: every phase runs shard_mapped over
            # the data axis — per-device game shards in self-play and arena,
            # per-shard replay rings (VERDICT round 1 #2; SURVEY §7.6).
            self.generate = jax.jit(
                sharded.make_sharded_generate(
                    selfplay, self.evaluate, self.mesh, batch_size,
                    cfg.mesh.data_axis,
                )
            )
            add, sample = sharded.make_sharded_replay_ops(
                self.mesh, cfg.model.batch_size, cfg.mesh.data_axis,
                self.codec, self.policy_codec,
            )
            self.replay_add = jax.jit(add)
            self.replay_sample = jax.jit(sample)
            arena = make_arena_fn(self.env, cfg.arena, cfg.mcts, max_plies)
            # An indivisible game count (reference default 150) rounds up
            # to the next even per-shard count inside make_sharded_arena
            # rather than constraining the mesh (VERDICT r3 weak #2).
            self.run_arena = jax.jit(
                sharded.make_sharded_arena(
                    arena, self.evaluate, self.mesh, cfg.arena.games,
                    cfg.arena.promote_threshold, cfg.mesh.data_axis,
                )
            )
        else:
            def generate(params, batch_stats, rng):
                return selfplay(
                    lambda obs: self.evaluate(params, batch_stats, obs),
                    rng,
                    batch_size,
                )

            self.generate = jax.jit(generate)
            self.replay_add = jax.jit(
                lambda r, b: replay_add(r, b, self.codec, self.policy_codec)
            )
            self.replay_sample = jax.jit(
                lambda r, k: replay_sample(r, k, cfg.model.batch_size,
                                           self.codec, self.policy_codec)
            )

            arena = make_arena_fn(self.env, cfg.arena, cfg.mcts, max_plies)
            self.run_arena = jax.jit(
                self._replicated_arena(arena, cfg.arena.games)
            )

    def _replicated_arena(self, arena, games):
        def run_arena(cand_params, cand_stats, best_params, best_stats, rng):
            return arena(
                lambda obs: self.evaluate(cand_params, cand_stats, obs),
                lambda obs: self.evaluate(best_params, best_stats, obs),
                rng,
                games,
            )

        return run_arena

    # -- state setup -------------------------------------------------------

    def init_state(self, rng):
        cfg = self.cfg
        train_state = init_train_state(self.net, cfg.model, rng, self.env.obs_shape)
        train_state = train_state.replace(
            params=shard_params(train_state.params, self.mesh, cfg.mesh)
        )
        replay = self.init_replay()
        return train_state, replay

    def init_replay(self):
        cfg = self.cfg
        if self.dp > 1:
            return sharded.sharded_replay_init(
                cfg.replay.capacity, self.env.obs_shape,
                self.env.num_actions, self.mesh, cfg.mesh.data_axis,
                self.codec, self.policy_codec,
            )
        return replay_init(
            cfg.replay.capacity, self.env.obs_shape, self.env.num_actions,
            self.codec, self.policy_codec,
        )

    def place_replay(self, replay):
        """Re-place a host-restored replay onto the mesh (per-shard rings
        when dp > 1, single device ring otherwise)."""
        if self.dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P(self.cfg.mesh.data_axis))
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), replay
            )
        return jax.device_put(replay)


def _visualize_tree(learner, best, generation, results_dir, game, run_id,
                    updated: bool = False):
    """Render one search tree from the opening position with the current
    best params (parity with visualize_mcts_iteration, utils.py:136-162):
    a 'light' (visited-edges) render per iteration; when the best model just
    changed (`updated`), archive light + full renders under
    self_play/updated_mcts/ as well (utils.py:153-162).

    Called on EVERY host: fetching the params is a collective; the search
    and render then run on the coordinator's local devices only."""
    from custom_alphazero_tpu.search.mcts import MCTS
    from custom_alphazero_tpu.tools.visualize import save_tree

    best_host = sharded.fetch(best)
    if not distributed.is_coordinator():
        return
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
    tree = learner._viz_search(best_host[0], best_host[1], roots,
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
    """Train; returns a summary dict (for tests and tools).

    Multi-host: every process runs this same function (SPMD over the global
    mesh, SURVEY §7.6); host-side I/O — run directories, config snapshot,
    checkpoints, metrics, sample archives, tree renders — happens on the
    coordinator only (the reference wrote from each of its three processes
    to a shared results dir; here non-coordinator hosts write nothing)."""
    coordinator = distributed.is_coordinator()
    run_id = cfg.run.run_id or paths.new_run_id()
    results_dir, game = cfg.run.results_dir, cfg.game
    if coordinator:
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
        # Every host loads the same checkpoint from the shared filesystem
        # (SURVEY §7.6: run metadata on shared FS) so state stays identical.
        train_state, meta, saved_replay = load_checkpoint(
            training_dir, sharded.fetch(train_state), sharded.fetch(replay)
        )
        train_state = train_state.replace(
            params=shard_params(train_state.params, learner.mesh, cfg.mesh)
        )
        if saved_replay is not None:
            replay = learner.place_replay(saved_replay)
        resumed_size = int(jax.device_get(replay.size.sum()))
        if coordinator:
            print(f"Resumed training state at step {meta['steps']} "
                  f"(replay={resumed_size})")

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
        best_state, _ = load_checkpoint(
            latest_best[1], sharded.fetch(train_state)
        )
        best_state = best_state.replace(
            params=shard_params(best_state.params, learner.mesh, cfg.mesh)
        )
        best = (best_state.params, best_state.batch_stats)
        if coordinator:
            print(f"Restored best model from iteration {latest_best[0]}")

    metrics = MetricsWriter(
        paths.tensorboard_path(results_dir, game, run_id)
    ) if coordinator else None
    iteration = int(train_state.steps)
    total = generations if generations is not None else cfg.loop.generations
    generation = 0
    summary = {"run_id": run_id, "iterations": 0, "promotions": 0,
               "last_arena_score": None}
    pending_save = None
    best_updated = False
    # Coordinator-held oracle score of the reigning best, seeded at its
    # promotion arena (arena.solver_score_veto; None until the first
    # post-start promotion — the veto never fires before that).
    best_solver_score = None

    from custom_alphazero_tpu.runtime.watchdog import (
        CompileGraceToucher,
        touch_liveness_file,
    )

    # First touch proves the process got past the interpreter-start
    # device-claim hook (the phase the in-process watchdog can never
    # cover — runtime/supervisor.py liveness monitor).
    touch_liveness_file()
    # Keep the liveness file fresh through generation-0 compiles (minutes
    # at chess scale) so the supervisor doesn't kill a healthy child
    # mid-compile; bounded by run.compile_grace_minutes and stopped the
    # moment the first generation completes (ADVICE r2).
    grace = None
    if cfg.run.compile_grace_minutes > 0:
        grace = CompileGraceToucher(cfg.run.compile_grace_minutes * 60.0)
    arena_grace = None
    first_arena = True

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

    def _steady_state():
        # First generation complete: compile grace ends, liveness now
        # tracks real progress only.
        nonlocal grace
        if grace is not None:
            grace.stop()
            grace = None
        _armed()

    # Graceful operator stop: `touch <run_dir>/STOP` finishes the current
    # generation, writes a final checkpoint, and exits 0 — releasing the
    # device cleanly (a SIGKILL mid-device-call leaves a stale chip grant
    # that blocks the next claimant; see runtime/supervisor.py). Every
    # host sees the same shared-FS file, so a pod slice stops in lockstep.
    stop_file = os.path.join(
        paths.run_path(results_dir, game, run_id), "STOP"
    )
    if coordinator and os.path.exists(stop_file):
        os.unlink(stop_file)  # already-honored request: resume runs

    print(f"Starting run {run_id} on {jax.devices()}")
    while total == 0 or generation < total:
        # Only the coordinator reads the STOP file; the boolean is agreed
        # across hosts through a device collective so every host exits at
        # the same generation boundary. A per-host os.path.exists could
        # observe the file on some hosts and not others, leaving part of
        # the pod inside learner.generate's collectives (ADVICE r2).
        if distributed.broadcast_flag(
            coordinator and os.path.exists(stop_file)
        ):
            if coordinator:
                print(f"STOP requested via {stop_file}; exiting after "
                      f"{generation} generations (final checkpoint saved)")
            break
        gen_start = time.time()
        rng, k_gen = jax.random.split(rng)
        batch, stats = learner.generate(best[0], best[1], k_gen)
        replay = learner.replay_add(replay, batch)
        # EVERY process computes every device->host scalar (reductions on
        # sharded arrays are global computations; a conversion only the
        # coordinator ran would desynchronize the collective streams —
        # caught by tests/test_multihost.py). Only the I/O below is gated.
        samples = int(jax.device_get(batch.valid.sum()))
        games = int(stats.games)
        draws = int(stats.draws)
        mean_game_length = float(stats.mean_game_length)
        plies = int(stats.plies)
        replay_total = int(jax.device_get(replay.size.sum()))
        gen_time = time.time() - gen_start
        touch_liveness_file()
        if heartbeat is not None:
            heartbeat.beat()
        _steady_state()

        freq = cfg.loop.samples_checkpoint_frequency
        if freq and (generation + 1) % freq == 0:
            # Per-generation sample archive (reference samples.npz,
            # self_play.py:170-178, read back by offline analysis only).
            host = sharded.fetch(batch)
            if coordinator:
                it_dir = paths.self_play_iteration_path(
                    results_dir, game, run_id, generation
                )
                os.makedirs(it_dir, exist_ok=True)
                from custom_alphazero_tpu.replay.codec import PackedObs

                if isinstance(host.obs, PackedObs):
                    # Packed generation (chess scale): decode only the
                    # valid rows, chunked so the archive never re-creates
                    # the multi-GB raw buffer packing avoided.
                    words = np.asarray(host.obs.words)[host.valid]
                    scalars = np.asarray(host.obs.scalars)[host.valid]
                    decode = jax.jit(learner.codec.decode)
                    chunks = []
                    for i0 in range(0, len(words), 8192):
                        chunks.append(np.asarray(decode(PackedObs(
                            words=jnp.asarray(words[i0:i0 + 8192]),
                            scalars=jnp.asarray(scalars[i0:i0 + 8192]),
                        ))))
                    states_np = (
                        np.concatenate(chunks) if chunks
                        else np.zeros((0,) + learner.env.obs_shape,
                                      np.float32)
                    )
                else:
                    states_np = host.obs[host.valid]
                np.savez(
                    os.path.join(it_dir, paths.SAMPLES_FILE),
                    states=states_np,
                    policies=host.policy[host.valid],
                    values=host.value[host.valid],
                )
        vfreq = cfg.loop.visualize_frequency
        if vfreq and (generation + 1) % vfreq == 0:
            # `updated` = the best model changed since the last render
            # (reference self_play.py:163-187 + utils.py:153-162).
            _visualize_tree(learner, best, generation,
                            results_dir, game, run_id,
                            updated=best_updated)
            best_updated = False
            touch_liveness_file()
            if heartbeat is not None:
                heartbeat.beat()
        sims = plies * cfg.mcts.simulations
        if coordinator:
            print(
                f"[gen {generation}] {samples} samples from "
                f"{games} games in {gen_time:.2f}s "
                f"({sims / max(gen_time, 1e-9):,.0f} sims/s), "
                f"replay={replay_total}"
            )
        if metrics is not None:
            metrics.scalars(
                {
                    "self_play/samples": samples,
                    "self_play/games": games,
                    "self_play/mean_game_length": mean_game_length,
                    "self_play/draws": draws,
                    "self_play/sims_per_second": sims / max(gen_time, 1e-9),
                },
                iteration,
            )

        # Warmup gate: every shard must be able to serve its slice of a
        # batch; min-shard size also reproduces the reference's global gate
        # when dp == 1 (train.py:59).
        warmup = max(cfg.replay.min_size, cfg.model.batch_size)
        total_size = replay_total
        min_shard = int(jax.device_get(replay.size.min()))
        local_batch = cfg.model.batch_size // learner.dp
        if total_size >= warmup and min_shard >= local_batch:
            # Sample-reuse guardrail (LoopConfig.max_sample_reuse): reuse =
            # trained samples / fresh samples this generation. Above 1 the
            # replay ring turns over slower than the trainer consumes it —
            # the silent regression class of TRAINING.md c4-r4 leg 2.
            train_iters = cfg.loop.train_iterations_per_generation
            reuse_planned = (
                train_iters * cfg.model.batch_size / max(samples, 1)
            )
            if cfg.loop.max_sample_reuse > 0 and (
                reuse_planned > cfg.loop.max_sample_reuse
            ):
                train_iters = max(
                    int(
                        cfg.loop.max_sample_reuse * samples
                        // cfg.model.batch_size
                    ),
                    1,
                )
                if coordinator:
                    print(
                        f"[gen {generation}] sample reuse "
                        f"{reuse_planned:.2f} > max_sample_reuse="
                        f"{cfg.loop.max_sample_reuse:g}; clamping to "
                        f"{train_iters} train iterations"
                    )
            reuse = train_iters * cfg.model.batch_size / max(samples, 1)
            if coordinator and reuse > 1.0 and not (
                cfg.loop.max_sample_reuse > 0
            ):
                print(
                    f"[gen {generation}] WARNING: sample reuse "
                    f"{reuse:.2f} > 1 (replay turnover below 1; set "
                    "loop.max_sample_reuse or lower "
                    "loop.train_iterations_per_generation)"
                )
            if metrics is not None:
                metrics.scalar("train/sample_reuse", reuse, iteration)
            for _ in range(train_iters):
                rng, k_batch = jax.random.split(rng)
                obs_b, pi_b, z_b = learner.replay_sample(replay, k_batch)
                if learner.solver_labels is not None:
                    rng, k_aux = jax.random.split(rng)
                    aux_extra = (
                        (learner.solver_labels_pi,)
                        if learner.solver_labels_pi is not None else ()
                    )
                    train_state, m = learner.train_step(
                        train_state, obs_b, pi_b, z_b, k_aux,
                        *learner.solver_labels, *aux_extra,
                    )
                else:
                    train_state, m = learner.train_step(
                        train_state, obs_b, pi_b, z_b
                    )
                iteration = int(m.steps)
                if not math.isfinite(float(m.loss)):
                    # SGD momentum never recovers from a non-finite update;
                    # every later step (and any self-play from these params)
                    # would be garbage. Fail loud instead (same spirit as
                    # the sample-reuse guardrail).
                    raise RuntimeError(
                        f"train/loss is non-finite at step {iteration} "
                        f"(policy={float(m.policy_loss)}, "
                        f"value={float(m.value_loss)}): training diverged. "
                        "Lower model.lr_values or set model.grad_clip_norm."
                    )
                train_scalars = {
                    "train/loss": float(m.loss),
                    "train/policy_loss": float(m.policy_loss),
                    "train/value_loss": float(m.value_loss),
                    "train/learning_rate": float(m.learning_rate),
                    "train/steps": iteration,
                }
                if learner.solver_labels is not None:
                    train_scalars["train/solver_value_loss"] = float(
                        m.solver_value_loss
                    )
                if learner.solver_labels_pi is not None:
                    train_scalars["train/solver_policy_loss"] = float(
                        m.solver_policy_loss
                    )
                touch_liveness_file()
                if heartbeat is not None:
                    heartbeat.beat()
                summary["iterations"] = iteration
                if metrics is not None:
                    metrics.scalars(train_scalars, iteration)

                cfreq = cfg.arena.checkpoint_frequency
                if cfreq and iteration % cfreq == 0:
                    # Sharded leaves must be gathered on every host (the
                    # all-gather is a collective); only the coordinator
                    # then writes.
                    state_host = sharded.fetch(train_state)
                    replay_host = (
                        sharded.fetch(replay)
                        if cfg.loop.checkpoint_replay else None
                    )
                    lr_now = float(learner.schedule(train_state.steps))
                    if coordinator:
                        # Async: disk IO off the training thread;
                        # serialized by the module lock, joined before
                        # run() returns.
                        pending_save = save_checkpoint_async(
                            training_dir,
                            state_host,
                            lr_now,
                            replay_host,
                        )
                efreq = cfg.arena.evaluation_frequency
                if efreq and iteration % efreq == 0:
                    if first_arena and cfg.run.compile_grace_minutes > 0:
                        # The first arena evaluation compiles too (minutes
                        # at chess scale) — give it its own bounded
                        # liveness grace so the supervisor doesn't kill a
                        # healthy child mid-compile (ADVICE r2).
                        arena_grace = CompileGraceToucher(
                            cfg.run.compile_grace_minutes * 60.0
                        )
                    rng, k_arena = jax.random.split(rng)
                    result = learner.run_arena(
                        train_state.params, train_state.batch_stats,
                        best[0], best[1], k_arena,
                    )
                    score = float(jax.device_get(result.score))
                    promoted = bool(jax.device_get(result.promote))
                    wins = int(result.wins)
                    losses = int(result.losses)
                    arena_draws = int(result.draws)
                    summary["last_arena_score"] = score
                    if coordinator:
                        print(
                            f"[iter {iteration}] arena score={score:.3f} "
                            f"(+{wins}/-{losses}/="
                            f"{arena_draws}) promoted={promoted}"
                        )
                    if metrics is not None:
                        metrics.scalar(
                            "evaluation/winning_score", score, iteration
                        )
                    solver_score = None
                    solver_eval_ran = (
                        cfg.arena.evaluate_with_solver
                        and cfg.game == "connect_n"
                        and cfg.connect_n == type(cfg.connect_n)()
                    )
                    if solver_eval_ran:
                        # Oracle-scored candidate moves (reference
                        # evaluate.py:53-59; default 7x6 board only — the
                        # native solver is compiled for it).
                        from custom_alphazero_tpu.tools.strength import (
                            score_arena_log,
                        )

                        log_host = sharded.fetch(result.log)
                        if coordinator:
                            # Host-side exact solves can take minutes under
                            # CPU contention — that is live compute, not a
                            # wedge, so keep the liveness file fresh for a
                            # bounded window (observed false-positive kill
                            # mid-scoring, round 3).
                            score_grace = (
                                CompileGraceToucher(15 * 60.0)
                                if cfg.run.compile_grace_minutes > 0
                                else None
                            )
                            try:
                                solver_score = score_arena_log(log_host)
                            finally:
                                if score_grace is not None:
                                    score_grace.stop()
                            print(f"[iter {iteration}] solver score="
                                  f"{solver_score:.3f}")
                            if metrics is not None:
                                metrics.scalar(
                                    "evaluation/solver_score", solver_score,
                                    iteration,
                                )
                    if (promoted and cfg.arena.solver_score_veto
                            and solver_eval_ran):
                        # Every host must reach the broadcast (promoted is
                        # device-derived so identical across hosts); only
                        # the coordinator holds the scores.
                        veto = bool(
                            coordinator
                            and best_solver_score is not None
                            and solver_score is not None
                            and solver_score < best_solver_score
                            - cfg.arena.solver_score_veto_margin
                        )
                        if distributed.broadcast_flag(veto):
                            promoted = False
                            if coordinator:
                                print(
                                    f"[iter {iteration}] solver-score veto: "
                                    f"candidate {solver_score:.3f} < best "
                                    f"{best_solver_score:.3f} - "
                                    f"{cfg.arena.solver_score_veto_margin}"
                                    " — promotion blocked"
                                )
                    if promoted:
                        best = (train_state.params, train_state.batch_stats)
                        summary["promotions"] += 1
                        best_updated = True
                        if coordinator and solver_score is not None:
                            best_solver_score = solver_score
                    # The *winner*'s weights land in evaluation/iteration_N —
                    # the candidate when promoted, the incumbent otherwise
                    # (reference model/tensorflow/train.py:92-102).
                    winner_state = sharded.fetch(
                        train_state.replace(
                            params=best[0], batch_stats=best[1]
                        )
                    )
                    lr_now = float(learner.schedule(train_state.steps))
                    if coordinator:
                        save_checkpoint(
                            paths.evaluation_iteration_path(
                                results_dir, game, run_id, iteration
                            ),
                            winner_state,
                            lr_now,
                        )
                    touch_liveness_file()
                    if heartbeat is not None:
                        heartbeat.beat()
                    if arena_grace is not None:
                        arena_grace.stop()
                        arena_grace = None
                    first_arena = False
        generation += 1
    if watchdog is not None:
        watchdog.disarm()
    if grace is not None:
        grace.stop()
    if arena_grace is not None:
        arena_grace.stop()
    if pending_save is not None:
        pending_save.join()
    # Final checkpoint: the loop's exit state is always resumable/evaluable
    # even when the stop didn't land on a checkpoint_frequency boundary.
    if summary["iterations"] > 0:
        state_host = sharded.fetch(train_state)
        replay_host = (
            sharded.fetch(replay) if cfg.loop.checkpoint_replay else None
        )
        if coordinator:
            save_checkpoint(
                training_dir,
                state_host,
                float(learner.schedule(train_state.steps)),
                replay_host,
            )
    if metrics is not None:
        metrics.close()
    return summary


def main(argv=None):
    # Multi-host entry: a no-op on one host; on a pod slice every host runs
    # this same command and joins the global mesh (SURVEY §7.6,
    # parallel/distributed.py).
    distributed.initialize()
    overrides = parse_cli_overrides(sys.argv[1:] if argv is None else argv)
    cfg = apply_overrides(Config(), overrides)
    run(cfg)


if __name__ == "__main__":
    main()
