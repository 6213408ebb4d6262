"""Profiling harness.

The reference has no profiling at all (SURVEY.md §5 — a wall-clock print in
the self-play loop was the only timing). First-class here, because the
north-star metric is simulations/s/chip:

- ``phase_timings``: wall-clock per phase (self-play / train / arena) with
  proper device synchronization;
- ``capture_trace``: ``jax.profiler`` trace of the self-play program for
  TensorBoard's trace viewer / xprof.

CLI:  python -m custom_alphazero_tpu.tools.profile [--trace-dir=/tmp/trace]
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> float:
    """Median wall-time of fn(*args) with block_until_ready, after warmup."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def phase_timings(cfg=None, batch_size: int = 256, sims: int = 64) -> Dict[str, float]:
    """Time the three phases of the actor-learner loop on this host's
    default device; returns seconds per call + derived rates."""
    from custom_alphazero_tpu.config import Config
    from custom_alphazero_tpu.runtime.loop import Learner

    cfg = cfg or Config()
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        mcts=dataclasses.replace(cfg.mcts, simulations=sims),
        self_play=dataclasses.replace(
            cfg.self_play, games_per_generation=batch_size
        ),
    )
    learner = Learner(cfg)
    rng = jax.random.PRNGKey(0)
    train_state, replay = learner.init_state(rng)
    params, stats = train_state.params, train_state.batch_stats

    t_selfplay = timed(lambda: learner.generate(params, stats, rng))
    batch, sp_stats = learner.generate(params, stats, rng)
    replay = learner.replay_add(replay, batch)
    obs_b, pi_b, z_b = learner.replay_sample(replay, rng)
    t_train = timed(lambda: learner.train_step(train_state, obs_b, pi_b, z_b))
    t_arena = timed(
        lambda: learner.run_arena(params, stats, params, stats, rng), iters=1
    )
    plies = int(jax.device_get(sp_stats.plies))
    return {
        "selfplay_s": t_selfplay,
        "train_step_s": t_train,
        "arena_s": t_arena,
        "sims_per_s": plies * sims / t_selfplay,
        "samples_per_s": plies / t_selfplay,
    }


def capture_trace(trace_dir: str, batch_size: int = 1024, sims: int = 64) -> None:
    """Record a jax.profiler trace of one self-play generation."""
    from custom_alphazero_tpu.config import Config
    from custom_alphazero_tpu.runtime.loop import Learner
    import dataclasses

    cfg = dataclasses.replace(
        Config(),
        mcts=dataclasses.replace(Config().mcts, simulations=sims),
        self_play=dataclasses.replace(
            Config().self_play, games_per_generation=batch_size
        ),
    )
    learner = Learner(cfg)
    rng = jax.random.PRNGKey(0)
    train_state, _ = learner.init_state(rng)
    params, stats = train_state.params, train_state.batch_stats
    # Warm up (compile outside the trace).
    jax.block_until_ready(learner.generate(params, stats, rng)[0].obs)
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(learner.generate(params, stats, rng)[0].obs)
    print(f"Trace written to {trace_dir}")


def main():
    trace_dir = None
    for arg in sys.argv[1:]:
        if arg.startswith("--trace-dir="):
            trace_dir = arg.split("=", 1)[1]
    timings = phase_timings()
    for key, value in timings.items():
        print(f"{key}: {value:,.4f}")
    if trace_dir:
        capture_trace(trace_dir)


if __name__ == "__main__":
    main()
