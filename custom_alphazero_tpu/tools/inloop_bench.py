"""In-loop self-play throughput probe: the full reference workload (250
sims/move, depth-4/128-filter net — reference config.py:22,63,71) across
lockstep batch sizes and continuous mode, measured through the production
Learner.generate program (not the standalone search benchmark).

Run: python -m custom_alphazero_tpu.tools.inloop_bench 1024 2048
"""
import sys
import time

import jax

from custom_alphazero_tpu.config import Config, apply_overrides
from custom_alphazero_tpu.runtime.loop import Learner

batches = [int(a) for a in sys.argv[1:]] or [1024, 2048]
ITERS = 3

for continuous in (False, True):
    for b in batches:
        cfg = apply_overrides(Config(), {
            "mcts.simulations": "250",
            "mcts.use_dirichlet": "true",
            "mcts.dirichlet_alpha": "1.0",
            "mcts.greedy_from_move": "12",
            "self_play.games_per_generation": str(b),
            "self_play.exclude_draws": "false",
            "self_play.continuous": "true" if continuous else "false",
        })
        learner = Learner(cfg)
        rng = jax.random.PRNGKey(0)
        state, _ = learner.init_state(rng)
        params, stats = state.params, state.batch_stats
        t0 = time.perf_counter()
        out = learner.generate(params, stats, rng)
        jax.block_until_ready(out)
        compile_time = time.perf_counter() - t0
        times, all_plies, all_samples = [], [], []
        import numpy as np

        for i in range(ITERS):
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            batch, st = learner.generate(params, stats, k)
            # On the axon tunnel backend block_until_ready can return
            # early; a host transfer is the only reliable barrier
            # (bench.py _sync), so fetch inside the timed region.
            plies = int(np.asarray(st.plies))
            samples = int(np.asarray(batch.valid.sum()))
            times.append(time.perf_counter() - t0)
            all_plies.append(plies)
            all_samples.append(samples)
        t = sorted(times)[len(times) // 2]  # median: robust to sync skew
        idx = times.index(t)
        sims = all_plies[idx] * cfg.mcts.simulations
        print(
            f"continuous={continuous} B={b}: {t:.2f}s/gen "
            f"(all {['%.2f' % x for x in times]}) "
            f"{sims / t:,.0f} sims/s, {all_samples[idx]} samples "
            f"({all_samples[idx] / t:,.0f} samples/s) "
            f"compile+first={compile_time:.1f}s",
            flush=True,
        )
