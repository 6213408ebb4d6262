"""Chess in-loop generation probe at large lockstep batch.

Validates the round-3 crash configuration on-chip — chess generation at
batch >= 128 used to OOM the TPU worker through raw f32 118-plane per-ply
sample buffers (fixed by in-scan bit-packed generation buffers,
runtime/selfplay.py obs_codec) — and measures sims/s through the
production Learner.generate program for both the PUCT and the Gumbel
regimes (reference workload: game-generic self-play,
/root/reference/custom_alphazero/self_play.py:24-34,98-110).

Run: python -m custom_alphazero_tpu.tools.chess_inloop_bench [B ...]
Flags: --sims=N (default 100) --gumbel={both,true,false} --iters=N
"""
import sys
import time

import jax
import numpy as np

from custom_alphazero_tpu.config import Config, apply_overrides
from custom_alphazero_tpu.runtime.loop import Learner
from custom_alphazero_tpu.tools.cli import parse_args


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    flags, positional = parse_args(argv, __doc__)
    batches = [int(a) for a in positional] or [256]
    sims = int(flags.pop("--sims", 100))
    gumbel_mode = flags.pop("--gumbel", "both")
    iters = int(flags.pop("--iters", 2))
    compress = flags.pop("--compress", "true")
    max_plies = flags.pop("--max_plies", "")
    if flags:
        print(f"unknown flags: {sorted(flags)}", file=sys.stderr)
        return 2

    gumbel_arms = {
        "both": (False, True), "true": (True,), "false": (False,)
    }[gumbel_mode]
    for gumbel in gumbel_arms:
        for b in batches:
            cfg = apply_overrides(Config(), {
                "game": "chess",
                "mcts.simulations": str(sims),
                "mcts.use_dirichlet": "false" if gumbel else "true",
                "mcts.dirichlet_alpha": "0.3",
                "mcts.use_gumbel": "true" if gumbel else "false",
                "mcts.greedy_from_move": "30",
                "self_play.games_per_generation": str(b),
                "self_play.exclude_draws": "false",
                "self_play.continuous": "true",
                "replay.compress_obs": compress,
                **({"self_play.max_plies": max_plies} if max_plies else {}),
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
            for _ in range(iters):
                rng, k = jax.random.split(rng)
                t0 = time.perf_counter()
                batch, st = learner.generate(params, stats, k)
                # Host transfer is the only reliable barrier on the axon
                # tunnel backend (bench.py _sync).
                plies = int(np.asarray(st.plies))
                samples = int(np.asarray(batch.valid.sum()))
                times.append(time.perf_counter() - t0)
                all_plies.append(plies)
                all_samples.append(samples)
            t = sorted(times)[len(times) // 2]
            idx = times.index(t)
            n_sims = all_plies[idx] * sims
            print(
                f"gumbel={gumbel} B={b} sims={sims}: {t:.2f}s/gen "
                f"(all {['%.2f' % x for x in times]}) "
                f"{n_sims / t:,.0f} sims/s, {all_samples[idx]} samples "
                f"({all_samples[idx] / t:,.0f} samples/s) "
                f"compile={compile_time:.1f}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
