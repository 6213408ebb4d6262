"""Where do chess search waves spend their time? (VERDICT r2 #4 profile)

Times each component of one simulation wave separately at a given batch:
engine ops (step / step_lite / legal_mask / observe), the net forward,
and whole searches at several simulation budgets — so per-wave totals can
be attributed before optimizing. All timings are steady-state medians over
``iters`` runs with block_until_ready.

Run: python -m custom_alphazero_tpu.tools.profile_chess [--batch=1024]
       [--sims=64] [--iters=20]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.config import ChessConfig, MCTSConfig, ModelConfig
from custom_alphazero_tpu.envs.chess.engine import Chess
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.train import make_evaluate_fn
from custom_alphazero_tpu.search.mcts import MCTS


def _time(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)  # ms


def main(argv=None):
    from custom_alphazero_tpu.tools.cli import parse_kv_args

    args = parse_kv_args(argv or sys.argv[1:], __doc__)
    batch = int(args.get("--batch", 1024))
    sims = int(args.get("--sims", 64))
    iters = int(args.get("--iters", 20))

    env = Chess(ChessConfig())
    net = PolicyValueNet(env.num_actions, ModelConfig())
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + env.obs_shape), train=False
    )
    evaluate = make_evaluate_fn(net)
    params, stats = variables["params"], variables.get("batch_stats", {})

    states = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    actions = jnp.zeros((batch,), jnp.int32) + 600  # some legal-ish action id
    legal = jax.jit(jax.vmap(env.legal_mask))(states)
    first_legal = jnp.argmax(legal, axis=-1).astype(jnp.int32)
    obs = jax.jit(jax.vmap(env.observe))(states)

    report = {"batch": batch}
    report["step_ms"] = _time(
        jax.jit(jax.vmap(env.step)), (states, first_legal), iters
    )
    report["step_lite_ms"] = _time(
        jax.jit(jax.vmap(env.step_lite)), (states, first_legal), iters
    )
    report["legal_mask_ms"] = _time(
        jax.jit(jax.vmap(env.legal_mask)), (states,), iters
    )
    report["observe_ms"] = _time(
        jax.jit(jax.vmap(env.observe)), (states,), iters
    )
    report["forward_ms"] = _time(
        jax.jit(lambda o: evaluate(params, stats, o)), (obs,), iters
    )

    for s in (sims,):
        mcts = MCTS(env, MCTSConfig(simulations=s))
        search = jax.jit(lambda st, k: mcts.root_child_visits(
            mcts.search(
                st,
                lambda o: evaluate(params, stats, o),
                k, s,
            )
        ))
        ms = _time(search, (states, jax.random.PRNGKey(0)), max(3, iters // 4))
        report[f"search{s}_ms"] = ms
        report[f"search{s}_ms_per_wave"] = ms / s
        report[f"search{s}_sims_per_s"] = batch * s / (ms / 1e3)
    # Accounted share of a wave: step (expand) + step_lite * mean-depth
    # (descent) + legal_mask + observe + forward.
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
