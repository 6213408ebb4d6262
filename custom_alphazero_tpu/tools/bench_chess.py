"""Chess search throughput benchmark.

CLI: python -m custom_alphazero_tpu.tools.bench_chess [--sims=N] [B1 B2 ...]
Measures MCTS simulations/s on the pure-JAX chess engine with the
reference-scale net (depth 4, 128 filters) and with a uniform evaluator
(isolating search+engine cost from the network forward). --sims=800 is the
BASELINE.json configs[3] chess workload (AlphaZero 800 sims/move).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.config import ChessConfig, MCTSConfig, ModelConfig
from custom_alphazero_tpu.envs.chess.engine import Chess
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.train import make_evaluate_fn
from custom_alphazero_tpu.search.mcts import MCTS

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

SIMS = 64  # default; override with --sims=
NET = ModelConfig(depth=4, filters=128, value_hidden=256)


def measure(batch_size: int, use_net: bool = True, sims: int = None,
            topk: int = 0, fast: bool = False):
    SIMS = sims or globals()["SIMS"]
    env = Chess(ChessConfig())
    cfg = MCTSConfig(simulations=SIMS, topk_actions=topk,
                     fast_edge_stats=fast)
    mcts = MCTS(env, cfg)
    if use_net:
        net = PolicyValueNet(env.num_actions, NET)
        variables = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + env.obs_shape), train=False
        )
        evaluate = make_evaluate_fn(net)
        params, stats = variables["params"], variables.get("batch_stats", {})
    else:
        params, stats = {}, {}

    @jax.jit
    def search(params, stats, states, rng):
        if use_net:
            evaluate_fn = lambda obs: evaluate(params, stats, obs)
        else:
            evaluate_fn = lambda obs: (
                jnp.ones((obs.shape[0], env.num_actions)) / env.num_actions,
                jnp.zeros((obs.shape[0],)),
            )
        tree = mcts.search(states, evaluate_fn, rng, SIMS)
        return mcts.root_child_visits(tree)

    states = jax.vmap(lambda _: env.init())(jnp.arange(batch_size))
    rng = jax.random.PRNGKey(1)
    out = search(params, stats, states, rng)
    np.asarray(out)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = search(params, stats, states, jax.random.PRNGKey(i))
        np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    rate = batch_size * SIMS / dt
    name = "net" if use_net else "uniform"
    if fast:
        name += "+fast"
    print(f"B={batch_size} [{name}]: {rate:,.0f} sims/s ({dt*1e3:.1f} ms/search)")
    return rate


if __name__ == "__main__":
    import sys

    sizes = []
    sims = None
    topk = 0
    fast = False
    for a in sys.argv[1:]:
        if a == "--fast":
            # mcts.fast_edge_stats: incremental child-index edge stats
            # (round 5) — the standalone-search configuration.
            fast = True
            continue
        if a.startswith("--sims="):
            sims = int(a.split("=", 1)[1])
            continue
        if a.startswith("--topk="):
            # Per-node stored prior width (mcts.topk_actions). At high
            # simulation budgets the auto width (= sims) trips an XLA TPU
            # fusion-emitter CHECK on this toolchain; an explicit 128-256
            # is the production-sane setting for chess anyway.
            topk = int(a.split("=", 1)[1])
            continue
        if not a.isdigit() or int(a) < 1:
            from custom_alphazero_tpu.tools.cli import usage_error

            raise usage_error(
                f"bad batch size {a!r}",
                "usage: bench_chess [--sims=N] [--topk=K] [B1 B2 ...] "
                "(positive ints; default 64 256 1024)",
            )
        sizes.append(int(a))
    sizes = sizes or [64, 256, 1024]
    for b in sizes:
        measure(b, use_net=True, sims=sims, topk=topk, fast=fast)
    for b in sizes[-2:]:
        measure(b, use_net=False, sims=sims, topk=topk, fast=fast)
