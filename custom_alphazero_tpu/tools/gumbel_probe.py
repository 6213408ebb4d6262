"""On-chip bisect probe for the Gumbel chess-scale kernel fault.

Runs GumbelMCTS.search_select STANDALONE (one jitted call, no generation
ply scan around it) at chess scale, to separate "the search program
itself faults" from "the fault needs the scan nesting".

Run: python -m custom_alphazero_tpu.tools.gumbel_probe [B] [--sims=N]
"""
import sys
import time

import jax
import jax.numpy as jnp

from custom_alphazero_tpu.config import Config, apply_overrides
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.loop import make_env
from custom_alphazero_tpu.runtime.train import make_evaluate_fn
from custom_alphazero_tpu.search.gumbel import GumbelMCTS
from custom_alphazero_tpu.tools.cli import parse_args


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    flags, positional = parse_args(argv, __doc__)
    b = int(positional[0]) if positional else 64
    sims = int(flags.pop("--sims", 100))
    uniform = flags.pop("--uniform", "false") == "true"

    cfg = apply_overrides(Config(), {
        "game": "chess",
        "mcts.simulations": str(sims),
        "mcts.use_gumbel": "true",
        "mcts.use_dirichlet": "false",
    })
    env = make_env(cfg)
    search = GumbelMCTS(env, cfg.mcts)
    a = env.num_actions

    if uniform:
        def evaluate(obs):
            n = obs.shape[0]
            return (jnp.full((n, a), 1.0 / a, jnp.float32),
                    jnp.zeros((n,), jnp.float32))
        params = batch_stats = None
    else:
        net = PolicyValueNet(env.num_actions, cfg.model)
        rng = jax.random.PRNGKey(0)
        variables = net.init(rng, jnp.zeros((1,) + env.obs_shape))
        params, batch_stats = (variables["params"],
                               variables.get("batch_stats", {}))
        ev = make_evaluate_fn(net)

        def evaluate(obs):
            return ev(params, batch_stats, obs)

    @jax.jit
    def run(rng):
        states = jax.vmap(lambda _: env.init())(jnp.arange(b))
        tree, action, pi = search.search_select(
            states, evaluate, rng, sims
        )
        return action, pi

    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    action, pi = run(rng)
    jax.block_until_ready((action, pi))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    action, pi = run(jax.random.PRNGKey(2))
    import numpy as np
    act = np.asarray(action)
    t = time.perf_counter() - t0
    print(
        f"OK B={b} sims={sims} uniform={uniform}: compile={compile_t:.1f}s "
        f"run={t:.3f}s ({b * sims / t:,.0f} sims/s) actions[:4]={act[:4]}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
