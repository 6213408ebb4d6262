"""Data-parallel scaling benchmark: env-steps/s at 1 vs N devices.

Produces the BASELINE.md scaling-efficiency metric (">80% env-steps/s
scaling efficiency 1 host -> N hosts"): weak scaling of the jitted
lockstep self-play generation, with the per-device game batch held
constant while the `data` mesh axis grows. The generation runs under
``shard_map`` so every device steps its own shard of games (the same
program GSPMD partitions in the training loop; shard_map makes the
partitioning explicit so the measurement cannot silently replicate).

CLI:  python -m custom_alphazero_tpu.tools.scaling \
          [--per_device_games=256] [--sims=32] [--plies=8] [--devices=N]

On a multi-chip TPU slice this reports the real number (collectives ride
ICI; there is no cross-game communication in self-play, so efficiency
should be near 1 and bounded by compiler/runtime overheads). On a single
host it can still validate the sharded program end-to-end against virtual
devices (tests/test_parallel.py runs it on the 8-device CPU mesh), but
the efficiency number is meaningless there: virtual devices share the
same physical cores. Prints one JSON line per mesh size plus a final
``scaling_efficiency`` line.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.7 top-level API; the experimental alias is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from custom_alphazero_tpu.config import (
    ConnectNConfig,
    MCTSConfig,
    ModelConfig,
)
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.train import make_evaluate_fn
from custom_alphazero_tpu.search.mcts import MCTS


def build_generate(env, net, mcts_cfg, per_device_games, plies, mesh):
    """Jitted sharded self-play rollout: each device plays its own games.

    Mirrors bench.py's continuous rollout (search -> sample -> step ->
    auto-reset) rather than full-game generation so the measured work per
    device is identical at every mesh size.
    """
    evaluate = make_evaluate_fn(net)
    mcts = MCTS(env, mcts_cfg)
    sims = mcts_cfg.simulations

    def local_rollout(params, batch_stats, keys):
        key = keys[0]
        states = jax.vmap(lambda _: env.init())(
            jnp.arange(per_device_games)
        )
        fresh = states

        def ply(carry, _):
            states, rng = carry
            rng, k_search, k_sample = jax.random.split(rng, 3)
            evaluate_fn = lambda obs: evaluate(params, batch_stats, obs)
            tree = mcts.search(states, evaluate_fn, k_search, sims)
            visits = mcts.root_child_visits(tree).astype(jnp.float32)
            logits = jnp.where(visits > 0, jnp.log(visits), -jnp.inf)
            safe = jnp.where(
                visits.sum(-1, keepdims=True) > 0, logits,
                jnp.zeros_like(logits),
            )
            keys = jax.random.split(k_sample, per_device_games)
            actions = jax.vmap(jax.random.categorical)(keys, safe)
            next_states, _ = jax.vmap(env.step)(states, actions)
            done = jax.vmap(env.is_terminal)(next_states)
            next_states = jax.tree.map(
                lambda f, nxt: jnp.where(
                    done.reshape((-1,) + (1,) * (nxt.ndim - 1)), f, nxt
                ),
                fresh, next_states,
            )
            return (next_states, rng), None

        (states, _), _ = jax.lax.scan(ply, (states, key), length=plies)
        return jax.vmap(env.observe)(states).sum()  # tiny reduced output

    sharded = shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def measure(n_devices: int, per_device_games: int, sims: int, plies: int,
            devices, iters: int = 3) -> dict:
    mesh = Mesh(np.asarray(devices[:n_devices]), ("data",))
    env = ConnectN(ConnectNConfig())
    net = PolicyValueNet(env.num_actions,
                         ModelConfig(depth=2, filters=32, value_hidden=64))
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + env.obs_shape), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    mcts_cfg = MCTSConfig(simulations=sims)
    rollout = build_generate(
        env, net, mcts_cfg, per_device_games, plies, mesh
    )
    keys = jax.random.split(jax.random.PRNGKey(1), n_devices)
    out = rollout(params, batch_stats, keys)
    np.asarray(out)  # sync
    t0 = time.perf_counter()
    for i in range(iters):
        out = rollout(params, batch_stats,
                      jax.random.split(jax.random.PRNGKey(i), n_devices))
        np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    games = n_devices * per_device_games
    return {
        "devices": n_devices,
        "env_steps_per_s": games * plies / dt,
        "sims_per_s": games * plies * sims / dt,
        "seconds_per_rollout": dt,
    }


def main(argv=None):
    args = dict(
        per_device_games=256, sims=32, plies=8, devices=len(jax.devices())
    )
    usage = "usage: scaling " + " ".join(f"[--{k}=N]" for k in args)
    for arg in (argv if argv is not None else sys.argv[1:]):
        key, eq, value = arg.lstrip("-").partition("=")
        if key not in args or not eq or not value.isdigit():
            raise SystemExit(f"bad flag {arg!r} (--key=int only)\n{usage}")
        args[key] = int(value)

    devices = jax.devices()
    n = min(args["devices"], len(devices))
    r1 = measure(1, args["per_device_games"], args["sims"], args["plies"],
                 devices)
    print(json.dumps(r1))
    if n > 1:
        rn = measure(n, args["per_device_games"], args["sims"],
                     args["plies"], devices)
        print(json.dumps(rn))
        eff = rn["env_steps_per_s"] / (n * r1["env_steps_per_s"])
        print(json.dumps({
            "metric": "scaling_efficiency_env_steps",
            "value": round(eff, 4),
            "unit": f"1->{n} devices (weak scaling)",
            "vs_baseline": round(eff / 0.8, 4),
        }))


if __name__ == "__main__":
    main()
