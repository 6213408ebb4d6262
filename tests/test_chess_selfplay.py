"""Chess driven end-to-end through the batched MCTS self-play path.

The reference runs chess through the identical self_play.py pipeline by
flipping ConfigGeneral.game (self_play.py:24-34); here the analogue is the
env registry (`envs.make("chess", ...)`) feeding the same
`runtime.selfplay.make_selfplay_fn`. This locks in (a) lazy registration of
the chess engine via the registry and (b) that the 1968-action engine
composes with the array-tree search and sample assembly.
"""

import dataclasses

import jax
import jax.numpy as jnp

from custom_alphazero_tpu import envs
from custom_alphazero_tpu.config import (
    ChessConfig,
    MCTSConfig,
    ModelConfig,
    SelfPlayConfig,
)
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.selfplay import make_selfplay_fn
from custom_alphazero_tpu.runtime.train import init_train_state, make_evaluate_fn


def test_registry_lazy_loads_chess():
    env = envs.make("chess", ChessConfig())
    assert env.num_actions == 1968
    assert env.obs_shape == (8, 8, 118)


def test_chess_selfplay_end_to_end():
    env = envs.make("chess", ChessConfig())
    mc = ModelConfig(depth=1, filters=8, value_hidden=16)
    net = PolicyValueNet(env.num_actions, mc)
    state = init_train_state(net, mc, jax.random.PRNGKey(0), env.obs_shape)
    evaluate = make_evaluate_fn(net)

    max_plies = 10
    sp_cfg = dataclasses.replace(SelfPlayConfig(), exclude_draws=False)
    selfplay = make_selfplay_fn(env, MCTSConfig(simulations=4), sp_cfg, max_plies)
    gen = jax.jit(
        lambda p, bs, r: selfplay(
            lambda obs: evaluate(p, bs, obs), r, 2
        )
    )
    batch, stats = gen(state.params, state.batch_stats, jax.random.PRNGKey(1))

    # 10 plies never ends a chess game (fastest mate is 4 plies but random
    # nets won't find it with 4 sims — and even if one did, valid plies of
    # decided games still count); truncated games are draws and kept.
    n_valid = int(batch.valid.sum())
    assert n_valid == 2 * max_plies
    pi = batch.policy[batch.valid]
    assert jnp.all(jnp.abs(pi.sum(-1) - 1.0) < 1e-5)
    # every emitted policy is supported only on legal startpos-reachable
    # actions: at least nonneg + finite
    assert jnp.all(pi >= 0)
    assert int(stats.games) == 2
    assert float(stats.mean_game_length) == max_plies


def test_chess_gumbel_selfplay_smoke():
    """Gumbel sequential halving composes with the 1968-action chess engine
    (root candidates m << A; improved-policy targets well-formed)."""
    env = envs.make("chess", ChessConfig())
    cfg = MCTSConfig(simulations=8, use_gumbel=True, gumbel_max_considered=8)
    sp = make_selfplay_fn(env, cfg, SelfPlayConfig(exclude_draws=False),
                          max_plies=6, fused=False)

    def uniform_eval(obs):
        b = obs.shape[0]
        return (jnp.ones((b, env.num_actions)) / env.num_actions,
                jnp.zeros((b,)))

    batch, stats = jax.jit(lambda k: sp(uniform_eval, k, 2))(
        jax.random.PRNGKey(0)
    )
    valid = jax.device_get(batch.valid)
    assert valid.sum() > 0
    pi = jax.device_get(batch.policy)[valid]
    import numpy as np

    np.testing.assert_allclose(pi.sum(-1), 1.0, rtol=1e-4)
    assert (pi >= 0).all()
