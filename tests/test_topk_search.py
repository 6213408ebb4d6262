"""Top-K prior-compressed search parity (search/mcts.py module docstring):
with K = min(simulations, A) the compressed layout must produce searches
bit-identical to the full-width path — same RNG stream, same tie-breaks —
on both games, with and without root Dirichlet noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.config import ChessConfig, ConnectNConfig, MCTSConfig
from custom_alphazero_tpu.envs.chess.engine import Chess
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.search.mcts import MCTS


def _pseudo_net(env, seed=7):
    """Deterministic non-uniform evaluator: distinct priors per position."""
    w = jax.random.normal(
        jax.random.PRNGKey(seed),
        (int(np.prod(env.obs_shape)), env.num_actions + 1),
    ) * 0.3

    def evaluate(obs):
        flat = obs.reshape(obs.shape[0], -1)
        out = flat @ w
        return jax.nn.softmax(out[:, :-1], axis=-1), jnp.tanh(out[:, -1])

    return evaluate


def _search_outputs(env, cfg, states, sims, seed=0):
    mcts = MCTS(env, cfg)
    evaluate = _pseudo_net(env)
    tree = jax.jit(
        lambda s, r: mcts.search(s, evaluate, r, sims), static_argnums=()
    )(states, jax.random.PRNGKey(seed))
    return (
        np.asarray(mcts.root_child_visits(tree)),
        np.asarray(mcts.root_child_value_sums(tree)),
        np.asarray(tree.parent),
        np.asarray(tree.parent_action),
        np.asarray(tree.visits),
        np.asarray(tree.value_sum),
    )


@pytest.mark.parametrize("use_noise,fast", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_chess_topk_matches_full_width(use_noise, fast):
    env = Chess(ChessConfig())
    states = jax.vmap(lambda _: env.init())(jnp.arange(3))
    # Diversify roots: play a couple of fixed opening moves on games 1, 2.
    legal0 = np.nonzero(np.asarray(env.legal_mask(env.init())))[0]
    s1, _ = env.step(env.init(), jnp.int32(int(legal0[0])))
    s2, _ = env.step(s1, jnp.int32(int(np.nonzero(np.asarray(env.legal_mask(s1)))[0][3])))
    states = jax.tree.map(
        lambda a, b, c: jnp.stack([a, b, c]),
        env.init(), s1, s2,
    )
    sims = 24
    base = MCTSConfig(
        simulations=sims, use_dirichlet=use_noise, dirichlet_alpha=0.5,
        fast_edge_stats=fast,
    )
    full = _search_outputs(
        env, base.__class__(**{**base.__dict__, "topk_actions": -1}),
        states, sims,
    )
    comp = _search_outputs(env, base, states, sims)
    mcts = MCTS(env, base)
    assert mcts.prior_width(sims) == sims < env.num_actions
    for f, c in zip(full, comp):
        np.testing.assert_array_equal(f, c)


def test_connect_n_auto_width_is_full():
    env = ConnectN(ConnectNConfig())
    mcts = MCTS(env, MCTSConfig(simulations=64))
    assert mcts.prior_width(64) == env.num_actions  # A=7 < sims: no change


def test_chess_auto_width_clamped_at_high_sims():
    # Round-3 fix (VERDICT r2): auto K used to be min(sims, A), so
    # --sims=800 materialized (B, 800, 800) per-wave tensors — the slow
    # configuration AND the one that stressed the XLA fusion emitter.
    # Auto now clamps to MCTS.AUTO_TOPK_CLAMP for large action spaces.
    env = Chess(ChessConfig())
    mcts = MCTS(env, MCTSConfig(simulations=800))
    assert mcts.prior_width(800) == MCTS.AUTO_TOPK_CLAMP
    # Explicit settings still override in both directions.
    assert MCTS(env, MCTSConfig(simulations=800, topk_actions=512)
                ).prior_width(800) == 512
    assert MCTS(env, MCTSConfig(simulations=800, topk_actions=-1)
                ).prior_width(800) == env.num_actions
    # Small action spaces (Connect-4) are never clamped.
    cenv = ConnectN(ConnectNConfig())
    assert MCTS(cenv, MCTSConfig(simulations=800)).prior_width(800) == 7


def test_config_validation_rejects_bad_topk():
    from custom_alphazero_tpu.config import Config, validate

    cfg = Config()
    bad = cfg.__class__(
        **{**cfg.__dict__, "mcts": MCTSConfig(topk_actions=-5)}
    )
    with pytest.raises(ValueError, match="topk_actions"):
        validate(bad)
    bad2 = cfg.__class__(
        **{**cfg.__dict__, "mcts": MCTSConfig(simulations=0)}
    )
    with pytest.raises(ValueError, match="simulations"):
        validate(bad2)
