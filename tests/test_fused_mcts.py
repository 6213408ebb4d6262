"""Bit-exact parity of the fused Pallas search vs the general array-tree MCTS.

The fused kernel (ops/fused_mcts.py) must produce byte-identical root edge
statistics to MCTS.search (search/mcts.py) — same select/expand/backup
semantics as the reference object tree (mcts/mcts.py:111-180). Evaluators are
chosen so every float the two programs compute independently is exactly
representable (dyadic), making the comparison exact rather than tolerance-
based; see the "Exactness" note in ops/fused_mcts.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.config import ConnectNConfig, MCTSConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.ops.fused_mcts import FusedConnectNSearch
from custom_alphazero_tpu.ops.fused_mcts_v2 import FusedConnectNSearchV2
from custom_alphazero_tpu.search.mcts import MCTS


def _random_midgame_states(env, rng, batch, plies):
    """Batch of positions reached by `plies` uniform-random legal moves
    (re-stepped moves on finished games are absorbed, so all states valid)."""
    states = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    for i in range(plies):
        rng, k = jax.random.split(rng)
        legal = jax.vmap(env.legal_mask)(states)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        actions = jax.random.categorical(k, logits, axis=-1)
        states, _ = jax.vmap(env.step)(states, actions)
    return states


def _dyadic_evaluate(env):
    """Evaluator whose outputs are exact dyadic floats depending on the obs:
    probs[a] = (1 + (stones + a) % 4) / 16, value = stones / 64."""

    def evaluate(obs):
        stones = jnp.sum(obs[..., 1] + obs[..., 2], axis=(1, 2))  # (B,)
        a = jnp.arange(env.num_actions, dtype=jnp.float32)[None, :]
        probs = (1.0 + jnp.mod(stones[:, None] + a, 4.0)) / 16.0
        value = stones / 64.0
        return probs, value

    return evaluate


@pytest.mark.parametrize("impl", [FusedConnectNSearch, FusedConnectNSearchV2])
@pytest.mark.parametrize("use_dirichlet", [False, True])
@pytest.mark.parametrize("plies", [0, 6, 20])
def test_fused_matches_general_path(impl, use_dirichlet, plies):
    env = ConnectN(ConnectNConfig())
    cfg = MCTSConfig(simulations=24, use_dirichlet=use_dirichlet)
    batch, sims = 16, 24
    states = _random_midgame_states(
        env, jax.random.PRNGKey(3 + plies), batch, plies
    )
    evaluate = _dyadic_evaluate(env)
    rng = jax.random.PRNGKey(7)

    mcts = MCTS(env, cfg)
    tree = jax.jit(lambda s, r: mcts.search(s, evaluate, r, sims))(states, rng)
    ref_visits = np.asarray(mcts.root_child_visits(tree))
    ref_wsum = np.asarray(mcts.root_child_value_sums(tree))

    fused = impl(env, cfg, block_games=8)
    visits, wsum = jax.jit(
        lambda s, r: fused.search_root_stats(s, evaluate, r, sims)
    )(states, rng)

    np.testing.assert_array_equal(np.asarray(visits), ref_visits)
    np.testing.assert_array_equal(np.asarray(wsum), ref_wsum)


def test_fused_visit_conservation():
    """After k simulations the root's children hold exactly k-1 visits
    (no-backup first simulation, reference mcts.py:170-180) unless the root
    is terminal or search hit terminal leaves (visits still conserved)."""
    env = ConnectN(ConnectNConfig())
    cfg = MCTSConfig(simulations=32)
    states = jax.vmap(lambda _: env.init())(jnp.arange(8))
    fused = FusedConnectNSearch(env, cfg, block_games=8)
    visits, _ = jax.jit(
        lambda s, r: fused.search_root_stats(
            s, _dyadic_evaluate(env), r, 32
        )
    )(states, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(visits).sum(-1), 31)


def test_fused_terminal_root():
    """A terminal root yields zero visits (every sim stops at the root),
    matching the general path."""
    env = ConnectN(ConnectNConfig())
    cfg = MCTSConfig(simulations=8)
    # Build one finished game (vertical four in column 0).
    state = env.init()
    for a in (0, 1, 0, 1, 0, 1, 0):
        state, _ = env.step(state, jnp.int32(a))
    assert bool(state.terminal)
    states = jax.tree.map(lambda x: jnp.stack([x] * 8), state)

    mcts = MCTS(env, cfg)
    tree = jax.jit(
        lambda s, r: mcts.search(s, _dyadic_evaluate(env), r, 8)
    )(states, jax.random.PRNGKey(0))
    fused = FusedConnectNSearch(env, cfg, block_games=8)
    visits, wsum = jax.jit(
        lambda s, r: fused.search_root_stats(s, _dyadic_evaluate(env), r, 8)
    )(states, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(visits), np.asarray(mcts.root_child_visits(tree))
    )
    np.testing.assert_array_equal(np.asarray(visits), 0)


def test_selfplay_fused_matches_general():
    """Self-play generation with the fused kernel produces byte-identical
    samples to the general path (same rng -> same visits -> same moves)."""
    from custom_alphazero_tpu.config import SelfPlayConfig
    from custom_alphazero_tpu.runtime.selfplay import make_selfplay_fn

    env = ConnectN(ConnectNConfig())
    cfg = MCTSConfig(simulations=12, greedy_from_move=4)
    sp = SelfPlayConfig(exclude_draws=True)
    evaluate = _dyadic_evaluate(env)
    rng = jax.random.PRNGKey(11)

    gen_ref = make_selfplay_fn(env, cfg, sp, max_plies=12, fused=False)
    gen_fused = make_selfplay_fn(env, cfg, sp, max_plies=12, fused=True)
    ref_batch, ref_stats = jax.jit(
        lambda r: gen_ref(evaluate, r, 8)
    )(rng)
    fused_batch, fused_stats = jax.jit(
        lambda r: gen_fused(evaluate, r, 8)
    )(rng)
    for a, b in zip(ref_batch, fused_batch):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(ref_stats.plies), np.asarray(fused_stats.plies)
    )


@pytest.mark.parametrize("impl", [FusedConnectNSearch, FusedConnectNSearchV2])
def test_fused_variant_geometry(impl):
    """Non-default board (5x4, connect-3): the padded-window win detection
    and action space must match the general path exactly."""
    env = ConnectN(ConnectNConfig(width=5, height=4, n=3))
    cfg = MCTSConfig(simulations=20)
    states = _random_midgame_states(env, jax.random.PRNGKey(2), 16, 5)
    evaluate = _dyadic_evaluate(env)
    rng = jax.random.PRNGKey(4)

    mcts = MCTS(env, cfg)
    tree = jax.jit(lambda s, r: mcts.search(s, evaluate, r, 20))(states, rng)
    ref = np.asarray(mcts.root_child_visits(tree))
    fused = impl(env, cfg, block_games=16)
    visits, _ = jax.jit(
        lambda s, r: fused.search_root_stats(s, evaluate, r, 20)
    )(states, rng)
    np.testing.assert_array_equal(np.asarray(visits), ref)
