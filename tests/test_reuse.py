"""Subtree reuse between moves (reference mcts.py:207: play() advances the
root to the played child and the next search continues on its statistics).

Exact multi-move parity of MCTS.search_tree + MCTS.advance_root against the
object-tree twin driven with the same re-rooting, plus truncation and
self-play integration checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.config import (
    ConnectNConfig,
    MCTSConfig,
    SelfPlayConfig,
)
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.runtime.selfplay import make_selfplay_fn
from custom_alphazero_tpu.search.mcts import MCTS
from tests.reference_mcts import RefMCTS
from tests.reference_numpy import RefConnectN
from tests.test_mcts import (
    batched_roots,
    make_linear_eval,
    play_random_board,
    uniform_eval_batch,
    uniform_eval_ref,
)

CFG = ConnectNConfig()
ENV = ConnectN(CFG)
A = CFG.num_actions


def drive_reused_game(boards, eval_batch, eval_ref, sims, capacity,
                      max_plies=12):
    """Drive both implementations through a greedy game with subtree reuse;
    compare root visit vectors before every move. Returns plies compared."""
    mcts = MCTS(ENV, MCTSConfig(simulations=sims))
    keep_cap = capacity - sims
    states = batched_roots(boards)
    tree = jax.vmap(lambda s: mcts.init_tree(s, capacity))(states)
    free = jnp.ones((len(boards),), jnp.int32)

    search = jax.jit(
        lambda t, f, k: mcts.search_tree(t, f, eval_batch, k, sims)
    )
    advance = jax.jit(
        lambda t, a, s: mcts.advance_root(t, a, keep_cap, s)
    )
    step = jax.jit(jax.vmap(ENV.step))

    refs = [RefMCTS(b, eval_ref) for b in boards]
    live = [True] * len(boards)
    compared = 0
    for ply in range(max_plies):
        tree, free = search(tree, free, jax.random.PRNGKey(ply))
        got = np.asarray(mcts.root_child_visits(tree))
        for i, ref in enumerate(refs):
            if not live[i]:
                continue
            ref.search(sims)
            want = ref.root_child_visits(A)
            np.testing.assert_array_equal(
                got[i], want,
                err_msg=f"game {i} ply {ply}",
            )
            compared += 1
        actions = got.argmax(axis=1).astype(np.int32)
        states, _ = step(states, jnp.asarray(actions))
        tree, free = advance(tree, jnp.asarray(actions), states)
        term = np.asarray(jax.vmap(ENV.is_terminal)(states))
        for i, ref in enumerate(refs):
            if live[i]:
                ref.advance(int(actions[i]))
                live[i] = not bool(term[i])
        if not any(live):
            break
    return compared


def test_reuse_parity_uniform_eval():
    boards = [play_random_board(seed, seed % 4) for seed in range(3)]
    compared = drive_reused_game(
        boards, uniform_eval_batch, uniform_eval_ref,
        sims=12, capacity=12 * 14,
    )
    assert compared >= 20


def test_reuse_parity_linear_eval():
    eval_batch, eval_ref = make_linear_eval(7)
    boards = [play_random_board(seed + 50, seed % 3) for seed in range(2)]
    mcts = MCTS(ENV, MCTSConfig(simulations=10))
    capacity, sims = 10 * 14, 10
    states = batched_roots(boards)
    tree = jax.vmap(lambda s: mcts.init_tree(s, capacity))(states)
    free = jnp.ones((len(boards),), jnp.int32)
    search = jax.jit(
        lambda t, f, k: mcts.search_tree(t, f, eval_batch, k, sims)
    )
    advance = jax.jit(
        lambda t, a, s: mcts.advance_root(t, a, capacity - sims, s)
    )
    step = jax.jit(jax.vmap(ENV.step))
    refs = [RefMCTS(b, eval_ref) for b in boards]
    for ply in range(6):
        tree, free = search(tree, free, jax.random.PRNGKey(ply))
        got = np.asarray(mcts.root_child_visits(tree))
        for i, ref in enumerate(refs):
            ref.search(sims)
            want = ref.root_child_visits(A)
            # Float32 UCB near-ties may flip a simulation vs the float64
            # twin; visit mass and totals must agree.
            assert np.abs(got[i] - want).max() <= 2, (ply, got[i], want)
            assert got[i].sum() == want.sum()
        actions = got.argmax(axis=1).astype(np.int32)
        states, _ = step(states, jnp.asarray(actions))
        tree, free = advance(tree, jnp.asarray(actions), states)
        if bool(np.asarray(jax.vmap(ENV.is_terminal)(states)).all()):
            break
        for i, ref in enumerate(refs):
            ref.advance(int(actions[i]))


def test_reuse_visit_accumulation():
    """After the first search the root's children hold sims-1 visits (the
    root-evaluation sim performs no backup); each subsequent search on a
    carried, already-expanded root backs up every simulation: the new total
    equals the advanced child's carried subtree visits plus sims."""
    sims, capacity = 16, 16 * 14
    mcts = MCTS(ENV, MCTSConfig(simulations=sims))
    states = batched_roots([play_random_board(0, 0)])
    tree = jax.vmap(lambda s: mcts.init_tree(s, capacity))(states)
    free = jnp.ones((1,), jnp.int32)
    search = jax.jit(
        lambda t, f, k: mcts.search_tree(t, f, uniform_eval_batch, k, sims)
    )
    advance = jax.jit(
        lambda t, a, s: mcts.advance_root(t, a, capacity - sims, s)
    )
    tree, free = search(tree, free, jax.random.PRNGKey(0))
    visits = np.asarray(mcts.root_child_visits(tree))[0]
    assert visits.sum() == sims - 1

    action = int(visits.argmax())
    # Carried subtree of the played child: grandchildren visits of the
    # played edge = (child's subtree internal edge visits).
    parent = np.asarray(tree.parent)[0]
    pact = np.asarray(tree.parent_action)[0]
    tvis = np.asarray(tree.visits)[0]
    cstar = [i for i in range(len(parent))
             if parent[i] == 0 and pact[i] == action]
    assert len(cstar) == 1
    carried = int(tvis[[i for i in range(len(parent))
                        if parent[i] == cstar[0]]].sum())

    states2, _ = jax.vmap(ENV.step)(states, jnp.asarray([action]))
    tree, free = advance(tree, jnp.asarray([action]), states2)
    new_visits = np.asarray(mcts.root_child_visits(tree))[0]
    assert new_visits.sum() == carried  # stats preserved across re-rooting

    tree, free = search(tree, free, jax.random.PRNGKey(1))
    after = np.asarray(mcts.root_child_visits(tree))[0]
    assert after.sum() == carried + sims  # every sim backs up now


def test_reuse_truncation_keeps_most_visited():
    """With a tight capacity the kept subtree drops the least-visited edges
    but search stays functional and the kept root children are preserved."""
    sims = 24
    capacity = sims + 8  # keep_cap = 8: heavy truncation every move
    mcts = MCTS(ENV, MCTSConfig(simulations=sims))
    states = batched_roots([play_random_board(3, 2)])
    tree = jax.vmap(lambda s: mcts.init_tree(s, capacity))(states)
    free = jnp.ones((1,), jnp.int32)
    search = jax.jit(
        lambda t, f, k: mcts.search_tree(t, f, uniform_eval_batch, k, sims)
    )
    advance = jax.jit(
        lambda t, a, s: mcts.advance_root(t, a, capacity - sims, s)
    )
    for ply in range(6):
        tree, free = search(tree, free, jax.random.PRNGKey(ply))
        visits = np.asarray(mcts.root_child_visits(tree))[0]
        assert visits.sum() > 0
        # Every kept node's parent is kept (no dangling pointers).
        parent = np.asarray(tree.parent)[0]
        linked = np.nonzero(parent >= 0)[0]
        count = int(np.asarray(free)[0])
        assert (parent[linked] < linked).all()  # creation order preserved
        assert (linked < count).all()
        action = int(visits.argmax())
        states, _ = jax.vmap(ENV.step)(states, jnp.asarray([action]))
        tree, free = advance(tree, jnp.asarray([action]), states)
        assert int(np.asarray(free)[0]) <= capacity - sims
        if bool(np.asarray(jax.vmap(ENV.is_terminal)(states))[0]):
            break


def test_selfplay_with_reuse_matches_sample_semantics():
    """The reuse path produces structurally valid samples: prefix liveness,
    z sign alternation from the end, policies normalized over legal moves."""
    cfg = ConnectNConfig(width=5, height=4, n=3)
    env = ConnectN(cfg)
    max_plies = cfg.width * cfg.height
    sp = make_selfplay_fn(
        env,
        MCTSConfig(simulations=12, reuse_tree=True, greedy_from_move=4),
        SelfPlayConfig(exclude_draws=False),
        max_plies,
    )
    batch_size = 8
    batch, stats = jax.jit(
        lambda k: sp(
            lambda obs: (
                jnp.ones((obs.shape[0], cfg.num_actions))
                / cfg.num_actions,
                jnp.zeros((obs.shape[0],)),
            ),
            k,
            batch_size,
        )
    )(jax.random.PRNGKey(0))
    valid = np.asarray(batch.valid).reshape(max_plies, batch_size)
    z = np.asarray(batch.value).reshape(max_plies, batch_size)
    pi = np.asarray(batch.policy).reshape(max_plies, batch_size, -1)
    assert int(stats.games) == batch_size
    lengths = valid.sum(axis=0)
    assert (lengths >= cfg.n * 2 - 1).all()
    for g in range(batch_size):
        L = int(lengths[g])
        assert valid[:L, g].all() and not valid[L:, g].any()
        live_pi = pi[:L, g]
        np.testing.assert_allclose(live_pi.sum(-1), 1.0, atol=1e-5)
        # z alternates sign from the end (or is all zero on a draw).
        zl = z[:L, g]
        if zl[-1] != 0:
            signs = zl * (-1.0) ** np.arange(L - 1, -1, -1)
            assert (signs > 0).all() or (signs < 0).all()
