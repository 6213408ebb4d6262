"""Array-tree MCTS: exact parity vs the object-tree twin, plus search
invariants (SURVEY.md §4 strategy (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.config import ConnectNConfig, MCTSConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.search.mcts import MCTS
from tests.reference_mcts import RefMCTS
from tests.reference_numpy import RefConnectN

CFG = ConnectNConfig()
ENV = ConnectN(CFG)
A = CFG.num_actions


def uniform_eval_batch(obs):
    b = obs.shape[0]
    return jnp.ones((b, A)) / A, jnp.zeros((b,))


def uniform_eval_ref(board):
    return np.ones(A) / A, 0.0


def make_linear_eval(seed=0):
    """Deterministic pseudo-net shared by both implementations (float32)."""
    rng = np.random.default_rng(seed)
    obs_size = 6 * 7 * 4
    w_p = rng.standard_normal((obs_size, A)).astype(np.float32) * 0.3
    w_v = rng.standard_normal((obs_size,)).astype(np.float32) * 0.05

    def eval_batch(obs):
        flat = obs.reshape((obs.shape[0], -1))
        probs = jax.nn.softmax(flat @ jnp.asarray(w_p), axis=-1)
        value = jnp.tanh(flat @ jnp.asarray(w_v))
        return probs, value

    def eval_ref(board):
        flat = board.observe().reshape(-1).astype(np.float32)
        logits = flat @ w_p
        e = np.exp(logits - logits.max())
        probs = e / e.sum()
        value = float(np.tanh(flat @ w_v))
        return probs.astype(np.float64), value

    return eval_batch, eval_ref


def batched_roots(boards):
    """Stack JAX env states for a list of NumPy twin boards."""
    states = []
    for b in boards:
        state = ENV.init()
        replay = RefConnectN(CFG.width, CFG.height, CFG.n, CFG.gravity)
        for mv in b.move_history:
            state, _ = ENV.step(state, jnp.int32(mv))
            replay.play(mv)
        np.testing.assert_array_equal(np.asarray(state.board), b.board)
        states.append(state)
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)


def play_random_board(seed, plies):
    rng = np.random.default_rng(seed)
    board = RefConnectN(CFG.width, CFG.height, CFG.n, CFG.gravity)
    board.move_history = []
    for _ in range(plies):
        legal = np.nonzero(board.legal_mask())[0]
        if len(legal) == 0 or board.terminal:
            break
        mv = int(rng.choice(legal))
        board.play(mv)
        board.move_history.append(mv)
    return board


@pytest.mark.parametrize("sims", [8, 30])
@pytest.mark.parametrize("dense", [True, False], ids=["dense", "gather"])
def test_parity_uniform_eval(sims, dense):
    boards = [play_random_board(seed, seed % 5) for seed in range(4)]
    roots = batched_roots(boards)
    mcts = MCTS(ENV, MCTSConfig(), dense=dense)
    run = jax.jit(
        lambda rs, k: mcts.search(rs, uniform_eval_batch, k, sims),
        static_argnames=(),
    )
    tree = run(roots, jax.random.PRNGKey(0))
    got_visits = np.asarray(mcts.root_child_visits(tree))
    got_q = np.asarray(mcts.root_q_values(tree))
    for i, board in enumerate(boards):
        ref = RefMCTS(board, uniform_eval_ref)
        ref.search(sims)
        np.testing.assert_array_equal(got_visits[i], ref.root_child_visits(A))
        np.testing.assert_allclose(got_q[i], ref.root_q_values(A), atol=1e-5)


def test_parity_linear_eval():
    eval_batch, eval_ref = make_linear_eval(1)
    boards = [play_random_board(seed + 100, seed % 7) for seed in range(3)]
    roots = batched_roots(boards)
    mcts = MCTS(ENV, MCTSConfig())
    tree = jax.jit(lambda rs, k: mcts.search(rs, eval_batch, k, 40))(
        roots, jax.random.PRNGKey(0)
    )
    got_visits = np.asarray(mcts.root_child_visits(tree))
    for i, board in enumerate(boards):
        ref = RefMCTS(board, eval_ref)
        ref.search(40)
        want = ref.root_child_visits(A)
        # Float32 UCB near-ties may flip a simulation or two vs the float64
        # twin; require the same argmax and near-identical visit profiles.
        assert got_visits[i].argmax() == want.argmax()
        assert np.abs(got_visits[i] - want).max() <= 2
        assert got_visits[i].sum() == want.sum()


def test_visit_conservation():
    """After k sims from a fresh root, root children hold exactly k-1 visits
    (the root-evaluation sim performs no backup)."""
    sims = 50
    roots = batched_roots([play_random_board(0, 0)])
    mcts = MCTS(ENV, MCTSConfig())
    tree = jax.jit(lambda rs, k: mcts.search(rs, uniform_eval_batch, k, sims))(
        roots, jax.random.PRNGKey(0)
    )
    visits = np.asarray(mcts.root_child_visits(tree))
    assert visits.sum() == sims - 1


def test_finds_immediate_win():
    """Mover has three in a row in column 2 — search must pile visits there."""
    board = RefConnectN()
    board.move_history = []
    for mv in [2, 0, 2, 0, 2, 1]:
        board.play(mv)
        board.move_history.append(mv)
    roots = batched_roots([board])
    mcts = MCTS(ENV, MCTSConfig())
    tree = jax.jit(lambda rs, k: mcts.search(rs, uniform_eval_batch, k, 60))(
        roots, jax.random.PRNGKey(0)
    )
    visits = np.asarray(mcts.root_child_visits(tree))[0]
    q = np.asarray(mcts.root_q_values(tree))[0]
    assert visits.argmax() == 2
    assert q[2] == pytest.approx(1.0)  # winning move backs up +1 every visit


def test_blocks_immediate_loss():
    """Opponent threatens column 3; with enough sims the defence dominates."""
    board = RefConnectN()
    board.move_history = []
    for mv in [3, 0, 3, 0, 3]:  # mover-to-act faces three-in-column-3 threat
        board.play(mv)
        board.move_history.append(mv)
    roots = batched_roots([board])
    mcts = MCTS(ENV, MCTSConfig())
    tree = jax.jit(lambda rs, k: mcts.search(rs, uniform_eval_batch, k, 200))(
        roots, jax.random.PRNGKey(0)
    )
    visits = np.asarray(mcts.root_child_visits(tree))[0]
    assert visits.argmax() == 3


def test_dirichlet_noise_changes_exploration():
    cfg = MCTSConfig(use_dirichlet=True, dirichlet_fraction=0.9,
                     dirichlet_alpha=1.0)
    roots = batched_roots([play_random_board(0, 0)])
    mcts = MCTS(ENV, cfg)
    run = jax.jit(lambda rs, k: mcts.search(rs, uniform_eval_batch, k, 40))
    v1 = np.asarray(
        mcts.root_child_visits(run(roots, jax.random.PRNGKey(1))))
    v2 = np.asarray(
        mcts.root_child_visits(run(roots, jax.random.PRNGKey(2))))
    assert v1.sum() == v2.sum() == 39
    assert (v1 != v2).any()  # different noise, different exploration


def test_terminal_root_is_inert():
    board = RefConnectN()
    board.move_history = []
    for mv in [0, 1, 0, 1, 0, 1, 0]:  # vertical win ends the game
        board.play(mv)
        board.move_history.append(mv)
    assert board.terminal
    roots = batched_roots([board])
    mcts = MCTS(ENV, MCTSConfig())
    tree = jax.jit(lambda rs, k: mcts.search(rs, uniform_eval_batch, k, 10))(
        roots, jax.random.PRNGKey(0)
    )
    assert np.asarray(mcts.root_child_visits(tree)).sum() == 0
    assert int(np.asarray(tree.node_count)[0]) == 1
