"""Chess engine: perft validation on standard positions + rule-specific
cases (castling legality, en passant incl. the rank-pin trap,
capture-promotions, mate/stalemate/draw detection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.envs.chess import tables as T
from custom_alphazero_tpu.envs.chess.engine import Chess
from custom_alphazero_tpu.tools.perft import perft

ENV = Chess()
STEP = jax.jit(ENV.step)


def legal_ucis(state):
    mask = np.asarray(state.legal & ~state.terminal)
    return {T.ACTION_UCI[i] for i in np.nonzero(mask)[0]}


def play_canonical(state, uci):
    """Step with a canonical-orientation UCI move."""
    return STEP(state, jnp.int32(T.ACTION_INDEX[uci]))


class GameDriver:
    """Track absolute (white's view) UCIs over the canonical engine: black's
    absolute moves are rank-mirrored into the canonical frame
    (reference Move.mirror, chess/move.py:57-69)."""

    def __init__(self, state=None):
        self.state = state if state is not None else ENV.init()
        self.white_to_move = True

    def push(self, absolute_uci):
        uci = absolute_uci if self.white_to_move else T.mirror_uci(absolute_uci)
        self.state, reward = play_canonical(self.state, uci)
        self.white_to_move = not self.white_to_move
        return float(reward)


def test_action_table():
    assert T.NUM_ACTIONS == 1968
    for uci in ("e2e4", "e1g1", "e1c1", "a7a8q", "a7b8n", "h2g1r", "b1c3"):
        assert uci in T.ACTION_INDEX


def test_startpos_legal_moves():
    state = ENV.init()
    moves = legal_ucis(state)
    assert len(moves) == 20
    assert {"e2e4", "e2e3", "b1c3", "g1f3", "a2a3", "h2h4"} <= moves
    assert "e1g1" not in moves


KNOWN_PERFTS = [
    ("start", [20, 400, 8902]),
    # Kiwipete (castling, pins, checks, promotions in tree).
    ("r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1",
     [48, 2039]),
    # Position 3 (en-passant pin on the rank).
    ("8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1", [14, 191, 2812]),
    # Position 4 (promotions, underpromotions, castling rights).
    ("r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1",
     [6, 264, 9467]),
    # Position 5.
    ("rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8",
     [44, 1486]),
    # Position 4 "mirrored" — black to move exercises canonicalization.
    ("r2q1rk1/pP1p2pp/Q4n2/bbp1p3/Np6/1B3NBn/pPPP1PPP/R3K2R b KQ - 0 1",
     [6, 264, 9467]),
]


@pytest.mark.parametrize("fen,counts", KNOWN_PERFTS,
                         ids=[f[0][:18] for f in KNOWN_PERFTS])
def test_perft(fen, counts):
    root = ENV.init() if fen == "start" else ENV.from_fen(fen)
    for depth, want in enumerate(counts, start=1):
        assert perft(ENV, root, depth) == want, f"{fen} depth {depth}"


@pytest.mark.slow
def test_perft_deep():
    assert perft(ENV, ENV.init(), 4) == 197_281
    kiwi = ENV.from_fen(
        "r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1"
    )
    assert perft(ENV, kiwi, 3) == 97_862


def test_fools_mate():
    game = GameDriver()
    assert game.push("f2f3") == 0.0
    assert game.push("e7e5") == 0.0
    assert game.push("g2g4") == 0.0
    reward = game.push("d8h4")  # Qh4# — mate delivered by black
    assert reward == 1.0
    assert bool(game.state.terminal) and bool(game.state.won)
    assert float(ENV.terminal_value(game.state)) == -1.0
    assert not legal_ucis(game.state)


def test_stalemate():
    # Black to move, Kh8 vs Qf7+Kg6: no moves, not in check.
    state = ENV.from_fen("7k/5Q2/6K1/8/8/8/8/8 b - - 0 1")
    assert bool(state.terminal)
    assert not bool(state.won)
    assert float(ENV.terminal_value(state)) == 0.0


def test_en_passant_capture():
    state = ENV.from_fen("k7/8/8/3pP3/8/8/8/K7 w - d6 0 2")
    assert "e5d6" in legal_ucis(state)
    after, reward = play_canonical(state, "e5d6")
    # Captured pawn removed: the board (now mirrored) holds only 3 pieces.
    assert int(np.sum(np.asarray(after.board) != 0)) == 3
    assert float(reward) == 0.0


def test_en_passant_rank_pin_illegal():
    # Capturing b5xc6 ep would strip both pawns off rank 5, exposing Ka5 to
    # the h5 rook — must be excluded by king safety.
    state = ENV.from_fen("7k/8/8/KPp4r/8/8/8/8 w - c6 0 2")
    assert "b5c6" not in legal_ucis(state)
    assert "b5b6" in legal_ucis(state)


def test_capture_promotion_actions():
    # a7 pawn: a8 is blocked by a rook; capture-promotions on b8 are legal
    # (the reference's action table omitted these — fixed here). King on e1:
    # off the a-file, so the capture doesn't expose it to the a8 rook.
    state = ENV.from_fen("rn5k/P7/8/8/8/8/8/4K3 w - - 0 1")
    moves = legal_ucis(state)
    assert {"a7b8q", "a7b8n", "a7b8r", "a7b8b"} <= moves
    assert "a7a8q" not in moves
    after, _ = play_canonical(state, "a7b8q")
    # Mirrored board: our promoted queen on b8 (rank 7) lands at rank 0 as -Q.
    assert int(np.asarray(after.board)[0, 1]) == -T.QUEEN


def test_castling_rules():
    base = "4k3/8/8/8/8/8/8/R3K2R w KQ - 0 1"
    state = ENV.from_fen(base)
    moves = legal_ucis(state)
    assert {"e1g1", "e1c1"} <= moves
    after, _ = play_canonical(state, "e1g1")
    board = np.asarray(after.board)
    # After mirroring, the castled king/rook appear on rank 7 as -K/-R.
    assert board[7, 6] == -T.KING and board[7, 5] == -T.ROOK
    # In check: castling forbidden.
    state = ENV.from_fen("4k3/8/8/8/8/8/4r3/R3K2R w KQ - 0 1")
    moves = legal_ucis(state)
    assert "e1g1" not in moves and "e1c1" not in moves
    # Crossing an attacked square (f1 by the f-file rook): kingside only.
    state = ENV.from_fen("4k3/8/8/8/8/5r2/8/R3K2R w KQ - 0 1")
    moves = legal_ucis(state)
    assert "e1g1" not in moves and "e1c1" in moves
    # No rights: no castling.
    state = ENV.from_fen("4k3/8/8/8/8/8/8/R3K2R w - - 0 1")
    moves = legal_ucis(state)
    assert "e1g1" not in moves and "e1c1" not in moves


def test_castling_rights_lost_on_rook_capture():
    state = ENV.from_fen("r3k2r/8/8/8/8/8/6B1/4K3 w kq - 0 1")
    after, _ = play_canonical(state, "g2a8")
    rights = np.asarray(after.castling)  # [own_k, own_q, opp_k, opp_q] for black
    assert rights[0] and not rights[1]  # kingside kept, queenside lost


def test_insufficient_material_draw():
    state = ENV.from_fen("8/8/8/4k3/8/8/8/K7 w - - 0 1")
    assert bool(state.terminal) and not bool(state.won)
    state = ENV.from_fen("8/8/8/4kn2/8/8/8/K7 w - - 0 1")
    assert bool(state.terminal)
    state = ENV.from_fen("8/8/8/4kr2/8/8/8/K7 w - - 0 1")
    assert not bool(state.terminal)


def test_threefold_repetition():
    game = GameDriver(ENV.from_fen("k7/8/8/8/8/8/R7/K7 w - - 0 1"))
    # Shuffle rooks/kings back and forth until the start position recurs 3x.
    for _ in range(2):
        for uci in ("a2b2", "a8b8", "b2a2", "b8a8"):
            game.push(uci)
        if bool(game.state.terminal):
            break
    assert bool(game.state.terminal) and not bool(game.state.won)


def test_observation_shape_and_planes():
    state = ENV.init()
    obs = np.asarray(jax.jit(ENV.observe)(state))
    assert obs.shape == (8, 8, 118)
    # Current position planes: own pawns on rank 1 -> one-hot channel 1+6=7.
    assert obs[1, 0, T.PAWN + 6] == 1.0
    assert obs[0, 4, T.KING + 6] == 1.0
    assert obs[7, 4, -T.KING + 6] == 1.0
    # Castling planes all ones at start.
    assert (obs[..., 112:116] == 1.0).all()


def test_vmapped_batch():
    init = jax.vmap(lambda _: ENV.init())(jnp.arange(4))
    acts = jnp.asarray([T.ACTION_INDEX[u] for u in ("e2e4", "d2d4", "g1f3", "b2b3")])
    stepped, rewards = jax.jit(jax.vmap(ENV.step))(init, acts)
    assert stepped.board.shape == (4, 8, 8)
    assert (np.asarray(rewards) == 0).all()
    masks = np.asarray(stepped.legal)
    assert (masks.sum(-1) == 20).all()  # black has 20 replies to any of these


def test_castle_action_ids_still_normal_slider_moves():
    """e1g1/e1c1 are ordinary slider moves when a non-king piece sits on e1
    (the castle legality must OR into those action ids, not overwrite them).
    Regression: a queen on e1 could not play Qg1/Qc1."""
    env = Chess()
    state = env.from_fen("4k3/8/8/8/8/8/8/4Q2K w - - 0 1")
    legal = np.asarray(env.legal_mask(state))
    assert legal[T.CASTLE_K], "Qe1-g1 must be legal"
    assert legal[T.CASTLE_Q], "Qe1-c1 must be legal"
    assert int(legal.sum()) == 23  # 20 queen moves + 3 king moves


def test_incremental_hash_matches_full_recompute():
    """The dual-view incremental Zobrist update (engine._hash_delta) must
    agree with a from-scratch hash at every position of random games,
    including castles, promotions and en-passant when they occur."""
    from custom_alphazero_tpu.envs.chess import engine as E

    env = Chess()
    rng = np.random.default_rng(3)
    step = jax.jit(env.step)
    for game in range(3):
        state = env.init()
        for ply in range(60):
            if bool(state.terminal):
                break
            legal = np.nonzero(np.asarray(env.legal_mask(state)))[0]
            state, _ = step(state, jnp.int32(int(rng.choice(legal))))
            flat = state.board.reshape(64)
            full = np.asarray(
                E._position_hash(flat, state.castling, state.ep_file)
            )
            ring_h = np.asarray(state.hash_ring)[
                (int(state.ring_idx) - 1) % E.HASH_RING
            ]
            np.testing.assert_array_equal(ring_h, full)
            np.testing.assert_array_equal(
                np.asarray(state.piece_hash),
                np.asarray(E._piece_hash_full(flat, E._ZOBRIST)),
            )
            np.testing.assert_array_equal(
                np.asarray(state.piece_hash_flip),
                np.asarray(E._piece_hash_full(flat, E._ZOBRIST_M)),
            )


@pytest.mark.parametrize(
    "fen,uci",
    [
        # Castling both sides, en-passant, capture-promotion, push-promotion.
        ("r3k2r/8/8/8/8/8/8/R3K2R w KQkq - 0 1", "e1g1"),
        ("r3k2r/8/8/8/8/8/8/R3K2R w KQkq - 0 1", "e1c1"),
        ("4k3/8/8/3pP3/8/8/8/4K3 w - d6 0 2", "e5d6"),
        ("3nk3/2P5/8/8/8/8/8/4K3 w - - 0 1", "c7d8q"),
        ("4k3/2P5/8/8/8/8/8/4K3 w - - 0 1", "c7c8n"),
    ],
)
def test_incremental_hash_special_moves(fen, uci):
    from custom_alphazero_tpu.envs.chess import engine as E

    env = Chess()
    state = env.from_fen(fen)
    action = T.ACTION_INDEX[uci]
    assert bool(env.legal_mask(state)[action]), uci
    state, _ = env.step(state, jnp.int32(action))
    flat = state.board.reshape(64)
    np.testing.assert_array_equal(
        np.asarray(state.piece_hash),
        np.asarray(E._piece_hash_full(flat, E._ZOBRIST)),
    )
    np.testing.assert_array_equal(
        np.asarray(state.piece_hash_flip),
        np.asarray(E._piece_hash_full(flat, E._ZOBRIST_M)),
    )


def test_fen_rights_sanitized_against_placement():
    """FEN castling rights without the matching king/rook are cleared at
    load (python-chess cleans the same way). Regression: a board-only FEN
    (rights defaulting to KQkq) with no h1 rook let e1g1 'castle' and
    materialize a rook on f1."""
    env = Chess()
    state = env.from_fen("4k3/8/8/8/8/8/8/4K3 w KQkq - 0 1")
    legal = np.asarray(env.legal_mask(state))
    assert not legal[T.CASTLE_K] and not legal[T.CASTLE_Q]
    assert not np.asarray(state.castling).any()


def test_fen_expired_halfmove_clock_is_terminal():
    """A loaded position with halfmove >= 150 is already a 75-move draw."""
    env = Chess()
    state = env.from_fen("8/8/8/4k3/8/8/4K3/4R3 w - - 150 100")
    assert bool(state.terminal) and not bool(state.won)


def test_phantom_ep_does_not_split_repetition_hash():
    """A double push with no capturing pawn adjacent must hash like the
    same position without the ep square, so repetitions are not missed
    (python-chess keys ep only when an ep capture exists)."""
    from custom_alphazero_tpu.envs.chess import engine as E

    env = Chess()
    # After 1.e4 (no black pawn on d4/f4): ep file is set but phantom.
    s1, _ = env.step(env.init(), jnp.int32(T.ACTION_INDEX["e2e4"]))
    assert int(s1.ep_file) == 4
    flat = s1.board.reshape(64)
    with_ep = np.asarray(E._position_hash(flat, s1.castling, s1.ep_file))
    without = np.asarray(E._position_hash(flat, s1.castling, jnp.int32(-1)))
    np.testing.assert_array_equal(with_ep, without)
    # A real ep-capturable double push must still hash distinct.
    s = env.from_fen("4k3/8/8/8/4p3/8/3P4/4K3 w - - 0 1")
    s2, _ = env.step(s, jnp.int32(T.ACTION_INDEX["d2d4"]))
    flat2 = s2.board.reshape(64)
    with_ep2 = np.asarray(E._position_hash(flat2, s2.castling, s2.ep_file))
    without2 = np.asarray(E._position_hash(flat2, s2.castling, jnp.int32(-1)))
    assert not np.array_equal(with_ep2, without2)


def test_legality_matches_naive_simulation_on_random_games():
    """Cross-validate the pin/check-classification legality against an
    independent naive checker (tests/reference_chess.py: simulate every
    move, scan the whole board for king attacks) along random games."""
    from tests import reference_chess as RC

    env = Chess()
    rng = np.random.default_rng(17)
    step = jax.jit(env.step)
    positions = 0
    for game in range(6):
        state = env.init()
        for ply in range(70):
            if bool(state.terminal):
                break
            got = np.asarray(env.legal_mask(state))
            want, want_check = RC.legal_mask(
                np.asarray(state.board),
                np.asarray(state.castling),
                int(state.ep_file),
            )
            if not np.array_equal(got, want):
                diff = np.nonzero(got != want)[0]
                raise AssertionError(
                    f"game {game} ply {ply}: mismatch at actions "
                    f"{[T.ACTION_UCI[i] for i in diff]} "
                    f"(engine={got[diff]}, naive={want[diff]})"
                )
            assert bool(state.in_check) == want_check
            positions += 1
            legal = np.nonzero(got)[0]
            state, _ = step(state, jnp.int32(int(rng.choice(legal))))
    assert positions > 100
