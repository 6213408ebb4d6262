"""Native Connect-4 solver: anchors, invariants, brute-force cross-checks,
CLI protocol (SURVEY.md §4 strategy (c))."""

import functools
import os
import time
import subprocess

import numpy as np
import pytest

from custom_alphazero_tpu import solver as sv
from tests.reference_numpy import RefConnectN

AREA = sv.WIDTH * sv.HEIGHT


@pytest.fixture(scope="module")
def solver():
    return sv.ConnectFourSolver()


def play_out(moves):
    """Apply 0-indexed columns on the NumPy twin; returns the canonical board."""
    b = RefConnectN()
    for m in moves:
        b.play(m)
    return b


def test_double_threat_anchor(solver):
    # After d1 d2 e1 e2 the first player wins with their 4th stone: score 18.
    assert solver.solve_moves("4455") == 18
    assert solver.solve_board(play_out([3, 3, 4, 4]).board) == 18


def test_win_in_one(solver):
    # Current player has 3 in column 3 and plays the 4th: 6 plies played,
    # win on ply 7 (stone #7) => score (42 + 2 - 7) // 2 = 18.
    board = play_out([3, 0, 3, 0, 3, 1]).board
    score = solver.solve_board(board)
    assert score == (AREA + 1 - 6) // 2 == 18


def test_mirror_symmetry(solver):
    rng = np.random.default_rng(0)
    for _ in range(5):
        b = RefConnectN()
        moves = []
        for _ in range(8):
            legal = np.nonzero(b.legal_mask())[0]
            m = int(rng.choice(legal))
            b.play(m)
            moves.append(m)
            if b.terminal:
                break
        if b.terminal:
            continue
        mirrored = "".join(str(sv.WIDTH - m) for m in moves)  # 1-indexed flip
        original = "".join(str(m + 1) for m in moves)
        assert solver.solve_moves(original) == solver.solve_moves(mirrored)


def test_negamax_consistency(solver):
    """solve(p) == max over legal moves of the move's value: ending moves
    score by the ending; others are -solve(child)."""
    rng = np.random.default_rng(7)
    checked = 0
    while checked < 4:
        b = RefConnectN()
        for _ in range(int(rng.integers(8, 14))):
            legal = np.nonzero(b.legal_mask())[0]
            b.play(int(rng.choice(legal)))
            if b.terminal:
                break
        if b.terminal:
            continue
        board = b.board
        parent = solver.solve_board(board)
        best = -10**9
        for col in sv.legal_columns(board):
            child, ended = sv.play_canonical(board, col)
            if ended:
                # Winning move scores by remaining stones; filling move = 0.
                plies = int(np.count_nonzero(board))
                won = sv._board_has_win(-child)
                val = (AREA + 1 - plies) // 2 if won else 0
            else:
                val = -solver.solve_board(child)
            best = max(best, val)
        assert parent == best
        checked += 1


def brute_force(board):
    """Exact negamax on a nearly-full canonical board (pure Python)."""

    def rec(b, plies):
        legal = [c for c in range(sv.WIDTH) if b[0, c] == 0]
        if not legal:
            return 0
        best = -10**9
        for col in legal:
            child, ended = sv.play_canonical(b, col)
            if ended:
                won = sv._board_has_win(-child)
                val = (AREA + 1 - plies) // 2 if won else 0
            else:
                val = -rec(child, plies + 1)
            best = max(best, val)
        return best

    return rec(board, int(np.count_nonzero(board)))


def test_brute_force_cross_check(solver):
    """Random non-terminal positions with <= 9 empty cells: the native solver
    must agree exactly with a pure-Python negamax."""
    rng = np.random.default_rng(11)
    checked = 0
    attempts = 0
    while checked < 6 and attempts < 600:
        attempts += 1
        b = RefConnectN()
        while not b.terminal and np.count_nonzero(b.board) < AREA - 9:
            legal = np.nonzero(b.legal_mask())[0]
            b.play(int(rng.choice(legal)))
        if b.terminal:
            continue
        assert solver.solve_board(b.board) == brute_force(b.board)
        checked += 1
    assert checked >= 3  # enough live deep positions reached


def test_ranked_moves_and_value(solver):
    # Immediate win available: the winning column must rank first and the
    # value must be +1.
    b = play_out([3, 0, 3, 0, 3, 1])
    ranked, value = solver.ranked_moves_and_value(b.board)
    legal = sv.legal_columns(b.board)
    assert legal[ranked[0]] == 3
    assert value == 1.0
    policy, pvalue = solver.policy_and_value(b.board)
    assert policy.argmax() == 3 and policy.sum() == 1.0
    assert pvalue == 1.0


def test_move_rank_score(solver):
    b = play_out([3, 0, 3, 0, 3, 1])
    # Best move scores 1 - 1/7; a non-best move scores strictly less.
    assert solver.move_rank_score(b.board, 3) == pytest.approx(1 - 1 / 7)
    assert solver.move_rank_score(b.board, 0) < 1 - 1 / 7


def test_cli_protocol():
    """Line-per-position protocol: 4 space-separated fields, field 2 = score
    (the contract the reference wrapper parses, c4_exact_solver.py:38-47)."""
    cli = sv.cli_path()
    out = subprocess.run(
        [cli, "-b", "/nonexistent/book"],
        input="4455\n44455556\n",
        capture_output=True,
        text=True,
        timeout=120,
    ).stdout
    lines = out.strip().split("\n")
    assert len(lines) == 2
    for line in lines:
        fields = line.split(" ")
        assert len(fields) == 4
    assert int(lines[0].split(" ")[1]) == 18
    assert int(lines[1].split(" ")[1]) == 7


def test_invalid_sequence_raises(solver):
    with pytest.raises(ValueError):
        solver.solve_moves("8")  # no such column
    with pytest.raises(ValueError):
        solver.solve_moves("1111111")  # column overflow


# ---------------------------------------------------------------------------
# Opening book (generated offline by `c4solver -g <depth> 7x6.book`; tests
# skip until the book ships — generation solves the whole depth-D frontier)
# ---------------------------------------------------------------------------

needs_book = pytest.mark.skipif(
    not os.path.exists(sv.DEFAULT_BOOK), reason="no opening book generated"
)


@needs_book
def test_book_probes_match_direct_solves(solver):
    """Booked solver agrees with the bare solver on in-book and out-of-book
    positions (the book stores exact strong scores)."""
    bare = sv.ConnectFourSolver(book=None)
    assert solver.book_depth >= 1
    # In-book lines (depth <= book depth) and a deeper out-of-book line.
    lines = ["4", "44", "444", "4455", "445566", "44455556"]
    for line in lines:
        if len(line) <= solver.book_depth:
            assert solver.solve_moves(line) == bare.solve_moves(line), line
    assert solver.solve_moves("44455556") == 7


@needs_book
def test_book_empty_board_instant():
    """The whole point: the empty board (minutes bare) probes instantly."""
    booked = sv.ConnectFourSolver()
    t0 = time.time()
    assert booked.solve_moves("") == 1  # first player wins 7x6 connect-4
    assert time.time() - t0 < 1.0


@needs_book
def test_cli_book_flag():
    cli = sv.cli_path()
    out = subprocess.run(
        [cli, "-b", sv.DEFAULT_BOOK],
        input="\n4455\n",
        capture_output=True,
        text=True,
        timeout=120,
    ).stdout
    lines = out.splitlines()
    # Line format is "%s %d %llu %lld" — the position field of the empty
    # board is empty, so index from the right.
    assert int(lines[0].split(" ")[-3]) == 1   # empty board via book
    assert int(lines[1].split(" ")[-3]) == 18


# ---------------------------------------------------------------------------
# Cross-check against the VENDORED reference binary (PascalPons' solver the
# reference actually ships, /root/reference/custom_alphazero/exact_solvers/
# c4solver): score-for-score equality on random positions pins both the
# strong-solver semantics and the CLI line protocol the reference wrapper
# parses (c4_exact_solver.py:28-48).
# ---------------------------------------------------------------------------

_REF_BIN = "/root/reference/custom_alphazero/exact_solvers/c4solver"


def _runnable_reference_binary(tmp_path):
    """The vendored binary is mode 0444 on a read-only mount; copy it out
    and set the exec bit. Returns None when it can't execute here."""
    import shutil
    import stat

    if not os.path.exists(_REF_BIN):
        return None
    dst = str(tmp_path / "ref_c4solver")
    shutil.copy(_REF_BIN, dst)
    os.chmod(dst, os.stat(dst).st_mode | stat.S_IXUSR)
    try:
        probe = subprocess.run(
            [dst], input="4455\n", capture_output=True, text=True, timeout=60
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if probe.returncode != 0 or "4455" not in probe.stdout:
        return None
    return dst


def _random_positions(n, rng, max_plies=28):
    """Unique non-terminal positions as 1-indexed move strings, mixed depths
    (shallow positions are the slow ones for a bookless strong solver, so
    keep them a small fraction)."""
    out = []
    seen = set()
    while len(out) < n:
        depth = int(rng.integers(8, max_plies))
        b = RefConnectN()
        moves = []
        for _ in range(depth):
            legal = np.nonzero(b.legal_mask())[0]
            m = int(rng.choice(legal))
            b.play(m)
            if b.terminal:
                break
            moves.append(m)
        key = "".join(str(m + 1) for m in moves)
        if len(moves) >= 8 and key not in seen:
            seen.add(key)
            out.append(key)
    return out


def test_reference_binary_score_parity(tmp_path):
    ref = _runnable_reference_binary(tmp_path)
    if ref is None:
        pytest.skip("vendored reference binary cannot execute here")
    rng = np.random.default_rng(7)
    positions = _random_positions(300, rng)
    stdin = "\n".join(positions) + "\n"

    ref_out = subprocess.run(
        [ref], input=stdin, capture_output=True, text=True, timeout=600
    ).stdout.strip().splitlines()
    ours_out = subprocess.run(
        [sv.cli_path(), "-b", "/nonexistent/book"], input=stdin,
        capture_output=True, text=True, timeout=600,
    ).stdout.strip().splitlines()

    assert len(ref_out) == len(ours_out) == len(positions)
    for pos, rl, ol in zip(positions, ref_out, ours_out):
        rf, of = rl.split(" "), ol.split(" ")
        # Same line protocol: 4 fields, field 0 echoes the position.
        assert len(rf) == len(of) == 4
        assert rf[0] == of[0] == pos
        # Field 1: identical strong score.
        assert int(rf[1]) == int(of[1]), f"score mismatch at {pos}: {rl} vs {ol}"


def test_solve_cache_roundtrip_and_hits(tmp_path):
    # Round-3 persistent solve cache: exact scores of shallow positions
    # are memoized across solver instances (the practical complement to a
    # full opening book whose 91k frontier solves cost ~60h on this host).
    import time

    cache = str(tmp_path / "cache.npz")
    s1 = sv.ConnectFourSolver(cache=cache)
    board = np.zeros((6, 7), np.int8)
    for col in (3, 3, 4, 4, 2, 5):  # 6 plies: cacheable, nontrivial
        board, ended = sv.play_canonical(board, col)
        assert not ended
    t0 = time.perf_counter()
    score = s1.solve_board(board)
    cold = time.perf_counter() - t0
    s1.flush_cache()
    assert os.path.exists(cache)
    s2 = sv.ConnectFourSolver(cache=cache)
    t0 = time.perf_counter()
    assert s2.solve_board(board) == score
    warm = time.perf_counter() - t0
    assert warm < max(cold, 1e-3)  # pure dict hit, no native solve
    # Deep positions bypass the cache entirely.
    s3 = sv.ConnectFourSolver(cache=str(tmp_path / "c2.npz"))
    deep = np.zeros((6, 7), np.int8)
    import numpy.random as npr
    rng = npr.default_rng(0)
    plies = 0
    while plies < 20:
        legal = sv.legal_columns(deep)
        nxt, ended = sv.play_canonical(deep, int(rng.choice(legal)))
        if ended:
            deep = np.zeros((6, 7), np.int8); plies = 0; continue
        deep = nxt; plies += 1
    s3.solve_board(deep)
    s3.flush_cache()
    assert not os.path.exists(str(tmp_path / "c2.npz"))  # nothing cached


def test_ctypes_book_attach_is_consulted(tmp_path):
    # Regression: the ctypes-path book attach was silently skipped when no
    # cache file existed (round 3), so probes fell through to full solves.
    # A fake score at the empty-board key proves the probe is consulted:
    # a real empty-board solve takes minutes, a probe hit is instant.
    from custom_alphazero_tpu.tools.book_from_cache import (
        canonical_key,
        write_book,
    )

    book = str(tmp_path / "probe.book")
    write_book({canonical_key(0, 0): 3}, 16, book)
    s = sv.ConnectFourSolver(book=book, cache=None)
    assert s.book_depth == 16
    t0 = time.perf_counter()
    assert s.solve_board(np.zeros((6, 7), np.int8)) == 3
    assert time.perf_counter() - t0 < 1.0


def test_book_from_cache_roundtrip(tmp_path):
    # Solve shallow positions into a cache, convert to a native book, and
    # verify a book-only solver probes identical scores instantly.
    from custom_alphazero_tpu.tools.book_from_cache import convert

    cache = str(tmp_path / "cache.npz")
    book = str(tmp_path / "from_cache.book")
    s = sv.ConnectFourSolver(cache=cache)
    rng = np.random.default_rng(5)
    boards, scores = [], []
    while len(boards) < 6:
        b = np.zeros((6, 7), np.int8)
        ended = False
        for _ in range(int(rng.integers(6, 11))):
            legal = sv.legal_columns(b)
            nxt, ended = sv.play_canonical(b, int(rng.choice(legal)))
            if ended:
                break
            b = nxt
        if not ended:
            boards.append(b)
            scores.append(s.solve_board(b))
    s.flush_cache()
    n = convert(cache, book, max_plies=16)
    assert n == len(set(map(lambda x: x.tobytes(), boards)))
    s2 = sv.ConnectFourSolver(book=book, cache=None)
    t0 = time.perf_counter()
    for b, sc in zip(boards, scores):
        assert s2.solve_board(b) == sc
    assert time.perf_counter() - t0 < 1.0  # all probe hits
