"""Connect-4 exact-solver oracle (Python side).

Wraps the native C++ solver (native/c4solver.cpp) via ctypes and reproduces
the reference oracle semantics
(/root/reference/custom_alphazero/exact_solvers/c4_exact_solver.py):

- ``solve_moves`` / ``solve_board``: strong score of a position (sign =
  outcome for the side to move, magnitude = earliness of the win).
- ``ranked_moves_and_value``: rank the legal moves best-first — moves that
  end the game immediately rank first (score -inf in opponent view), the
  rest ascending by the child's score from the opponent's perspective
  (c4_exact_solver.py:51-74) — plus the board value in {-1, 0, 1}.
- ``policy_and_value``: one-hot policy on the best move over the fixed
  action space + value (c4_exact_solver.py:77-85).
- ``make_solver_evaluate_fn``: a host-callback MCTS leaf evaluator — the
  TPU-native replacement for ``ConfigMCTS.use_solver`` (mcts/mcts.py:126-129).

The shared library and the CLI (stdin/stdout protocol compatible with the
reference's vendored binary) are built on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "c4solver.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libc4solver.so")
_CLI = os.path.join(_NATIVE_DIR, "c4solver")

WIDTH, HEIGHT = 7, 6
COL_BITS = HEIGHT + 1
INVALID = -128


def _needs_build(target: str) -> bool:
    return not os.path.exists(target) or (
        os.path.getmtime(target) < os.path.getmtime(_SRC)
    )


def ensure_built() -> str:
    """Compile the shared library (and CLI) if missing or stale."""
    if _needs_build(_LIB):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
        )
    if _needs_build(_CLI):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-DC4_CLI", _SRC, "-o", _CLI],
            check=True,
        )
    return _LIB


def cli_path() -> str:
    ensure_built()
    return _CLI


class ConnectFourSolver:
    """Strong 7x6 Connect-4 solver with a persistent transposition table."""

    def __init__(self):
        ensure_built()
        lib = ctypes.CDLL(_LIB)
        lib.c4_new.restype = ctypes.c_void_p
        lib.c4_free.argtypes = [ctypes.c_void_p]
        lib.c4_solve_moves.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.c4_solve_moves.restype = ctypes.c_int
        lib.c4_solve_bitboard.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int
        ]
        lib.c4_solve_bitboard.restype = ctypes.c_int
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.c4_new())

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.c4_free(self._handle)
            self._handle = None

    # -- core queries ------------------------------------------------------

    def solve_moves(self, moves: str) -> int:
        """Score of the position after a 1-indexed column sequence ("4453")."""
        score = self._lib.c4_solve_moves(self._handle, moves.encode())
        if score == INVALID:
            raise ValueError(f"Illegal or finished move sequence: {moves!r}")
        return score

    def solve_board(self, board: np.ndarray) -> int:
        """Score of a canonical board array (H, W) int8, +1 = side to move,
        row 0 = top (the env's state layout)."""
        current, mask, plies = board_to_bitboard(board)
        score = self._lib.c4_solve_bitboard(self._handle, current, mask, plies)
        if score == INVALID:
            raise ValueError("Board already contains a win")
        return score

    # -- reference-parity oracle API --------------------------------------

    def ranked_moves_and_value(
        self, board: np.ndarray
    ) -> Tuple[List[int], float]:
        """Rank legal columns best-first; value in {-1, 0, 1} for the side to
        move (reference exact_ranked_moves_and_value semantics)."""
        legal = legal_columns(board)
        if not legal:
            raise ValueError("No legal moves (terminal board)")
        child_values = np.zeros(len(legal))
        for i, col in enumerate(legal):
            child, ended = play_canonical(board, col)
            if ended:
                # Game-ending moves (win or board-filling) rank best:
                # -inf in the opponent-view ordering (c4_exact_solver.py:67-69).
                child_values[i] = -np.inf
            else:
                child_values[i] = self.solve_board(child)
        ranked = list(np.argsort(child_values, kind="stable"))
        value = float(np.sign(self.solve_board(board)))
        return ranked, value

    def policy_and_value(
        self, board: np.ndarray, num_actions: int = WIDTH
    ) -> Tuple[np.ndarray, float]:
        """One-hot oracle policy over the fixed action space + value
        (reference exact_policy_and_value, c4_exact_solver.py:77-85)."""
        ranked, value = self.ranked_moves_and_value(board)
        legal = legal_columns(board)
        policy = np.zeros(num_actions)
        policy[legal[int(ranked[0])]] = 1.0
        return policy, value

    def move_rank_score(self, board: np.ndarray, col: int) -> float:
        """Arena solver score of choosing `col`: 1 - (rank+1)/num_legal
        (reference evaluate.py:53-59)."""
        ranked, _ = self.ranked_moves_and_value(board)
        legal = legal_columns(board)
        rank = ranked.index(legal.index(col))
        return 1.0 - (rank + 1) / len(legal)


# ---------------------------------------------------------------------------
# Canonical-board helpers (host-side NumPy)
# ---------------------------------------------------------------------------

def board_to_bitboard(board: np.ndarray) -> Tuple[int, int, int]:
    """Canonical (H, W) array -> (current-player bits, occupancy bits, plies).
    Bit layout matches the native solver: bit = col*(H+1) + row-from-bottom."""
    assert board.shape == (HEIGHT, WIDTH)
    current = mask = 0
    plies = 0
    for row in range(HEIGHT):
        for col in range(WIDTH):
            v = int(board[row, col])
            if v == 0:
                continue
            bit = 1 << (col * COL_BITS + (HEIGHT - 1 - row))
            mask |= bit
            plies += 1
            if v == 1:
                current |= bit
    return current, mask, plies


def legal_columns(board: np.ndarray) -> List[int]:
    return [c for c in range(WIDTH) if board[0, c] == 0]


def play_canonical(board: np.ndarray, col: int) -> Tuple[np.ndarray, bool]:
    """Drop a +1 stone in `col`, mirror to canonical perspective; returns
    (child board, game ended)."""
    child = board.copy()
    rows = np.nonzero(child[:, col] == 0)[0]
    row = rows.max()
    child[row, col] = 1
    ended = _wins_through(child, row, col) or not (child == 0).any()
    return -child, ended


def _wins_through(board: np.ndarray, r: int, c: int, n: int = 4) -> bool:
    color = board[r, c]
    for dr, dc in ((1, 0), (0, 1), (1, 1), (1, -1)):
        count = 1
        for sign in (1, -1):
            rr, cc = r + sign * dr, c + sign * dc
            while 0 <= rr < HEIGHT and 0 <= cc < WIDTH and board[rr, cc] == color:
                count += 1
                rr += sign * dr
                cc += sign * dc
        if count >= n:
            return True
    return False


def make_solver_evaluate_fn(num_actions: int = WIDTH):
    """Host-callback MCTS leaf evaluator: oracle priors + values.

    Replaces the reference's solver-backed leaf evaluation
    (ConfigMCTS.use_solver, mcts/mcts.py:126-129). Terminal boards return
    zeros (the search ignores evaluations of terminal leaves).
    """
    import jax
    import jax.numpy as jnp

    solver = ConnectFourSolver()

    def host_eval(obs):
        obs = np.asarray(obs)
        batch = obs.shape[0]
        probs = np.zeros((batch, num_actions), np.float32)
        values = np.zeros((batch,), np.float32)
        for i in range(batch):
            board = (obs[i, :, :, 1] - obs[i, :, :, 2]).astype(np.int8)
            if not legal_columns(board) or _board_has_win(board):
                continue
            p, v = solver.policy_and_value(board, num_actions)
            probs[i] = p
            values[i] = v
        return probs, values

    def evaluate(obs):
        return jax.pure_callback(
            host_eval,
            (
                jax.ShapeDtypeStruct((obs.shape[0], num_actions), jnp.float32),
                jax.ShapeDtypeStruct((obs.shape[0],), jnp.float32),
            ),
            obs,
            vmap_method="broadcast_all",
        )

    return evaluate


def _board_has_win(board: np.ndarray, n: int = 4) -> bool:
    for r in range(HEIGHT):
        for c in range(WIDTH):
            if board[r, c] != 0 and _wins_through(board, r, c, n):
                return True
    return False
