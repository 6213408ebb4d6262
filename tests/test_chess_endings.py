"""Targeted cross-validation of chess DRAW ENDINGS (VERDICT r1 next #8).

The engine's game-over logic deviates from the reference's python-chess
``is_game_over`` in documented ways (envs/chess/engine.py:19-27): repetition
uses a dual-32-bit Zobrist ring over the last 100 plies with 3 occurrences =
draw, ep hashes pseudo-legally, the 75-move rule fires at halfmove >= 150.
The legality cross-validation (test_chess.py) never reaches these endings on
random 70-ply games, so this test drives >= 1k games INTO them from sparse
endgame starts with quiet-move-biased play, while an independent host-side
twin tracks, per ply:

- the halfmove clock (pawn move / capture resets),
- an exact position-history multiset over the engine's own 100-ply window
  (position key = canonical board + castling + pseudo-legal-effective ep,
  the same key the ring hashes — collisions aside, counts must agree),
- insufficient material (bare kings / one minor / same-colour single
  bishops),

and validates every game end against it: each declared terminal must have a
host-confirmed cause, mates/stalemates re-checked with the naive
board-scanning referee (tests/reference_chess.py), and conversely no
host-detected ending may be missed by the engine at the ply it occurs.
Ending-type coverage is asserted so the draws are actually exercised.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.envs.chess import tables as T
from custom_alphazero_tpu.envs.chess.engine import HASH_RING, Chess
from tests import reference_chess as RC

ENV = Chess()

SCENARIOS = [
    # (fen, games) — sparse endgames that reach draws quickly.
    ("1r2k3/8/8/8/8/8/8/1R2K3 w - - 0 1", 192),   # KR vs KR
    ("1n2k3/8/8/8/8/8/8/1N2K3 w - - 0 1", 192),   # KN vs KN
    ("2b1k3/8/8/8/8/8/8/2B1K3 w - - 0 1", 192),   # KB vs KB (opposite colours)
    ("3qk3/8/8/8/8/8/8/3QK3 w - - 0 1", 192),     # KQ vs KQ
    ("4k3/4p3/8/8/8/8/4P3/4K3 w - - 0 1", 192),   # KP vs KP
    ("1rb1k3/8/8/8/8/8/8/1RB1K3 w - - 0 1", 192),  # KRB vs KRB
]
MAX_PLIES = 260
QUIET_WEIGHT = 25.0  # prefer non-capture non-pawn moves: runs up the clock


def _host_insufficient(flat):
    counts = {
        p: int(np.sum(flat == p) + np.sum(flat == -p))
        for p in (T.PAWN, T.KNIGHT, T.BISHOP, T.ROOK, T.QUEEN)
    }
    heavy = counts[T.PAWN] + counts[T.ROOK] + counts[T.QUEEN]
    minors = counts[T.KNIGHT] + counts[T.BISHOP]
    if heavy == 0 and minors <= 1:
        return True
    own_b = np.nonzero(flat == T.BISHOP)[0]
    opp_b = np.nonzero(flat == -T.BISHOP)[0]
    if (heavy == 0 and counts[T.KNIGHT] == 0
            and len(own_b) == 1 and len(opp_b) == 1):
        colour = lambda sq: (sq // 8 + sq % 8) % 2  # noqa: E731
        return colour(own_b[0]) == colour(opp_b[0])
    return False


def _host_effective_ep(flat, ep_file):
    """Pseudo-legal ep gate, mirroring engine._hashable_ep: ep counts only
    when an own pawn stands beside the pushed pawn on rank index 4."""
    if ep_file < 0:
        return -1
    base = 4 * 8 + ep_file
    left = ep_file >= 1 and flat[base - 1] == T.PAWN
    right = ep_file <= 6 and flat[base + 1] == T.PAWN
    return ep_file if (left or right) else -1


def _key(flat, castling, ep_file):
    return (flat.tobytes(), castling.tobytes(),
            _host_effective_ep(flat, ep_file))


class HostGame:
    """Independent per-game ending tracker."""

    def __init__(self, flat, castling, ep_file, halfmove):
        self.clock = int(halfmove)
        self.window = collections.deque(maxlen=HASH_RING)
        self.window.append(_key(flat, castling, ep_file))
        self.done = False

    def on_move(self, prev_flat, action, flat, castling, ep_file):
        frm, to = int(T.FROM[action]), int(T.TO[action])
        piece = int(prev_flat[frm])
        is_pawn = piece == T.PAWN
        captured = prev_flat[to] != 0 or (
            is_pawn and (to % 8) != (frm % 8) and prev_flat[to] == 0
        )
        self.clock = 0 if (is_pawn or captured) else self.clock + 1
        self.window.append(_key(flat, castling, ep_file))

    @property
    def repetitions(self):
        return sum(1 for k in self.window if k == self.window[-1])


@pytest.mark.slow
def test_draw_endings_cross_validation():
    step = jax.jit(jax.vmap(ENV.step))
    rng = np.random.default_rng(11)
    endings = collections.Counter()
    games_played = 0

    for fen, batch in SCENARIOS:
        one = ENV.from_fen(fen)
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one
        )
        host = [
            HostGame(
                np.asarray(one.board).reshape(64),
                np.asarray(one.castling), int(one.ep_file),
                int(one.halfmove),
            )
            for _ in range(batch)
        ]
        games_played += batch

        for ply in range(MAX_PLIES):
            boards = np.asarray(states.board).reshape(batch, 64)
            castles = np.asarray(states.castling)
            eps = np.asarray(states.ep_file)
            halfs = np.asarray(states.halfmove)
            terms = np.asarray(states.terminal)
            wons = np.asarray(states.won)
            legals = np.asarray(states.legal)
            checks = np.asarray(states.in_check)

            actions = np.zeros(batch, np.int32)
            for g in range(batch):
                hg = host[g]
                if terms[g]:
                    if not hg.done:
                        hg.done = True
                        endings[_classify_and_validate(
                            hg, boards[g], castles[g], eps[g], halfs[g],
                            wons[g], legals[g], checks[g],
                        )] += 1
                    continue
                # Live game: the host twin must agree nothing has ended.
                assert hg.clock == int(halfs[g]), (
                    f"clock divergence at ply {ply}: "
                    f"host {hg.clock} vs engine {int(halfs[g])}"
                )
                assert hg.clock < 150
                assert hg.repetitions < 3, (
                    f"host sees {hg.repetitions} repetitions in the window "
                    "but the engine did not end the game"
                )
                assert not _host_insufficient(boards[g])
                legal_idx = np.nonzero(legals[g])[0]
                assert len(legal_idx) > 0
                weights = np.ones(len(legal_idx))
                for j, a in enumerate(legal_idx):
                    frm, to = int(T.FROM[a]), int(T.TO[a])
                    quiet = boards[g][to] == 0 and boards[g][frm] != T.PAWN
                    if quiet:
                        weights[j] = QUIET_WEIGHT
                actions[g] = rng.choice(legal_idx, p=weights / weights.sum())

            if all(hg.done for hg in host):
                break
            prev_boards = boards
            states, _ = step(states, jnp.asarray(actions))
            new_boards = np.asarray(states.board).reshape(batch, 64)
            new_castles = np.asarray(states.castling)
            new_eps = np.asarray(states.ep_file)
            for g in range(batch):
                if not host[g].done and not terms[g]:
                    host[g].on_move(
                        prev_boards[g], int(actions[g]), new_boards[g],
                        new_castles[g], int(new_eps[g]),
                    )

        # Any game still live at the cap counts as truncated (not an error).
        for hg in host:
            if not hg.done:
                endings["truncated"] += 1

    assert games_played >= 1000
    # The draw machinery must actually have been exercised. (Checkmates and
    # stalemates occur but rarely under quiet-biased play — mate detection
    # has its own coverage in test_chess.py; here >= 1 keeps the referee
    # comparison exercised.)
    assert endings["repetition"] >= 50, endings
    assert endings["seventy_five"] >= 100, endings
    assert endings["insufficient"] >= 50, endings
    assert endings["checkmate"] >= 1, endings
    assert endings["stalemate"] >= 1, endings
    print("ending coverage:", dict(endings))


def _classify_and_validate(hg, flat, castling, ep_file, halfmove,
                           won, legal, in_check):
    """Return the host-confirmed cause of this game's end (engine state is
    at the terminal ply); raise if no cause is confirmed."""
    if won:
        # Checkmate per the naive referee: no legal moves, king attacked.
        want, want_check = RC.legal_mask(
            flat.reshape(8, 8), castling, int(ep_file)
        )
        assert not want.any() and want_check, "engine mate but referee disagrees"
        return "checkmate"
    if _host_insufficient(flat):
        return "insufficient"
    if hg.clock >= 150:
        assert int(halfmove) >= 150
        return "seventy_five"
    if hg.repetitions >= 3:
        return "repetition"
    # Must be stalemate: confirm with the naive referee.
    want, want_check = RC.legal_mask(flat.reshape(8, 8), castling, int(ep_file))
    assert not want.any() and not want_check, (
        f"engine ended the game but the host twin finds no cause "
        f"(clock={hg.clock}, reps={hg.repetitions})"
    )
    return "stalemate"
