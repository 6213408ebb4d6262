"""Independent slow-but-obvious chess legality checker (host-side numpy).

A deliberately naive second implementation of the rules for testing the
engine's pin/check-classification legality (envs/chess/engine.py
_legal_mask): for every action, simulate the move on a copied board and
scan all enemy pieces for attacks on the king — the textbook O(A * 64)
algorithm, sharing only the static action table with the engine.

Canonical conventions match the engine: side to move owns positive pieces,
rank 0 is the mover's back rank, ep target = (5, ep_file).
"""

from __future__ import annotations

import numpy as np

from custom_alphazero_tpu.envs.chess import tables as T

A = T.NUM_ACTIONS


def _sq(r, f):
    return r * 8 + f


def _attacked(flat, sq):
    """Is `sq` attacked by any negative (enemy) piece? Plain scans."""
    r, f = divmod(sq, 8)
    for dr, df in T.KNIGHT_OFFSETS:
        rr, ff = r + dr, f + df
        if 0 <= rr < 8 and 0 <= ff < 8 and flat[_sq(rr, ff)] == -T.KNIGHT:
            return True
    for d, (dr, df) in enumerate(T.DIRECTIONS):
        rr, ff = r + dr, f + df
        dist = 1
        while 0 <= rr < 8 and 0 <= ff < 8:
            v = flat[_sq(rr, ff)]
            if v != 0:
                if dist == 1 and v == -T.KING:
                    return True
                sliders = (
                    (-T.BISHOP, -T.QUEEN)
                    if d in T.DIAGONAL_DIRS
                    else (-T.ROOK, -T.QUEEN)
                )
                if v in sliders:
                    return True
                break
            rr, ff, dist = rr + dr, ff + df, dist + 1
    # Enemy pawns capture downward (toward rank 0): they sit at (r+1, f+-1).
    for df in (-1, 1):
        rr, ff = r + 1, f + df
        if 0 <= rr < 8 and 0 <= ff < 8 and flat[_sq(rr, ff)] == -T.PAWN:
            return True
    return False


def _simulate(flat, frm, to, promo, ep_file):
    """Apply a (pseudo-legal) move on a copy; returns the new flat board."""
    out = flat.copy()
    piece = out[frm]
    is_pawn = piece == T.PAWN
    ep_capture = is_pawn and (frm % 8 != to % 8) and out[to] == 0
    out[frm] = 0
    out[to] = promo if promo > 0 else piece
    if ep_capture:
        out[to - 8] = 0
    if piece == T.KING and frm == T.E1 and to == T.G1:
        out[T.H1] = 0
        out[T.F1] = T.ROOK
    if piece == T.KING and frm == T.E1 and to == T.C1:
        out[T.A1] = 0
        out[T.D1] = T.ROOK
    return out


def legal_mask(board, castling, ep_file):
    """(A,) bool legal mask + in_check bool, by full per-move simulation."""
    flat = np.asarray(board, np.int32).reshape(64)
    ep_target = 5 * 8 + ep_file if ep_file >= 0 else -100
    king_sq = int(np.argmax(flat == T.KING))
    in_check = _attacked(flat, king_sq)
    legal = np.zeros(A, bool)
    for a in range(A):
        frm, to = int(T.FROM[a]), int(T.TO[a])
        promo = int(T.PROMO[a])
        piece = flat[frm]
        if piece <= 0 or flat[to] > 0:
            continue
        ok = False
        if T.IS_KNIGHT[a]:
            ok = piece == T.KNIGHT
        else:
            d, dist = int(T.DIR[a]), int(T.DIST[a])
            path_clear = all(
                flat[s] == 0 for s in T.BETWEEN[a] if s >= 0
            )
            diag = d in T.DIAGONAL_DIRS
            if promo == 0:
                if piece == T.QUEEN:
                    ok = path_clear
                elif piece == T.ROOK:
                    ok = (not diag) and path_clear
                elif piece == T.BISHOP:
                    ok = diag and path_clear
                elif piece == T.KING:
                    ok = dist == 1
                elif piece == T.PAWN:
                    if d == 0 and dist == 1:
                        ok = flat[to] == 0 and to // 8 < 7
                    elif d == 0 and dist == 2:
                        ok = frm // 8 == 1 and path_clear and flat[to] == 0
                    elif diag and dist == 1 and d not in (3, 5):
                        ok = (flat[to] < 0 or to == ep_target) and to // 8 < 7
            else:
                if piece == T.PAWN and frm // 8 == 6:
                    if d == 0:
                        ok = flat[to] == 0
                    elif d in (1, 7):
                        ok = flat[to] < 0
        if not ok:
            continue
        sim = _simulate(flat, frm, to, promo, ep_file)
        ksq = to if piece == T.KING else king_sq
        if not _attacked(sim, ksq):
            legal[a] = True
    # Castling (action ids shared with e1g1/e1c1 slider moves — OR in).
    if castling[0] and flat[T.E1] == T.KING and flat[T.H1] == T.ROOK:
        if (
            flat[T.F1] == 0 and flat[T.G1] == 0 and not in_check
            and not _attacked(flat, T.F1) and not _attacked(flat, T.G1)
        ):
            legal[T.CASTLE_K] = True
    if castling[1] and flat[T.E1] == T.KING and flat[T.A1] == T.ROOK:
        if (
            flat[T.B1] == 0 and flat[T.C1] == 0 and flat[T.D1] == 0
            and not in_check
            and not _attacked(flat, T.D1) and not _attacked(flat, T.C1)
        ):
            legal[T.CASTLE_Q] = True
    return legal, in_check
