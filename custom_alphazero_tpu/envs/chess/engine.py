"""Pure-JAX vectorized chess engine.

Replaces the reference's python-chess-backed board
(/root/reference/custom_alphazero/chess/board.py — which free-rides on the
python_chess C/Python rules engine) with a from-scratch, jit-pure,
table-driven rules implementation over the canonical side-to-move
perspective, validated by perft counts on standard positions
(tests/test_chess.py).

Design: for each of the 1968 fixed actions, legality = geometric pattern
(precomputed tables) AND clear path AND destination rule AND king safety,
where king safety simulates the move on a scratch board and runs an
attacked-square query against the resulting position — all vectorized over
the action axis with gathers, no control flow. The legal mask and in-check
bit are computed once per position in ``step``/``init`` and cached in the
state (they are needed anyway for terminal detection).

Terminal rules: checkmate (+1 for the mover), stalemate, 75-move rule
(halfmove clock >= 150 plies), insufficient material (kings, king+minor,
same-coloured single bishops), and repetition — detected with a dual 32-bit
Zobrist hash over a 100-ply ring, 3 occurrences = draw. The reference
inherits python-chess's is_game_over (fivefold + seventyfive-move
variants); the threefold window here is a documented, stricter
approximation. Observation: 8-ply history x (13 piece one-hot + repetition)
planes + castling/fullmove/halfmove planes = 118 channels, the reference's
full_state layout (chess/board.py:58-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from custom_alphazero_tpu.config import ChessConfig
from custom_alphazero_tpu.envs import core
from custom_alphazero_tpu.envs.chess import tables as T

HISTORY = 8
HASH_RING = 100
OBS_CHANNELS = HISTORY * 14 + 6


@struct.dataclass
class ChessState:
    """Canonical single-game state (side to move owns the + pieces)."""

    board: jnp.ndarray       # (8, 8) int8
    castling: jnp.ndarray    # (4,) bool: own K, own Q, opp K, opp Q
    ep_file: jnp.ndarray     # () int32, -1 = none; target square = (5, file)
    halfmove: jnp.ndarray    # () int32, plies since pawn move/capture
    fullmove: jnp.ndarray    # () int32, total plies played
    terminal: jnp.ndarray    # () bool
    won: jnp.ndarray         # () bool — the last mover delivered mate
    legal: jnp.ndarray       # (A,) bool — cached legal mask for this position
    in_check: jnp.ndarray    # () bool — side to move is in check
    history: jnp.ndarray     # (HISTORY, 8, 8) int8 — canonical boards, newest first
    history_rep: jnp.ndarray  # (HISTORY,) bool — entry was a repeat when recorded
    hash_ring: jnp.ndarray   # (HASH_RING, 2) uint32 — recent position hashes
    ring_idx: jnp.ndarray    # () int32
    piece_hash: jnp.ndarray  # (2,) uint32 — piece placement, current view
    piece_hash_flip: jnp.ndarray  # (2,) uint32 — same, flipped encoding


# Table constants as device arrays (closed over by the jitted functions).
_FROM = jnp.asarray(T.FROM)
_TO = jnp.asarray(T.TO)
_PROMO = jnp.asarray(T.PROMO)
_DIR = jnp.asarray(T.DIR)
_DIST = jnp.asarray(T.DIST)
_IS_KNIGHT = jnp.asarray(T.IS_KNIGHT)
_BETWEEN = jnp.asarray(T.BETWEEN)
_RAY = jnp.asarray(T.RAY)
_KNIGHT_T = jnp.asarray(T.KNIGHT_TARGETS)
_KING_T = jnp.asarray(T.KING_TARGETS)
_OPP_PAWN_FROM = jnp.asarray(T.OPP_PAWN_FROM)
# Rank flip as a constant anti-identity contraction. ``x[::-1]`` lowers to
# an HLO ``reverse``, which this toolchain's TPU fusion emitter cannot
# transform windowed fusion inputs through — at chess search scale the
# compile dies in ReverseInput::TransformWindow (fusion_emitter.cc:4273
# CHECK, window 8 / stride 1) after minutes of pathological compile time
# (PARITY.md round 3). A constant 8x8 permutation dot is fusion-safe and
# MXU-trivial; values stay exact (small integers in f32).
_FLIP8 = jnp.asarray(np.eye(8, dtype=np.float32)[::-1])


def _flip_ranks(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse axis -2 (ranks) of a (..., 8, 8) board stack, dtype kept."""
    flipped = jnp.einsum("rk,...kf->...rf", _FLIP8, x.astype(jnp.float32))
    return flipped.astype(x.dtype)


_ZOBRIST = jnp.asarray(T.ZOBRIST)
_ZOBRIST_CASTLE = jnp.asarray(T.ZOBRIST_CASTLE)
_ZOBRIST_EP = jnp.asarray(T.ZOBRIST_EP)
# Flip-view Zobrist: ZM[z, c, sq] = Z[z, 12 - c, sq ^ 56] — the hash a cell
# contributes in the OPPONENT's canonical encoding (ranks flipped, colours
# negated). Lets the position hash update incrementally across the
# per-move canonical mirror (see _hash_delta).
_ZOBRIST_M = jnp.asarray(
    np.asarray(T.ZOBRIST)[:, ::-1, :][
        :, :, (np.arange(64) ^ 56)
    ]
)
# Flattened (2, 13*64) views for one-hot delta lookups.
_Z_FLAT = jnp.asarray(np.asarray(T.ZOBRIST).reshape(2, 13 * 64))
_ZM_FLAT = _ZOBRIST_M.reshape(2, 13 * 64)

A = T.NUM_ACTIONS

# ---------------------------------------------------------------------------
# TPU-friendly table reads. Dynamic gathers from the (64,) board lower to
# scalar-unit loops on TPU (measured: the gather-based legality pass cost
# ~3 ms *per game* on a v5e). Every read through a static index table is
# instead a matmul against a constant one-hot matrix (rows of the identity,
# all-zero row for -1 = off-board, reproducing the gather's "read 0"
# convention), and every dynamic-index read/write uses iota compares.
# ---------------------------------------------------------------------------


def _onehot_rows(table) -> np.ndarray:
    """int index table (...,) -> (..., 64) float32 one-hot rows; -1 -> 0."""
    tbl = np.asarray(table)
    out = np.zeros(tbl.shape + (64,), np.float32)
    eye = np.eye(64, dtype=np.float32)
    valid = tbl >= 0
    out[valid] = eye[tbl[valid]]
    return out


_M_FROM = jnp.asarray(_onehot_rows(T.FROM))            # (A, 64)
_M_TO = jnp.asarray(_onehot_rows(T.TO))                # (A, 64)
_M_BETWEEN = jnp.asarray(_onehot_rows(T.BETWEEN))      # (A, 6, 64)
_G_KNIGHT = jnp.asarray(_onehot_rows(T.KNIGHT_TARGETS))   # (64, 8, 64)
_G_KING = jnp.asarray(_onehot_rows(T.KING_TARGETS))       # (64, 8, 64)
_G_PAWN = jnp.asarray(_onehot_rows(T.OPP_PAWN_FROM))      # (64, 2, 64)
_G_RAY = jnp.asarray(_onehot_rows(T.RAY))                 # (64, 8, 7, 64)
_ACTION_TBLS = jnp.stack(
    [
        jnp.asarray(T.FROM, jnp.float32),
        jnp.asarray(T.TO, jnp.float32),
        jnp.asarray(T.PROMO, jnp.float32),
    ],
    axis=-1,
)  # (A, 3) — static per-action lookups read with one matvec
_KNIGHT_TF = jnp.asarray(T.KNIGHT_TARGETS, jnp.float32)
_KING_TF = jnp.asarray(T.KING_TARGETS, jnp.float32)
_OPP_PAWN_TF = jnp.asarray(T.OPP_PAWN_FROM, jnp.float32)
_RAY_TF = jnp.asarray(T.RAY, jnp.float32)
_IOTA64 = jnp.arange(64)
_DIAG_COL = jnp.asarray(
    [d in T.DIAGONAL_DIRS for d in range(8)]
)[:, None]


def _read(M: jnp.ndarray, ff: jnp.ndarray) -> jnp.ndarray:
    """Constant one-hot read: M (..., 64) @ ff (64,) -> (...)."""
    return jnp.tensordot(M, ff, axes=([-1], [0]))


class _AttackTables:
    """Board values at every square each attack query inspects, computed
    once per position with four constant matmuls (then sliced per query)."""

    def __init__(self, ff: jnp.ndarray):
        self.knight = _read(_G_KNIGHT, ff)   # (64, 8)
        self.king = _read(_G_KING, ff)       # (64, 8)
        self.pawn = _read(_G_PAWN, ff)       # (64, 2)
        self.ray = _read(_G_RAY, ff)         # (64, 8, 7)


def _count_before(occ):
    """Exclusive prefix-count along the ray axis: how many occupied squares
    lie strictly nearer on the same ray. Deliberately NOT ``jnp.cumsum``:
    on TPU a cumsum over this tiny axis lowers to an overlapping
    reduce-window, which the XLA fusion emitter rejects once it is fused
    into the large high-simulation chess search programs
    (``fusion_emitter.cc: window_bounds[i] == strides[i]`` CHECK at
    ``--sims>=512``, see PARITY.md). A strict-lower-triangular contraction
    produces the same counts and fuses cleanly."""
    n = occ.shape[-1]
    tri = (jnp.arange(n)[:, None] < jnp.arange(n)[None, :]).astype(jnp.int32)
    return jnp.einsum("...i,ij->...j", occ.astype(jnp.int32), tri)


def _attack_query(kn, kg, pw, ray_vals, ray_sqs):
    """Attacked? from per-query values: kn (..., 8), kg (..., 8),
    pw (..., 2), ray_vals (..., 8, 7) with ray_sqs (..., 8, 7) square ids
    (-1 off-board; off-board values are 0 by construction)."""
    knights = jnp.any(kn == -T.KNIGHT, axis=-1)
    kings = jnp.any(kg == -T.KING, axis=-1)
    pawns = jnp.any(pw == -T.PAWN, axis=-1)
    on_board = ray_sqs >= 0
    occupied = (ray_vals != 0) & on_board
    before = _count_before(occupied)
    first_hit = occupied & (before == 0)
    slider = jnp.where(
        _DIAG_COL,
        (ray_vals == -T.BISHOP) | (ray_vals == -T.QUEEN),
        (ray_vals == -T.ROOK) | (ray_vals == -T.QUEEN),
    )
    return knights | kings | pawns | jnp.any(first_hit & slider, axis=(-2, -1))


def _apply_action(flat: jnp.ndarray, castling, ep_file, action: jnp.ndarray):
    """Apply action to a flat (64,) board; returns (new_flat, info dict).
    No legality checking — callers guarantee legality (or mask upstream).
    Dynamic-index reads/writes as iota-compare selects (no gather/scatter)."""
    act_oh = jnp.arange(A) == action
    # One (A,) x (A, 3) matvec for all three table picks (vmap lifts it to
    # a batch matmul on the MXU) instead of three masked reductions.
    picks = jnp.tensordot(
        act_oh.astype(jnp.float32), _ACTION_TBLS, axes=([0], [0])
    ).astype(jnp.int32)
    frm, to, promo = picks[0], picks[1], picks[2]
    fi = flat.astype(jnp.int32)
    frm_oh = _IOTA64 == frm
    to_oh = _IOTA64 == to
    piece = jnp.sum(jnp.where(frm_oh, fi, 0))
    is_pawn = piece == T.PAWN
    to_val = jnp.sum(jnp.where(to_oh, fi, 0))
    frm_file, to_file = frm % 8, to % 8

    ep_capture = is_pawn & (frm_file != to_file) & (to_val == 0)
    moved = jnp.where(promo > 0, promo, piece)
    new = jnp.where(frm_oh, 0, fi)
    new = jnp.where(to_oh, moved, new)
    # En-passant: remove the opponent pawn one rank below the target.
    new = jnp.where(ep_capture & (_IOTA64 == to - 8), 0, new)
    # Castling: the king travels two files from e1.
    is_castle_k = (piece == T.KING) & (frm == T.E1) & (to == T.G1)
    is_castle_q = (piece == T.KING) & (frm == T.E1) & (to == T.C1)
    new = jnp.where(is_castle_k & (_IOTA64 == T.H1), 0, new)
    new = jnp.where(is_castle_k & (_IOTA64 == T.F1), T.ROOK, new)
    new = jnp.where(is_castle_q & (_IOTA64 == T.A1), 0, new)
    new = jnp.where(is_castle_q & (_IOTA64 == T.D1), T.ROOK, new)
    info = dict(
        piece=piece, is_pawn=is_pawn, captured=(to_val != 0) | ep_capture,
        frm=frm, to=to, to_val=to_val, moved=moved,
        ep_capture=ep_capture, is_castle_k=is_castle_k,
        is_castle_q=is_castle_q,
        double_push=is_pawn & (to - frm == 16),
        new_ep_file=jnp.where(is_pawn & (to - frm == 16), frm_file, -1),
    )
    return new.astype(flat.dtype), info


def _legal_mask(flat: jnp.ndarray, castling, ep_file):
    """(legal (A,), in_check ()) for the canonical position."""
    ff = flat.astype(jnp.float32)
    piece = _read(_M_FROM, ff)          # (A,) f32 piece codes
    to_val = _read(_M_TO, ff)
    own_from = piece > 0
    dest_free = to_val <= 0             # never capture own

    path_vals = _read(_M_BETWEEN, ff)    # (A, 6)
    path_clear = jnp.all((path_vals == 0) | (_BETWEEN < 0), axis=1)

    frm_rank = _FROM // 8
    to_rank = _TO // 8
    ep_target = jnp.where(ep_file >= 0, 5 * 8 + ep_file, -100)

    diag_dir = jnp.isin(_DIR, jnp.asarray(T.DIAGONAL_DIRS))
    orth_dir = jnp.isin(_DIR, jnp.asarray(T.ORTHOGONAL_DIRS))

    knight_ok = _IS_KNIGHT & (piece == T.KNIGHT)
    queen_ok = ~_IS_KNIGHT & (_PROMO == 0) & (piece == T.QUEEN) & path_clear
    rook_ok = ~_IS_KNIGHT & (_PROMO == 0) & (piece == T.ROOK) & orth_dir & path_clear
    bishop_ok = ~_IS_KNIGHT & (_PROMO == 0) & (piece == T.BISHOP) & diag_dir & path_clear
    king_ok = ~_IS_KNIGHT & (_PROMO == 0) & (piece == T.KING) & (_DIST == 1)

    pawn_push = (
        (piece == T.PAWN) & (_PROMO == 0) & (_DIR == 0) & (_DIST == 1)
        & (to_val == 0) & (to_rank < 7)
    )
    pawn_double = (
        (piece == T.PAWN) & (_PROMO == 0) & (_DIR == 0) & (_DIST == 2)
        & (frm_rank == 1) & path_clear & (to_val == 0)
    )
    pawn_capture = (
        (piece == T.PAWN) & (_PROMO == 0) & diag_dir & (_DIR != 3) & (_DIR != 5)
        & (_DIST == 1) & (to_rank < 7)
        & ((to_val < 0) | (_TO == ep_target))
    )
    promo_push = (_PROMO > 0) & (piece == T.PAWN) & (frm_rank == 6) & (_DIR == 0) & (to_val == 0)
    promo_capture = (
        (_PROMO > 0) & (piece == T.PAWN) & (frm_rank == 6)
        & ((_DIR == 1) | (_DIR == 7)) & (to_val < 0)
    )

    pseudo = own_from & dest_free & (
        knight_ok | queen_ok | rook_ok | bishop_ok | king_ok
        | pawn_push | pawn_double | pawn_capture | promo_push | promo_capture
    )

    # ---- position analysis: checkers, pins, attack map --------------------
    # One O(64)-sized analysis instead of a post-move attack query per
    # action (the per-action patched-ray pass materialized ~450 KB/position
    # of (A, 8, 7) tensors — ~12 GB of HBM traffic per step at batch 1024):
    # classic movegen decomposition into checker set + check-resolution
    # squares + absolute pins + an enemy attack map for king moves.
    king_sq = jnp.argmax(flat == T.KING)
    at = _AttackTables(ff)
    koh = (_IOTA64 == king_sq).astype(jnp.float32)
    pick = lambda W: jnp.tensordot(koh, W, axes=([0], [0]))
    kn_v = pick(at.knight)       # (8,) values at knight-attack origins
    pw_v = pick(at.pawn)         # (2,) values at opposing-pawn origins
    ray_v = pick(at.ray)         # (8, 7) values along the king's rays
    ray_s = pick(_RAY_TF)        # (8, 7) square ids (-1 off-board)
    g_ray = pick(_G_RAY)         # (8, 7, 64) one-hot rows of ray squares
    g_kn = pick(_G_KNIGHT)       # (8, 64)
    g_pw = pick(_G_PAWN)         # (2, 64)

    on = ray_s >= 0
    occ = (ray_v != 0) & on
    # occupied squares strictly nearer the king on the same ray
    before = _count_before(occ)
    first = occ & (before == 0)
    slider_kind = jnp.where(
        _DIAG_COL,
        (ray_v == -T.BISHOP) | (ray_v == -T.QUEEN),
        (ray_v == -T.ROOK) | (ray_v == -T.QUEEN),
    )
    slider_chk = first & slider_kind                    # (8, 7)
    ray_has_chk = jnp.any(slider_chk, axis=-1)          # (8,)
    kn_chk = kn_v == -T.KNIGHT                          # (8,)
    pw_chk = pw_v == -T.PAWN                            # (2,)
    nch = (
        jnp.sum(kn_chk) + jnp.sum(pw_chk) + jnp.sum(ray_has_chk)
    ).astype(jnp.int32)
    in_check = nch >= 1

    # Check-resolution squares (single check): capture the checker or block
    # the checking ray — the ray squares up to and including its first hit,
    # or the knight/pawn checker's square.
    seg = ((before == 0) & on & ray_has_chk[:, None]).astype(jnp.float32)
    resolve = (
        jnp.einsum("dk,dkx->x", seg, g_ray)
        + jnp.einsum("d,dx->x", kn_chk.astype(jnp.float32), g_kn)
        + jnp.einsum("d,dx->x", pw_chk.astype(jnp.float32), g_pw)
    ) > 0                                               # (64,)

    # Absolute pins: on each king ray, a first-own piece with an enemy
    # slider of matching kind immediately behind it is pinned to the ray's
    # line (axis d % 4).
    first_own = first & (ray_v > 0)                     # (8, 7)
    pinner = occ & (before == 1) & slider_kind          # (8, 7)
    d_pinned = (
        jnp.any(first_own, axis=-1) & jnp.any(pinner, axis=-1)
    ).astype(jnp.float32)                               # (8,)
    pin_src = first_own.astype(jnp.float32) * d_pinned[:, None]
    pinned = jnp.einsum("dk,dkx->x", pin_src, g_ray) > 0        # (64,)
    axis_of_d = (jnp.arange(8) % 4).astype(jnp.float32)
    pin_axis = jnp.einsum(
        "dk,dkx->x", pin_src * axis_of_d[:, None], g_ray
    )                                                   # (64,) f32 axis id

    # Enemy attack map with our king removed (a king stepping away along a
    # checking ray must still count as attacked), for all 64 squares at once.
    ray_no_king = jnp.where(_RAY_TF == king_sq, 0.0, at.ray)
    attacked64 = _attack_query(
        at.knight, at.king, at.pawn, ray_no_king, _RAY_TF
    ).astype(jnp.float32)                               # (64,)

    # ---- per-action assembly (all (A,) vectors) ---------------------------
    pinned_from = _read(_M_FROM, pinned.astype(jnp.float32)) > 0
    axis_from = _read(_M_FROM, pin_axis)
    resolve_to = _read(_M_TO, resolve.astype(jnp.float32)) > 0
    attacked_to = _read(_M_TO, attacked64) > 0

    is_king_act = piece == T.KING
    ok_pin = ~pinned_from | (
        ~_IS_KNIGHT & (_DIR >= 0) & ((_DIR % 4) == axis_from)
    )
    ok_check = (nch == 0) | resolve_to
    nonking_legal = pseudo & ~is_king_act & (nch <= 1) & ok_check & ok_pin
    king_legal = pseudo & is_king_act & ~attacked_to

    # En-passant captures get a direct post-move verdict (≤ 2 candidate
    # from-squares): the generic pin/resolve rules miss the double-vacancy
    # rank exposure and rays opened through the *captured* pawn's square.
    is_ep = (
        (piece == T.PAWN) & (_PROMO == 0) & diag_dir & (_DIST == 1)
        & (_TO == ep_target)  # ep_target from the pseudo-move pass above
    )
    cap_sq = 4 * 8 + jnp.maximum(ep_file, 0)

    def ep_safe_from(frm_sq):
        """King not attacked after (frm vacated, captured pawn removed,
        target pawn placed) — patched slider rays + pawn-checker filter."""
        rv = ray_v
        rv = jnp.where((ray_s == frm_sq) | (ray_s == cap_sq), 0.0, rv)
        rv = jnp.where(ray_s == ep_target, float(T.PAWN), rv)
        occ2 = (rv != 0) & on
        bef2 = _count_before(occ2)
        sl2 = jnp.where(
            _DIAG_COL,
            (rv == -T.BISHOP) | (rv == -T.QUEEN),
            (rv == -T.ROOK) | (rv == -T.QUEEN),
        )
        slide_hit = jnp.any(occ2 & (bef2 == 0) & sl2)
        pw_hit = jnp.any(pw_chk & (pick(_OPP_PAWN_TF) != cap_sq))
        kn_hit = jnp.any(kn_chk)
        return ~(slide_hit | pw_hit | kn_hit)

    ep_safe_l = ep_safe_from(cap_sq - 1)
    ep_safe_r = ep_safe_from(cap_sq + 1)
    ep_legal = pseudo & jnp.where(
        _FROM == cap_sq - 1, ep_safe_l,
        jnp.where(_FROM == cap_sq + 1, ep_safe_r, False),
    )

    legal = jnp.where(
        is_ep, ep_legal, jnp.where(is_king_act, king_legal, nonking_legal)
    )

    # Castling: rights + empty path + king not crossing attacked squares.
    # OR-ed into e1g1/e1c1 (those action ids are ALSO ordinary slider moves
    # when a queen/rook sits on e1 — never overwrite them).
    def castle_ok(right, empties, cross):
        empty_ok = jnp.asarray(True)
        for sq in empties:
            empty_ok &= flat[sq] == 0
        safe = ~in_check
        for sq in cross:
            safe &= attacked64[sq] == 0
        return right & empty_ok & safe & (flat[T.E1] == T.KING)

    castle_k = castle_ok(castling[0], [T.F1, T.G1], [T.F1, T.G1])
    castle_q = castle_ok(castling[1], [T.B1, T.C1, T.D1], [T.D1, T.C1])
    legal = legal.at[T.CASTLE_K].set(legal[T.CASTLE_K] | castle_k)
    legal = legal.at[T.CASTLE_Q].set(legal[T.CASTLE_Q] | castle_q)
    return legal, in_check


def _xor_reduce(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jax.lax.reduce(
        x, jnp.uint32(0), lambda a, b: jax.lax.bitwise_xor(a, b), (axis,)
    )


def _piece_hash_full(flat, table):
    """(2,) uint32 piece-placement hash of a flat board under `table`
    (_ZOBRIST for the current view, _ZOBRIST_M for the flipped view)."""
    codes = (flat.astype(jnp.int32) + 6).clip(0, 12)  # 0..12
    code_oh = codes[None, :] == jnp.arange(13)[:, None]  # (13, 64)
    piece_h = jnp.sum(
        jnp.where(code_oh[None], table, jnp.uint32(0)), axis=1
    )  # (2, 64)
    occupied = flat != 0
    return _xor_reduce(jnp.where(occupied[None, :], piece_h, 0), axis=1)


def _hashable_ep(flat, ep_file):
    """ep contributes to the repetition hash only when a pseudo-legal ep
    capture exists (an own pawn beside the pushed pawn): positions that
    differ only in a phantom ep square must hash equal, like python-chess's
    transposition key (which uses has_legal_en_passant; pseudo-legal is the
    cheap approximation — a pinned-only ep capture still hashes distinct)."""
    base = 4 * 8 + jnp.maximum(ep_file, 0)
    fi = flat.astype(jnp.int32)
    left = (ep_file >= 1) & (
        jnp.sum(jnp.where(_IOTA64 == base - 1, fi, 0)) == T.PAWN
    )
    right = (ep_file >= 0) & (ep_file <= 6) & (
        jnp.sum(jnp.where(_IOTA64 == base + 1, fi, 0)) == T.PAWN
    )
    return jnp.where((ep_file >= 0) & (left | right), ep_file, -1)


def _castle_ep_hash(flat, castling, ep_file):
    castle_h = _xor_reduce(
        jnp.where(castling[None, :], _ZOBRIST_CASTLE, 0), axis=1
    )
    eff_ep = _hashable_ep(flat, ep_file)
    ep_h = _ZOBRIST_EP[:, jnp.where(eff_ep >= 0, eff_ep, 8)]
    return castle_h ^ ep_h


def _position_hash(flat, castling, ep_file):
    """(2,) uint32 dual hash of (pieces, castling, effective ep) — full
    recompute (init/tests; steps use the incremental _hash_delta path)."""
    return _piece_hash_full(flat, _ZOBRIST) ^ _castle_ep_hash(
        flat, castling, ep_file
    )


def _hash_delta(info):
    """Piece-hash XOR deltas of a move, in both encodings.

    Returns (delta_cur, delta_flip), each (2,) uint32: the XOR that takes
    the pre-move board's piece hash to the post-move board's, in the
    current canonical view and in the flipped (next player's) view. A move
    changes at most 4 cells: from, to, the en-passant victim, and the
    castling rook's two squares (from/to cover the king).
    """
    empty = jnp.int32(0)
    rook = jnp.int32(T.ROOK)
    no_sq = jnp.int32(-1)
    extra1_sq = jnp.where(
        info["ep_capture"], info["to"] - 8,
        jnp.where(info["is_castle_k"], T.H1,
                  jnp.where(info["is_castle_q"], T.A1, no_sq)),
    )
    extra1_old = jnp.where(info["ep_capture"], -T.PAWN, rook)
    extra2_sq = jnp.where(
        info["is_castle_k"], T.F1,
        jnp.where(info["is_castle_q"], T.D1, no_sq),
    )
    cells_sq = jnp.stack([info["frm"], info["to"], extra1_sq, extra2_sq])
    cells_old = jnp.stack(
        [info["piece"].astype(jnp.int32), info["to_val"].astype(jnp.int32),
         extra1_old, empty]
    )
    cells_new = jnp.stack(
        [empty, info["moved"].astype(jnp.int32), empty, rook]
    )

    def contrib(codes, sqs):
        # XOR of table[:, code, sq] for occupied cells at valid squares:
        # one-hot rows over the flattened (13*64) table; cells are distinct
        # so a sum-then-xor is unnecessary — each row is a single term, and
        # the four cells fold with XOR.
        idx = (codes + 6) * 64 + jnp.maximum(sqs, 0)
        valid = (sqs >= 0) & (codes != 0)
        oh = (
            (jnp.arange(13 * 64)[None, :] == idx[:, None]) & valid[:, None]
        )  # (4, 832)
        vals_cur = jnp.sum(
            jnp.where(oh[None], _Z_FLAT[:, None, :], jnp.uint32(0)), axis=2
        )  # (2, 4) — single term per row, exact
        vals_flip = jnp.sum(
            jnp.where(oh[None], _ZM_FLAT[:, None, :], jnp.uint32(0)), axis=2
        )
        return _xor_reduce(vals_cur, 1), _xor_reduce(vals_flip, 1)

    old_cur, old_flip = contrib(cells_old, cells_sq)
    new_cur, new_flip = contrib(cells_new, cells_sq)
    return old_cur ^ new_cur, old_flip ^ new_flip


def _insufficient_material(flat):
    counts = jnp.stack([jnp.sum(flat == c) + jnp.sum(flat == -c)
                        for c in (T.PAWN, T.KNIGHT, T.BISHOP, T.ROOK, T.QUEEN)])
    pawns, knights, bishops, rooks, queens = counts
    heavy = pawns + rooks + queens
    minors = knights + bishops
    bare = (heavy == 0) & (minors <= 1)
    # Single bishop each on same colour squares.
    sq_colour = (jnp.arange(64) // 8 + jnp.arange(64) % 8) % 2
    own_b = flat == T.BISHOP
    opp_b = flat == -T.BISHOP
    same_colour = (
        (heavy == 0) & (knights == 0)
        & (jnp.sum(own_b) == 1) & (jnp.sum(opp_b) == 1)
        & (jnp.sum(jnp.where(own_b, sq_colour, 0))
           == jnp.sum(jnp.where(opp_b, sq_colour, 0)))
    )
    return bare | same_colour


@jax.jit
def _analyze_jit(flat, castling, ep_file):
    legal, in_check = _legal_mask(flat, castling, ep_file)
    return (
        legal,
        in_check,
        _position_hash(flat, castling, ep_file),
        _insufficient_material(flat),
    )


class Chess(core.Env):
    """Chess environment over the fixed 1968-action table."""

    def __init__(self, cfg: ChessConfig = ChessConfig()):
        self.cfg = cfg
        self.num_actions = A
        self.obs_shape = (8, 8, OBS_CHANNELS)
        # Replay bit-packing (replay/codec.py): every observe() channel is
        # binary except the two constant clock planes at the end.
        self.obs_scalar_channels = (OBS_CHANNELS - 2, OBS_CHANNELS - 1)

    # -- construction ------------------------------------------------------

    def init(self) -> ChessState:
        return self.state_from_arrays(
            T.START_BOARD, np.ones(4, bool), -1, 0, 0
        )

    def state_from_arrays(self, board, castling, ep_file, halfmove, plies) -> ChessState:
        """Build a state from host arrays (canonical orientation) — used by
        init, FEN loading and tests. The analysis runs under jit: the
        1968-action legality pass is far too many ops to dispatch eagerly."""
        board = jnp.asarray(board, jnp.int8)
        castling = jnp.asarray(castling, bool)
        flat = board.reshape(64)
        # Sanitize castling rights against actual piece placement: FEN
        # defaults missing fields to KQkq (tables.board_from_fen), and a
        # right without its king/rook is unplayable garbage that would let
        # _apply_action materialize a rook out of thin air (python-chess
        # cleans rights the same way).
        castling = castling & jnp.stack(
            [
                (flat[T.E1] == T.KING) & (flat[T.H1] == T.ROOK),
                (flat[T.E1] == T.KING) & (flat[T.A1] == T.ROOK),
                (flat[T.E8] == -T.KING) & (flat[T.H8] == -T.ROOK),
                (flat[T.E8] == -T.KING) & (flat[T.A8] == -T.ROOK),
            ]
        )
        legal, in_check, h, insufficient = _analyze_jit(
            flat, castling, jnp.int32(ep_file)
        )
        history = jnp.zeros((HISTORY, 8, 8), jnp.int8).at[0].set(board)
        ring = jnp.zeros((HASH_RING, 2), jnp.uint32).at[0].set(h)
        no_moves = ~legal.any()
        # A loaded position may already be decided (mate/stalemate,
        # insufficient material, or an expired 75-move clock).
        mate = no_moves & in_check
        terminal = no_moves | insufficient | (jnp.int32(halfmove) >= 150)
        return ChessState(
            board=board,
            castling=castling,
            ep_file=jnp.int32(ep_file),
            halfmove=jnp.int32(halfmove),
            fullmove=jnp.int32(plies),
            terminal=terminal,
            # `won` is from the *last mover*'s perspective: if the side to
            # move is mated, the (virtual) last mover won.
            won=mate,
            legal=legal,
            in_check=in_check,
            history=history,
            history_rep=jnp.zeros((HISTORY,), bool),
            hash_ring=ring,
            ring_idx=jnp.int32(1),
            piece_hash=_piece_hash_full(flat, _ZOBRIST),
            piece_hash_flip=_piece_hash_full(flat, _ZOBRIST_M),
        )

    def from_fen(self, fen: str) -> ChessState:
        board, castling, ep_file, halfmove, plies, _ = T.board_from_fen(fen)
        return self.state_from_arrays(board, castling, ep_file, halfmove, plies)

    # -- dynamics ----------------------------------------------------------

    def _advance(self, state: ChessState, action: jnp.ndarray):
        """Shared move application for step / step_lite: board, castling
        rights, canonical mirror, clocks, incremental hash, repetition ring
        and history — everything except the legality analysis and terminal
        flags (left stale). Returns (advanced_state, ring_matches)."""
        flat = state.board.reshape(64)
        new_flat, info = _apply_action(
            flat, state.castling, state.ep_file, action.astype(jnp.int32)
        )

        # Castling rights: own side loses rights on king/rook moves; the
        # opponent loses a right when its rook's home square is captured.
        own_k = state.castling[0] & (info["piece"] != T.KING) & ~(
            (info["frm"] == T.H1) & (info["piece"] == T.ROOK))
        own_q = state.castling[1] & (info["piece"] != T.KING) & ~(
            (info["frm"] == T.A1) & (info["piece"] == T.ROOK))
        opp_k = state.castling[2] & ~(info["to"] == T.H8)
        opp_q = state.castling[3] & ~(info["to"] == T.A8)

        # Mirror to the next player's canonical perspective (fusion-safe
        # rank flip — see _flip_ranks).
        new_board = -_flip_ranks(new_flat.reshape(8, 8))
        castling = jnp.stack([opp_k, opp_q, own_k, own_q])
        ep_file = info["new_ep_file"].astype(jnp.int32)
        halfmove = jnp.where(
            info["is_pawn"] | info["captured"], 0, state.halfmove + 1
        ).astype(jnp.int32)

        # Incremental piece hash across the canonical mirror: the new view's
        # placement hash is the old flipped-view hash XOR the move's
        # flipped-view delta (full rehash only at init).
        delta_cur, delta_flip = _hash_delta(info)
        piece_hash = state.piece_hash_flip ^ delta_flip
        piece_hash_flip = state.piece_hash ^ delta_cur
        h = piece_hash ^ _castle_ep_hash(
            new_board.reshape(64), castling, ep_file
        )
        # Repetition: occurrences of this hash in the ring (both sub-hashes).
        slot = (jnp.arange(HASH_RING) == state.ring_idx % HASH_RING)[:, None]
        ring = jnp.where(slot, h[None, :], state.hash_ring)
        matches = jnp.sum(jnp.all(ring == h[None, :], axis=1))

        history = jnp.concatenate(
            [new_board[None], state.history[:-1]], axis=0
        )
        history_rep = jnp.concatenate(
            [(matches >= 2)[None], state.history_rep[:-1]], axis=0
        )
        advanced = state.replace(
            board=new_board,
            castling=castling,
            ep_file=ep_file,
            halfmove=halfmove,
            fullmove=state.fullmove + 1,
            history=history,
            history_rep=history_rep,
            hash_ring=ring,
            ring_idx=state.ring_idx + 1,
            piece_hash=piece_hash,
            piece_hash_flip=piece_hash_flip,
        )
        return advanced, matches

    def step(self, state: ChessState, action: jnp.ndarray):
        advanced, matches = self._advance(state, action)
        flat = advanced.board.reshape(64)
        new_legal, in_check = _legal_mask(
            flat, advanced.castling, advanced.ep_file
        )
        no_moves = ~new_legal.any()
        mate = no_moves & in_check
        stalemate = no_moves & ~in_check
        repetition = matches >= 3
        seventy_five = advanced.halfmove >= 150
        insufficient = _insufficient_material(flat)

        terminal = mate | stalemate | repetition | seventy_five | insufficient
        reward = jnp.where(mate, 1.0, 0.0).astype(jnp.float32)

        next_state = advanced.replace(
            terminal=terminal,
            won=mate,
            legal=new_legal & ~terminal,
            in_check=in_check,
        )
        # Absorbing terminal states (scalar `keep` broadcasts over any leaf).
        keep = state.terminal
        merged = jax.tree.map(
            lambda old, new: jnp.where(keep, old, new), state, next_state
        )
        reward = jnp.where(keep, 0.0, reward)
        return merged, reward

    def step_lite(self, state: ChessState, action: jnp.ndarray) -> ChessState:
        """Descent step: apply the move, maintain exactly what ``observe``
        and a subsequent full ``step`` consume (board, castling, ep, clocks,
        history, repetition planes, hash ring) and leave the analysis fields
        (legal / in_check / terminal / won) stale.

        Sound inside MCTS select because the tree stores each node's
        terminal flag (computed by the full ``step`` at node creation) and
        descent only continues through non-terminal expanded nodes; the
        carried state is only ever re-stepped fully at the leaf or observed
        (core.Env.step_lite contract). Skipping the 1968-action legality /
        king-safety pass here makes the per-level descent cost ~6x cheaper.
        """
        advanced, _ = self._advance(state, action)
        return advanced

    # -- queries -----------------------------------------------------------

    def legal_mask(self, state: ChessState) -> jnp.ndarray:
        return state.legal & ~state.terminal

    def is_terminal(self, state: ChessState) -> jnp.ndarray:
        return state.terminal

    def terminal_value(self, state: ChessState) -> jnp.ndarray:
        return jnp.where(state.won, -1.0, 0.0).astype(jnp.float32)

    def observe(self, state: ChessState) -> jnp.ndarray:
        """118-plane observation with the reference full_state's plane
        *budget* (chess/board.py:58-73): 8 history plies x (13 piece one-hot
        + repetition) + 4 castling + 2 clock planes. History entries
        alternate perspective as stored; odd entries are re-oriented to the
        current player's view.

        Deliberate encoding deviations from the reference (self-consistent;
        reference weights are not transferable anyway): history is stored
        newest-first (reference: oldest-first), piece one-hot channels are
        piece+6 so empty = channel 6 (reference: np.eye wrap, empty = 0,
        enemies = 12..7), the repetition plane marks a second ring-hash
        occurrence (reference: python-chess threefold is_repetition), the
        castling planes are ordered K,Q,K,Q (reference: Q,K,Q,K), and the
        move-count plane counts total plies (reference: fullmove number)."""
        # All 8 history plies re-oriented and one-hotted in one fused pass
        # (odd entries are stored from the opponent's perspective).
        odd = (jnp.arange(HISTORY) % 2 == 1)[:, None, None]
        aligned = jnp.where(odd, -_flip_ranks(state.history), state.history)
        onehot = jax.nn.one_hot(
            aligned.astype(jnp.int32) + 6, 13, dtype=jnp.float32
        )  # (H, 8, 8, 13): [-6..6] -> [0..12]
        rep = jnp.broadcast_to(
            state.history_rep.astype(jnp.float32)[:, None, None, None],
            (HISTORY, 8, 8, 1),
        )
        per_ply = jnp.concatenate([onehot, rep], axis=-1)
        hist_planes = jnp.transpose(per_ply, (1, 2, 0, 3)).reshape(
            8, 8, HISTORY * 14
        )
        extra = jnp.stack(
            [
                jnp.full((8, 8), state.castling[0], jnp.float32),
                jnp.full((8, 8), state.castling[1], jnp.float32),
                jnp.full((8, 8), state.castling[2], jnp.float32),
                jnp.full((8, 8), state.castling[3], jnp.float32),
                jnp.full((8, 8), state.fullmove.astype(jnp.float32)),
                jnp.full((8, 8), state.halfmove.astype(jnp.float32)),
            ],
            axis=-1,
        )
        return jnp.concatenate([hist_planes, extra], axis=-1)


core.register("chess", Chess)
