"""Chess strength vs fixed baseline opponents (random, material-greedy).

Chess has no exact solver, so absolute strength evidence comes from win
rates against fixed opponents (VERDICT r2 #3) — the reference reports only
arena-relative scores (model/tensorflow/train.py:103-113). Both sides of
every game run fully on device in one lockstep batch (games as a batch
axis, SURVEY §7); color balance comes from playing half the games with the
tested model as first mover and half as second.

Opponents:
- ``random``: uniform over legal moves.
- ``greedy``: material-greedy 1-ply — maximizes captured-piece value
  (P1/N3/B3/R5/Q9) plus a queen-promotion bonus, random among ties.
  (En-passant captures score 0 material here — an acceptable baseline
  approximation, documented.)

Run: python -m custom_alphazero_tpu.tools.chess_strength --run_id=chess-r3 \
       [--which=best] [--games=128] [--sims=100] [--opponent=random,greedy]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.config import ChessConfig, MCTSConfig
from custom_alphazero_tpu.envs.chess import tables as T
from custom_alphazero_tpu.envs.chess.engine import Chess
from custom_alphazero_tpu.search.mcts import MCTS

# Material value of the piece standing on TO[a], looked up fusion-safely:
# one-hot (A, 64) constant matmul against |board|, then a value map.
_TO_OH = jnp.asarray(np.eye(64, dtype=np.float32)[T.TO])  # (A, 64)
_PIECE_VAL = jnp.asarray([0.0, 1.0, 3.0, 3.0, 5.0, 9.0, 0.0])
_PROMO_Q = jnp.asarray((T.PROMO == T.QUEEN).astype(np.float32))


def _greedy_scores(board_flat: jnp.ndarray) -> jnp.ndarray:
    """(B, A) material scores for the side to move (canonical view:
    enemy pieces are negative, so a capture target is max(-piece, 0))."""
    target = jnp.einsum("as,bs->ba", _TO_OH, board_flat.astype(jnp.float32))
    captured = jnp.clip(-target, 0.0, 6.0).astype(jnp.int32)
    val = _PIECE_VAL[captured]
    return val + 0.5 * _PROMO_Q[None, :]


def play_vs_opponent(
    env: Chess,
    evaluate_fn,
    opponent: str = "random",
    games: int = 128,
    sims: int = 100,
    seed: int = 0,
    max_plies: int = 200,
    topk_actions: int = 0,
) -> dict:
    """W/D/L of (net + MCTS, argmax visits) vs a baseline opponent.

    Plays ``games`` games in two lockstep half-batches (tested model first
    mover / second mover). Returns wins/draws/losses for the tested model
    plus mean game length."""
    half = max(games // 2, 1)
    mcts = MCTS(env, MCTSConfig(simulations=sims, topk_actions=topk_actions))

    @jax.jit
    def tested_move(state, key):
        visits = mcts.root_child_visits(
            mcts.search(state, evaluate_fn, key, sims)
        )
        return jnp.argmax(visits, axis=-1).astype(jnp.int32)

    @jax.jit
    def opp_move(state, key):
        legal = jax.vmap(env.legal_mask)(state)
        if opponent == "random":
            logits = jnp.where(legal, 0.0, -1e9)
        else:  # material-greedy 1-ply with random tie-break
            scores = _greedy_scores(state.board.reshape(state.board.shape[0], 64))
            noise = jax.random.uniform(key, scores.shape, maxval=0.1)
            logits = jnp.where(legal, scores * 100.0 + noise, -1e9)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    @jax.jit
    def apply(state, action, last_tested, tested_now):
        nxt, _ = jax.vmap(env.step)(state, action)
        frozen = state.terminal
        state = jax.tree.map(
            lambda c, n: jnp.where(
                frozen.reshape((-1,) + (1,) * (n.ndim - 1)), c, n
            ),
            state, nxt,
        )
        newly = state.terminal & ~frozen
        last_tested = jnp.where(newly, tested_now, last_tested)
        return state, last_tested

    results = []
    lengths = []
    rng = jax.random.PRNGKey(seed)
    for tested_first in (True, False):
        state = jax.vmap(lambda _: env.init())(jnp.arange(half))
        last_tested = jnp.zeros((half,), bool)
        length = np.zeros((half,), np.int32)
        for ply in range(max_plies):
            tested_now = (ply % 2 == 0) == tested_first
            rng, k = jax.random.split(rng)
            action = (
                tested_move(state, k) if tested_now else opp_move(state, k)
            )
            active = ~np.asarray(state.terminal)
            state, last_tested = apply(
                state, action, last_tested, jnp.full((half,), tested_now)
            )
            length += active.astype(np.int32)
            if bool(np.asarray(state.terminal).all()):
                break
        won = np.asarray(state.won)
        terminal = np.asarray(state.terminal)
        lt = np.asarray(last_tested)
        for g in range(half):
            if not terminal[g]:
                results.append(0)  # cut at max_plies: scored as a draw
            elif won[g]:
                results.append(1 if lt[g] else -1)
            else:
                results.append(0)
        lengths.extend(length.tolist())
    return {
        "opponent": opponent,
        "games": len(results),
        "wins": sum(r == 1 for r in results),
        "draws": sum(r == 0 for r in results),
        "losses": sum(r == -1 for r in results),
        "win_rate": float(np.mean([r == 1 for r in results])),
        "score": float(np.mean([(r + 1) / 2 for r in results])),
        "mean_game_plies": float(np.mean(lengths)),
        "sims": sims,
    }


def main(argv=None):
    from custom_alphazero_tpu.tools.cli import parse_kv_args
    from custom_alphazero_tpu.tools.strength import load_run_model

    args = parse_kv_args(argv or sys.argv[1:], __doc__)
    env, evaluate_fn, cfg, meta = load_run_model(
        args["--run_id"], args.get("--results_dir", "results"),
        args.get("--which", "best"), game="chess",
    )
    report = {"run_id": args["--run_id"], "steps": meta.get("steps")}
    for opp in args.get("--opponent", "random,greedy").split(","):
        r = play_vs_opponent(
            env, evaluate_fn, opponent=opp,
            games=int(args.get("--games", 128)),
            sims=int(args.get("--sims", 100)),
            seed=int(args.get("--seed", 0)),
        )
        report[opp] = r
        print(f"vs {opp}: {r}", flush=True)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
