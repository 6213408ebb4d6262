"""Perft: exhaustive move-path counting for chess move-gen validation.

The reference free-rides on python-chess for rules (chess/board.py:12) and so
never needed this; our from-scratch JAX rules engine is validated against the
standard published perft node counts (start position, "kiwipete", etc. —
tests/test_chess.py).

Batched breadth-first expansion: every frontier position's legal mask is
already cached in its state; children are materialized with a vmapped step
in fixed-size chunks (one compilation).

CLI:  python -m custom_alphazero_tpu.tools.perft "<fen>" <depth>
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.envs.chess.engine import Chess

# Keep the chunk modest: a chunked step evaluates the child's legal mask,
# whose king-safety pass scans ~90 gathered cells per action per position.
CHUNK = 512


def _stack(states):
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)


def _index(states, i):
    return jax.tree.map(lambda leaf: leaf[i], states)


_STEP_CACHE = {}


def _chunk_step(env: Chess):
    """Cache the vmapped step per env so repeated perft calls share one
    compilation (the chess step's legality pass is expensive to compile)."""
    key = id(env)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = jax.jit(jax.vmap(env.step))
    return _STEP_CACHE[key]


def perft(env: Chess, root, depth: int, verbose: bool = False) -> int:
    """Count move paths of length `depth` from `root` (a single state)."""
    if depth == 0:
        return 1
    step_chunk = _chunk_step(env)

    frontier = jax.tree.map(lambda leaf: leaf[None], root)
    for level in range(depth):
        legal = np.asarray(frontier.legal & ~frontier.terminal[..., None])
        parents, actions = np.nonzero(legal)
        total = len(parents)
        if level == depth - 1 or total == 0:
            return total
        # Materialize all children in fixed-size chunks.
        children = []
        for lo in range(0, total, CHUNK):
            idx = parents[lo:lo + CHUNK]
            act = actions[lo:lo + CHUNK]
            pad = CHUNK - len(idx)
            idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
            act = np.concatenate([act, np.zeros(pad, act.dtype)])
            batch = jax.tree.map(lambda leaf: leaf[jnp.asarray(idx)], frontier)
            stepped, _ = step_chunk(batch, jnp.asarray(act))
            children.append(
                jax.tree.map(lambda leaf: np.asarray(leaf[:CHUNK - pad]), stepped)
            )
        frontier = jax.tree.map(
            lambda *leaves: jnp.asarray(np.concatenate(leaves)), *children
        )
        if verbose:
            print(f"depth {level + 1}: {total} nodes", file=sys.stderr)
    return total


def perft_divide(env: Chess, root, depth: int) -> dict:
    """Per-root-move perft counts (for debugging vs known engines)."""
    from custom_alphazero_tpu.envs.chess import tables as T

    legal = np.asarray(root.legal & ~root.terminal)
    step = jax.jit(env.step)
    out = {}
    for action in np.nonzero(legal)[0]:
        child, _ = step(root, jnp.int32(action))
        out[T.ACTION_UCI[action]] = perft(env, child, depth - 1)
    return out


def main():
    fen = sys.argv[1]
    depth = int(sys.argv[2])
    env = Chess()
    root = env.from_fen(fen) if fen != "start" else env.init()
    print(perft(env, root, depth, verbose=True))


if __name__ == "__main__":
    main()
