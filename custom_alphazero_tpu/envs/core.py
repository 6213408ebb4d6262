"""Environment interface.

Replaces the reference's compile-time game switch (``if ConfigGeneral.game ==
"chess": ...`` at import time in self_play.py:24-34, mcts/mcts.py:12-19, etc.)
with an explicit registry of ``Env`` objects whose methods are pure, jit-safe
functions over pytrees of arrays, designed to be ``vmap``-ed over a batch of
games stepped in lockstep.

Canonical-perspective contract (mirrors the reference's
``play(keep_same_player=True)`` semantics, connect_n/board.py:233-250):

- The state is always stored from the point of view of the side to move
  ("virtually, it is always white to play"): +1 planes are the mover's.
- ``step(state, action)`` applies the mover's action, then flips perspective,
  and returns the reward **for the player who just moved**: +1 win, 0
  otherwise (reference get_result(keep_same_player=True),
  connect_n/board.py:258-268).
- Terminal states are absorbing: stepping them is a no-op with reward 0
  (reference play() early-return, connect_n/board.py:239-240).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp

# An env state is a flax.struct dataclass (pytree of arrays).
EnvState = Any


class Env:
    """Pure-function environment protocol.

    Implementations provide single-state functions; callers ``vmap`` them over
    the game batch axis. All shapes are static.
    """

    #: Fixed action-space size (reference get_all_possible_moves).
    num_actions: int
    #: Observation shape fed to the policy-value net (H, W, C).
    obs_shape: Tuple[int, int, int]

    def init(self) -> EnvState:
        raise NotImplementedError

    def step(self, state: EnvState, action: jnp.ndarray) -> Tuple[EnvState, jnp.ndarray]:
        """Apply action; returns (next_state, reward-for-mover)."""
        raise NotImplementedError

    def step_lite(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        """Apply action maintaining only what a subsequent ``step`` or
        ``observe`` needs (board, side bookkeeping, history) — terminal
        detection and legality analysis may be skipped and left stale.

        Used in the MCTS select descent, where the tree already stores each
        node's terminal status and the carried state is only ever (a) fully
        re-stepped at the leaf or (b) observed; never consulted for
        terminal/legal bits. Default: the full step."""
        return self.step(state, action)[0]

    def legal_mask(self, state: EnvState) -> jnp.ndarray:
        """(num_actions,) bool mask over the fixed action space."""
        raise NotImplementedError

    def observe(self, state: EnvState) -> jnp.ndarray:
        """Canonical-perspective observation tensor, float32 (H, W, C)."""
        raise NotImplementedError

    def is_terminal(self, state: EnvState) -> jnp.ndarray:
        raise NotImplementedError

    def terminal_value(self, state: EnvState) -> jnp.ndarray:
        """Game value from the *side to move*'s perspective at a terminal
        state: -1 if the last mover won (mover's win = our loss), 0 draw."""
        raise NotImplementedError


_REGISTRY: Dict[str, Callable[..., Env]] = {}


def register(name: str, factory: Callable[..., Env]) -> None:
    _REGISTRY[name] = factory


def make(name: str, *args, **kwargs) -> Env:
    if name not in _REGISTRY:
        # Heavy engines (chess precomputes attack tables, ~seconds) register
        # lazily: import custom_alphazero_tpu.envs.<name> on first use.
        import importlib

        try:
            importlib.import_module(f"custom_alphazero_tpu.envs.{name}")
        except ImportError:
            pass
    if name not in _REGISTRY:
        raise KeyError(f"Unknown env {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](*args, **kwargs)
