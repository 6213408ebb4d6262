"""Pure-JAX vectorized Connect-N engine.

Re-designs the reference's mutable object board
(/root/reference/custom_alphazero/connect_n/board.py) as a pytree of fixed-
shape arrays with jit-pure ``init/step/legal_mask/observe`` functions, built
to be ``vmap``-ed over thousands of games stepped in lockstep on TPU.

Semantics reproduced exactly (validated by trajectory-replay tests against an
independent NumPy twin, tests/reference_numpy.py):

- Canonical perspective: after every ply the board is mirrored so the side to
  move is always +1 ("white"); board.py:244-246.
- Gravity: a piece dropped in column c lands on the lowest empty row
  (board.py:210-226, row 0 is the top).
- Win detection along 4 direction families (0,1),(1,1),(1,0),(1,-1)
  (config.py:47, board.py:178-208); draw when the board fills with no win.
- Result (keep_same_player=True): +1 for the player who just moved on a win,
  0 on a draw (board.py:258-268).
- Observation ``full_state``: one-hot planes [empty, mover(+1), opponent(-1)]
  + a turn plane of ones (canonically white to move), float32 (H, W, 4)
  (board.py:84-98, np.eye(3)[array] channel order).
- Action space: with gravity, one action per column x in range(width);
  without, one per cell ordered product(range(width), range(height)) i.e.
  action = x * height + y (board.py:130-146).
"""

from __future__ import annotations

from flax import struct
import jax
import jax.numpy as jnp

from custom_alphazero_tpu.config import ConnectNConfig
from custom_alphazero_tpu.envs import core


@struct.dataclass
class ConnectNState:
    """Single-game state (vmap over a leading batch axis for many games).

    board: (H, W) int8, +1 = side-to-move stones, -1 = opponent stones.
    heights: (W,) int32 stones per column (gravity bookkeeping).
    fullmove: int32 plies played so far (reference fullmove_number).
    terminal: bool game over.
    won: bool the last mover won (terminal and not a draw).
    """

    board: jnp.ndarray
    heights: jnp.ndarray
    fullmove: jnp.ndarray
    terminal: jnp.ndarray
    won: jnp.ndarray


def has_line(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """True if the bool plane (H, W) contains n-in-a-row in any of the 4
    direction families (reference update_game_over walk, board.py:178-208).

    Implemented as three small VALID convolutions (horizontal (1,n),
    vertical (n,1), both diagonals stacked as an (n,n,1,2) kernel): a
    handful of MXU-friendly ops instead of ~4n shifted-AND ops — the step
    function sits in the MCTS hot loop where op count is the cost. Sums of
    up to n fit exactly in bfloat16. vmap lifts the conv over game batches.
    """
    x = plane.astype(jnp.bfloat16)[None, :, :, None]  # NHWC, batch 1
    eye = jnp.eye(n, dtype=jnp.bfloat16)
    kernels = (
        jnp.ones((1, n, 1, 1), jnp.bfloat16),
        jnp.ones((n, 1, 1, 1), jnp.bfloat16),
        jnp.stack([eye, jnp.flip(eye, 0)], axis=-1)[:, :, None, :],  # (n,n,1,2)
    )
    threshold = jnp.bfloat16(n) - 0.5
    hit = jnp.bool_(False)
    for kernel in kernels:
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        hit = hit | jnp.any(y > threshold)
    return hit


class ConnectN(core.Env):
    """Connect-N environment over a static-geometry board."""

    def __init__(self, cfg: ConnectNConfig = ConnectNConfig()):
        self.cfg = cfg
        self.num_actions = cfg.num_actions
        self.obs_shape = (cfg.height, cfg.width, 4)

    def init(self) -> ConnectNState:
        cfg = self.cfg
        return ConnectNState(
            board=jnp.zeros((cfg.height, cfg.width), jnp.int8),
            heights=jnp.zeros((cfg.width,), jnp.int32),
            fullmove=jnp.int32(0),
            terminal=jnp.bool_(False),
            won=jnp.bool_(False),
        )

    def step(self, state: ConnectNState, action: jnp.ndarray):
        cfg = self.cfg
        action = action.astype(jnp.int32)
        if cfg.gravity:
            col = action
            row = cfg.height - 1 - state.heights[col]
        else:
            col = action // cfg.height
            row = action % cfg.height
        # Clamp for safety under masking — illegal actions must still trace.
        row = jnp.clip(row, 0, cfg.height - 1)

        placed = state.board.at[row, col].set(jnp.int8(1))
        win = has_line(placed == 1, cfg.n)
        filled = state.fullmove + 1 >= cfg.height * cfg.width
        terminal = win | filled
        reward = jnp.where(win, 1.0, 0.0).astype(jnp.float32)

        next_state = ConnectNState(
            board=-placed,  # mirror: next side to move becomes +1
            heights=state.heights.at[col].add(1) if cfg.gravity else state.heights,
            fullmove=state.fullmove + 1,
            terminal=terminal,
            won=win,
        )
        # Absorbing terminal states: stepping a finished game is a no-op.
        keep = state.terminal
        next_state = ConnectNState(
            board=jnp.where(keep, state.board, next_state.board),
            heights=jnp.where(keep, state.heights, next_state.heights),
            fullmove=jnp.where(keep, state.fullmove, next_state.fullmove),
            terminal=jnp.where(keep, state.terminal, next_state.terminal),
            won=jnp.where(keep, state.won, next_state.won),
        )
        reward = jnp.where(keep, 0.0, reward)
        return next_state, reward

    def step_lite(self, state: ConnectNState, action: jnp.ndarray) -> ConnectNState:
        """Descent-path step: place + mirror + bookkeeping, no win detection
        (the search tree stores terminal flags; see core.Env.step_lite)."""
        cfg = self.cfg
        action = action.astype(jnp.int32)
        if cfg.gravity:
            col = action
            row = cfg.height - 1 - state.heights[col]
        else:
            col = action // cfg.height
            row = action % cfg.height
        row = jnp.clip(row, 0, cfg.height - 1)
        placed = state.board.at[row, col].set(jnp.int8(1))
        return ConnectNState(
            board=-placed,
            heights=state.heights.at[col].add(1) if cfg.gravity else state.heights,
            fullmove=state.fullmove + 1,
            terminal=jnp.bool_(False),
            won=jnp.bool_(False),
        )

    def legal_mask(self, state: ConnectNState) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.gravity:
            # A column is open iff its top cell is empty (board.py:113-119).
            mask = state.board[0, :] == 0
        else:
            # action = x * height + y addresses cell (y, x) (board.py:138-146).
            mask = (state.board == 0).T.reshape(-1)
        return mask & ~state.terminal

    def observe(self, state: ConnectNState) -> jnp.ndarray:
        board = state.board
        return jnp.stack(
            [
                (board == 0).astype(jnp.float32),
                (board == 1).astype(jnp.float32),
                (board == -1).astype(jnp.float32),
                jnp.ones_like(board, jnp.float32),
            ],
            axis=-1,
        )

    def is_terminal(self, state: ConnectNState) -> jnp.ndarray:
        return state.terminal

    def terminal_value(self, state: ConnectNState) -> jnp.ndarray:
        # Side to move at a terminal node lost if the last mover won.
        return jnp.where(state.won, -1.0, 0.0).astype(jnp.float32)


core.register("connect_n", ConnectN)
