"""Independent NumPy twin of the reference Connect-N board semantics.

A deliberately simple, mutable, scalar-loop implementation of the behavior of
/root/reference/custom_alphazero/connect_n/board.py (written from the spec,
not the code), used as the test oracle for the vectorized JAX engine:

- canonical mirroring after every ply (side to move is always +1),
- gravity drop to the lowest empty row (row 0 = top),
- win detection through the last move along 4 direction families,
- result +1 for the last mover on win / 0 draw,
- full_state one-hot observation [empty, +1, -1] + ones turn plane,
- legal move mask over the fixed action space.
"""

from __future__ import annotations

import numpy as np


class RefConnectN:
    def __init__(self, width=7, height=6, n=4, gravity=True):
        self.w, self.h, self.n, self.gravity = width, height, n, gravity
        self.board = np.zeros((height, width), np.int8)  # +1 side to move
        self.fullmove = 0
        self.terminal = False
        self.won = False

    # -- queries ----------------------------------------------------------
    @property
    def num_actions(self):
        return self.w if self.gravity else self.w * self.h

    def legal_mask(self):
        mask = np.zeros(self.num_actions, bool)
        if self.terminal:
            return mask
        if self.gravity:
            for c in range(self.w):
                mask[c] = self.board[0, c] == 0
        else:
            for x in range(self.w):
                for y in range(self.h):
                    mask[x * self.h + y] = self.board[y, x] == 0
        return mask

    def observe(self):
        obs = np.zeros((self.h, self.w, 4), np.float32)
        obs[..., 0] = self.board == 0
        obs[..., 1] = self.board == 1
        obs[..., 2] = self.board == -1
        obs[..., 3] = 1.0
        return obs

    def result_for_last_mover(self):
        if not self.terminal:
            return None
        return 1 if self.won else 0

    # -- dynamics ---------------------------------------------------------
    def _wins_through(self, r, c):
        """Does the stone at (r, c) complete n in a row for its color?"""
        color = self.board[r, c]
        for dr, dc in ((1, 0), (0, 1), (1, 1), (1, -1)):
            count = 1
            for sign in (1, -1):
                rr, cc = r + sign * dr, c + sign * dc
                while 0 <= rr < self.h and 0 <= cc < self.w and self.board[rr, cc] == color:
                    count += 1
                    rr += sign * dr
                    cc += sign * dc
            if count >= self.n:
                return True
        return False

    def play(self, action):
        """Apply the mover's action, mirror, return reward for the mover."""
        if self.terminal:
            return 0.0
        if self.gravity:
            c = action
            r = max(np.where(self.board[:, c] == 0)[0])  # lowest empty row
        else:
            c, r = action // self.h, action % self.h
        assert self.board[r, c] == 0
        self.board[r, c] = 1
        self.fullmove += 1
        if self._wins_through(r, c):
            self.terminal, self.won = True, True
        elif not (self.board == 0).any():
            self.terminal, self.won = True, False
        reward = 1.0 if self.won else 0.0
        self.board = -self.board  # canonical mirror: next mover becomes +1
        return reward
