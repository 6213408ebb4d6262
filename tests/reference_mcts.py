"""Independent object-tree PUCT twin of the reference MCTS semantics
(/root/reference/custom_alphazero/mcts/mcts.py, written from the spec, not the
code) over the NumPy Connect-N twin. Used as the exact-parity oracle for the
array-tree search:

- UCB = Q + c * P * sqrt(sum sibling edge visits) / (1 + N), Q = W/N or 0
- select descends to the first node with no edges; expansion evaluates the
  leaf, masks+renormalizes priors over legal moves, creates all children
- terminal leaves back up the result for the last mover (+1 win / 0 draw);
  network leaves back up -value; signs alternate each ply toward the root
- the simulation that evaluates the root performs no backup
- argmax tie-breaking picks the lowest action index
"""

from __future__ import annotations

import copy

import numpy as np


class RefNode:
    __slots__ = ("board", "edges", "evaluated_value")

    def __init__(self, board):
        self.board = board
        self.edges = None  # None = unexpanded; list of RefEdge otherwise
        self.evaluated_value = None


class RefEdge:
    __slots__ = ("action", "prior", "child", "visits", "value_sum")

    def __init__(self, action, prior, child):
        self.action = action
        self.prior = prior
        self.child = child
        self.visits = 0
        self.value_sum = 0.0


class RefMCTS:
    def __init__(self, board, evaluate_fn, c_puct=1.5):
        self.root = RefNode(copy.deepcopy(board))
        self.evaluate_fn = evaluate_fn  # board -> (probs over A, value)
        self.c = c_puct

    def _ucb(self, node):
        total = sum(e.visits for e in node.edges)
        scores = []
        for e in node.edges:
            q = e.value_sum / e.visits if e.visits else 0.0
            u = self.c * e.prior * np.sqrt(total) / (1 + e.visits)
            scores.append(q + u)
        return int(np.argmax(scores))

    def _expand(self, node):
        probs, value = self.evaluate_fn(node.board)
        node.evaluated_value = value
        mask = node.board.legal_mask()
        masked = np.where(mask, probs, 0.0)
        total = masked.sum()
        if total > 0:
            masked = masked / total
        else:
            masked = mask / max(mask.sum(), 1)
        node.edges = []
        for action in np.nonzero(mask)[0]:
            child_board = copy.deepcopy(node.board)
            child_board.play(int(action))
            node.edges.append(
                RefEdge(int(action), float(masked[action]), RefNode(child_board))
            )
        return value

    def simulate(self):
        node, path = self.root, []
        while node.edges is not None and not node.board.terminal:
            edge = node.edges[self._ucb(node)]
            path.append(edge)
            node = edge.child
        if node.board.terminal:
            value = float(node.board.result_for_last_mover())
        else:
            value = -self._expand(node)
        for edge in reversed(path):
            edge.visits += 1
            edge.value_sum += value
            value = -value

    def search(self, simulations):
        for _ in range(simulations):
            self.simulate()

    def advance(self, action):
        """Re-root at the played child, keeping its subtree's statistics
        (the reference's play() subtree reuse, mcts.py:207)."""
        edge = next(e for e in self.root.edges if e.action == action)
        self.root = edge.child

    def root_child_visits(self, num_actions):
        out = np.zeros(num_actions, np.int32)
        if self.root.edges:
            for e in self.root.edges:
                out[e.action] = e.visits
        return out

    def root_q_values(self, num_actions):
        out = np.zeros(num_actions, np.float64)
        if self.root.edges:
            for e in self.root.edges:
                out[e.action] = e.value_sum / e.visits if e.visits else 0.0
        return out
