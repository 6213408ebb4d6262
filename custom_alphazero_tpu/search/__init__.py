"""Array-tree PUCT MCTS."""

from custom_alphazero_tpu.search.mcts import MCTS, Tree  # noqa: F401
