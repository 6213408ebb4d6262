"""Pure-JAX chess engine (reference: custom_alphazero/chess/, which
free-rides on python-chess; here the full rules are table-driven array ops).

Importing this package registers the "chess" env in the core registry.
"""

from custom_alphazero_tpu.envs.chess import tables  # noqa: F401
from custom_alphazero_tpu.envs.chess.engine import Chess, ChessState  # noqa: F401
