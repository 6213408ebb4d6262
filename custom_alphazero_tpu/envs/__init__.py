"""Game environments: pure-JAX vectorized engines + registry."""

from custom_alphazero_tpu.envs.core import Env, make, register  # noqa: F401
from custom_alphazero_tpu.envs.connect_n import ConnectN, ConnectNState  # noqa: F401
