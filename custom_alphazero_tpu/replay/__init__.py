"""Device-resident replay buffer."""

from custom_alphazero_tpu.replay.buffer import (  # noqa: F401
    ReplayState,
    replay_add,
    replay_init,
    replay_sample,
)
