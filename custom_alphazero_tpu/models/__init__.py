"""Policy-value networks (Flax) + losses/optimizer."""

from custom_alphazero_tpu.models.policy_value import (  # noqa: F401
    PolicyValueNet,
    masked_policy,
)
from custom_alphazero_tpu.models.losses import (  # noqa: F401
    learning_rate_schedule,
    l2_penalty,
    make_optimizer,
    policy_loss,
    value_loss,
)
