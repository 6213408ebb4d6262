"""Actor-learner runtime: self-play, training, arena, loop."""
