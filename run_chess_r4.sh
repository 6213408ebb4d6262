#!/bin/bash
# Round-4 chess production run (VERDICT r3 #2: the multi-hour TPU chess run).
# PUCT + root Dirichlet noise (alpha=0.3), 100 sims/move — the round-3
# regime, now at batch 128 continuous lockstep with in-scan bit-packed
# observation buffers and the gather-free noise sampler (138k sims/s at
# B=64 measured; see PARITY.md round-4 section). Policy targets stored
# top-128 (exact: 100 sims visit <= 100 root children).
cd "$(dirname "$0")"
B=${1:-128}
exec python -m custom_alphazero_tpu.runtime.supervisor \
  --supervise.liveness_timeout_minutes=10 \
  --game=chess \
  --mcts.simulations=100 --mcts.use_dirichlet=true --mcts.dirichlet_alpha=0.3 \
  --mcts.greedy_from_move=30 \
  --self_play.games_per_generation=$B --self_play.continuous=true \
  --self_play.exclude_draws=false --self_play.max_plies=256 \
  --model.batch_size=256 \
  --replay.capacity=100000 --replay.min_size=4000 --replay.policy_topk=128 \
  --loop.train_iterations_per_generation=12 \
  --loop.samples_checkpoint_frequency=0 --loop.visualize_frequency=0 \
  --arena.games=64 --arena.evaluation_frequency=200 \
  --arena.checkpoint_frequency=200 \
  --run.run_id=chess-r4
