#!/bin/bash
# Round-5 Connect-4 finishing leg (VERDICT r4 #2): resume c4-r4 from its
# leg-3 state (7,212 steps, LR floor 5e-4) with the round-5 levers:
# - arena.evaluate_with_mcts=true: the promotion gate measures SEARCH
#   play (the r4 finding: the raw-policy gate anti-correlates with
#   vs-perfect strength at this level — 'last' beat 'best' vs the
#   perfect opponent while losing raw-policy arenas).
# - strong-line solver labels (data/train_labels_r5.npz): the r4 9k
#   random-rollout labels plus 6k positions along near-perfect-play
#   lines from random 8-ply openings — the exact region where the 7-9
#   leaked games vs the perfect opponent live (tools/distill
#   strongline_dataset).
# - a longer LR floor: 5e-4 to 10k steps, 2.5e-4 to 13k, then 1e-4.
# - sample-reuse guardrail on (loop.max_sample_reuse).
cd "$(dirname "$0")"
exec python -m custom_alphazero_tpu.runtime.supervisor \
  --supervise.liveness_timeout_minutes=10 \
  --mcts.simulations=250 --mcts.greedy_from_move=12 \
  --mcts.use_dirichlet=true --mcts.dirichlet_alpha=1.0 \
  --self_play.games_per_generation=1024 --self_play.exclude_draws=false \
  --self_play.continuous=true \
  --model.batch_size=1024 \
  --model.lr_values="(0.0005,0.00025,0.0001)" --model.lr_boundaries="(10000,13000)" \
  --replay.capacity=400000 --replay.min_size=20000 \
  --loop.train_iterations_per_generation=20 --loop.max_sample_reuse=1.0 \
  --loop.samples_checkpoint_frequency=100 --loop.visualize_frequency=100 \
  --loop.solver_labels_path=data/train_labels_r5.npz \
  --loop.solver_value_weight=0.25 --loop.solver_value_batch=256 \
  --arena.games=256 --arena.evaluation_frequency=400 \
  --arena.checkpoint_frequency=400 --arena.evaluate_with_solver=true \
  --arena.evaluate_with_mcts=true \
  --run.run_id=c4-r4
