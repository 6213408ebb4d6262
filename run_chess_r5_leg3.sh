#!/bin/bash
# Round-5 chess floor-LR leg: resume the combined run (Gumbel + tactics
# aux + grad_clip) with the LR dropped 0.01 -> 0.002 (-> 5e-4 late).
# Rationale: with aux-from-scratch the run peaks early (arena 0.784 at
# step 400) and later candidates DEGRADE relative to the promoted peak
# (0.451 at 800, 0.220 at 1200) while the LR sits at the initial 1e-2 —
# the same dynamic the c4 legs resolved with floor-LR continuation
# (TRAINING.md c4-r4 leg 3).
cd "$(dirname "$0")"
B=${1:-128}
exec python -m custom_alphazero_tpu.runtime.supervisor \
  --supervise.liveness_timeout_minutes=10 \
  --game=chess \
  --mcts.simulations=100 --mcts.use_gumbel=true --mcts.use_dirichlet=false \
  --mcts.gumbel_max_considered=16 \
  --self_play.games_per_generation=$B --self_play.continuous=true \
  --self_play.exclude_draws=false --self_play.max_plies=256 \
  --model.batch_size=512 --model.grad_clip_norm=5.0 \
  --model.lr_values="(0.002,0.0005)" --model.lr_boundaries="(3200,)" \
  --replay.capacity=100000 --replay.min_size=4000 --replay.policy_topk=128 \
  --loop.train_iterations_per_generation=16 --loop.max_sample_reuse=1.0 \
  --loop.samples_checkpoint_frequency=0 --loop.visualize_frequency=0 \
  --loop.solver_labels_path=data/chess_tactic_labels.npz \
  --loop.solver_value_weight=0.25 --loop.solver_value_batch=256 \
  --loop.solver_policy_weight=1.0 \
  --arena.games=64 --arena.evaluation_frequency=400 \
  --arena.checkpoint_frequency=400 \
  --arena.evaluate_with_mcts=true --arena.promote_threshold=0.55 \
  --arena.min_decisives=8 --arena.promote_when_inconclusive=true \
  --run.run_id=chess-r5
