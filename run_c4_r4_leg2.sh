#!/bin/bash
# Leg 2: resume c4-r4 with a cheaper arena cadence (solver-scored arenas
# every 400 iters instead of 200 — each costs ~2 min of host solving) and
# a higher train/generate ratio (generation dominates the cycle at 8.5 s;
# 32 extra-cheap train iters/gen reach the LR floor sooner).
cd "$(dirname "$0")"
exec python -m custom_alphazero_tpu.runtime.supervisor \
  --supervise.liveness_timeout_minutes=10 \
  --mcts.simulations=250 --mcts.greedy_from_move=12 \
  --mcts.use_dirichlet=true --mcts.dirichlet_alpha=1.0 \
  --self_play.games_per_generation=1024 --self_play.exclude_draws=false \
  --self_play.continuous=true \
  --model.batch_size=1024 \
  --model.lr_values="(0.01,0.0025,0.0005)" --model.lr_boundaries="(3500,6500)" \
  --replay.capacity=400000 --replay.min_size=20000 \
  --loop.train_iterations_per_generation=32 \
  --loop.samples_checkpoint_frequency=100 --loop.visualize_frequency=100 \
  --loop.solver_labels_path=data/train_labels.npz \
  --loop.solver_value_weight=0.25 --loop.solver_value_batch=256 \
  --arena.games=256 --arena.evaluation_frequency=400 \
  --arena.checkpoint_frequency=400 --arena.evaluate_with_solver=true \
  --run.run_id=c4-r4
