#!/bin/bash
# Round-4 Connect-4 production run: reference workload (250 sims, depth-4/128)
# with the round-3 plateau levers baked in from the start (VERDICT r3 #3):
#   (a) solver-distilled auxiliary value target (train_labels.npz, deduped
#       against the committed eval set) — loop.solver_* flags;
#   (b) a compressed LR schedule sized for a ~2.5 h single-chip leg;
# a late regime shift (more sims / lower temperature) is applied by a
# second leg resuming from this run's checkpoint (run_c4_r4_leg2.sh).
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
  --loop.train_iterations_per_generation=20 \
  --loop.samples_checkpoint_frequency=100 --loop.visualize_frequency=100 \
  --loop.solver_labels_path=data/train_labels.npz \
  --loop.solver_value_weight=0.25 --loop.solver_value_batch=256 \
  --arena.games=256 --arena.evaluation_frequency=200 \
  --arena.checkpoint_frequency=200 --arena.evaluate_with_solver=true \
  --run.run_id=c4-r4
