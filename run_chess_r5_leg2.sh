#!/bin/bash
# Round-5 chess leg 2 (contingency): resume chess-r5 with the engine-
# labeled tactics AUX TARGET (loop.solver_policy_weight — mating-move CE
# + exact z=+1 value MSE on ~4.5k engine-labeled mate-in-1/2 positions,
# freshly generated with seeds disjoint from the committed eval sets) on
# top of the Gumbel regime. This is the budget-honest warm-start lever
# (VERDICT r4 #1 fallback) applied as a continuous auxiliary signal, the
# exact mechanism the c4-r4 solver-distilled value target proved out.
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
