#!/bin/bash
# Round-5 chess production run (VERDICT r4 #1): Gumbel sequential halving
# on the chip — the designated low-budget chess regime (its improved-policy
# targets beat PUCT by +0.055 move acc in the committed experiment, and its
# root visits every candidate: the direct antidote to the prior-starvation
# valley of rounds 3-4) — runnable at chess scale since the round-5
# compressed-tree fix (PARITY.md round 5: B=128 at 208k sims/s in-loop).
# Gate fixes vs r4 (VERDICT r4 #4 + weak #2/#3): the arena searches
# (evaluate_with_mcts) so promotion measures SEARCH play, and the
# draw-heavy series trap is handled by min_decisives=8 +
# promote_when_inconclusive (fresh net promotes on inconclusive series;
# a candidate that actually loses >= 8 decisives is blocked) instead of
# r4's promote_threshold=0.0 bypass. Sample-reuse guardrail on.
cd "$(dirname "$0")"
B=${1:-128}
exec python -m custom_alphazero_tpu.runtime.supervisor \
  --supervise.liveness_timeout_minutes=10 \
  --game=chess \
  --mcts.simulations=100 --mcts.use_gumbel=true --mcts.use_dirichlet=false \
  --mcts.gumbel_max_considered=16 \
  --self_play.games_per_generation=$B --self_play.continuous=true \
  --self_play.exclude_draws=false --self_play.max_plies=256 \
  --model.batch_size=512 \
  --replay.capacity=100000 --replay.min_size=4000 --replay.policy_topk=128 \
  --loop.train_iterations_per_generation=16 --loop.max_sample_reuse=1.0 \
  --loop.samples_checkpoint_frequency=0 --loop.visualize_frequency=0 \
  --arena.games=64 --arena.evaluation_frequency=400 \
  --arena.checkpoint_frequency=400 \
  --arena.evaluate_with_mcts=true --arena.promote_threshold=0.55 \
  --arena.min_decisives=8 --arena.promote_when_inconclusive=true \
  --run.run_id=chess-r5
