#!/bin/bash
# Round-4 chess production run (VERDICT r3 #2: the multi-hour TPU chess run).
# PUCT + root Dirichlet noise, 100 sims/move — the round-3 regime shape at
# batch 128 continuous lockstep, with the round-4 fixes: in-scan bit-packed
# observation buffers, gather-free noise sampler (138k sims/s at B=64
# measured, PARITY.md round-4). Anti-prior-valley knobs vs round 3 (the
# r3 net scored BELOW the random baseline on tactics because early policy
# mass starves rare tactical moves): stronger root exploration
# (dirichlet_fraction 0.35, c_puct 2.0 — Gumbel would be better at this
# budget per the gumbel-vs-puct experiment but currently kernel-faults on
# the chip at chess scale, a known issue). Policy targets stored top-128
# (exact: 100 sims visit <= 100 root children).
cd "$(dirname "$0")"
B=${1:-128}
exec python -m custom_alphazero_tpu.runtime.supervisor \
  --supervise.liveness_timeout_minutes=10 \
  --game=chess \
  --mcts.simulations=100 --mcts.use_dirichlet=true --mcts.dirichlet_alpha=0.3 \
  --mcts.dirichlet_fraction=0.35 --mcts.c_puct=2.0 \
  --mcts.greedy_from_move=30 \
  --self_play.games_per_generation=$B --self_play.continuous=true \
  --self_play.exclude_draws=false --self_play.max_plies=256 \
  --model.batch_size=512 \
  --replay.capacity=100000 --replay.min_size=4000 --replay.policy_topk=128 \
  --loop.train_iterations_per_generation=16 \
  --loop.samples_checkpoint_frequency=0 --loop.visualize_frequency=0 \
  --arena.games=64 --arena.evaluation_frequency=400 --arena.promote_threshold=0.0 \
  --arena.checkpoint_frequency=400 \
  --run.run_id=chess-r4
