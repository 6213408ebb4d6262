#!/bin/bash
# Chess TPU window (round 3): tactics set on-chip, profile, then training.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/results/jax_cache

# 1. Mate-in-1 tactics set, generated fast on the chip.
timeout 1200 python -m custom_alphazero_tpu.tools.chess_tactics \
  --generate=chess_tactics_500.npz --positions=500 --seed=42 \
  > results/logs/tactics_gen_tpu.log 2>&1

# 2. Per-component chess wave profile (VERDICT #4 evidence).
timeout 1200 python -m custom_alphazero_tpu.tools.profile_chess \
  --batch=1024 --sims=64 > results/logs/profile_chess.log 2>&1

# 3. Chess training run: reference-scale net, 100 sims, continuous
#    self-play, run until STOP file.
nohup python -m custom_alphazero_tpu.runtime.supervisor \
  --supervise.max_restarts=20 --supervise.backoff_s=5 \
  --supervise.liveness_timeout_minutes=6 \
  --game=chess --mcts.simulations=100 \
  --mcts.use_dirichlet=true --mcts.dirichlet_alpha=0.3 \
  --mcts.greedy_from_move=30 \
  --self_play.games_per_generation=256 --self_play.continuous=true \
  --self_play.exclude_draws=false \
  --model.batch_size=512 --model.lr_values="(0.01,0.002)" \
  --model.lr_boundaries="(3000,)" \
  --replay.capacity=200000 --replay.min_size=8000 \
  --loop.train_iterations_per_generation=10 --loop.generations=0 \
  --loop.samples_checkpoint_frequency=0 --loop.visualize_frequency=0 \
  --arena.games=128 --arena.evaluation_frequency=300 \
  --arena.checkpoint_frequency=300 \
  --run.run_id=chess-r3 --run.watchdog_minutes=10 \
  >> results/logs/chess-r3.log 2>&1 &
echo "chess supervisor PID: $!" > results/logs/chess-r3.pid
echo WINDOW-STARTED
