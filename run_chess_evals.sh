#!/bin/bash
# Final chess-r3 evaluation: tactics + baseline opponents (on the chip).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/results/jax_cache
WHICH=${1:-last}

timeout 900 python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_tactics_300.npz --run_id=chess-r3 --which=$WHICH \
  > results/logs/chess_tactics_final_raw.log 2>&1
timeout 900 python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_tactics_300.npz --run_id=chess-r3 --which=$WHICH \
  --mcts=true --sims=100 \
  > results/logs/chess_tactics_final_mcts.log 2>&1
timeout 1800 python -m custom_alphazero_tpu.tools.chess_strength \
  --run_id=chess-r3 --which=$WHICH --games=64 --sims=100 \
  > results/logs/chess_strength_final.log 2>&1
echo DONE
