#!/bin/bash
# Post-strong-r2 evaluation battery (round 3). Runs on the freed TPU chip.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/results/jax_cache

# 1. Full strength report with oracle-normalized openings (the BASELINE
#    strength protocol): best promoted model, MCTS-250, 20 games/opponent.
timeout 3000 python -m custom_alphazero_tpu.tools.final_eval \
  --run_id=strong-r2 --labels=data/eval_labels.npz --games=20 --sims=250 \
  > results/logs/final_eval_r3.log 2>&1

# 2. Promotion lineage with labeled accuracies (CPU-sized work but the
#    chip is free; fast).
timeout 1800 python -m custom_alphazero_tpu.tools.lineage \
  --run_id=strong-r2 --labels=data/eval_labels.npz \
  > results/logs/lineage_r3.log 2>&1

# 3. run_report summary (promotions, Elo curve, throughput).
timeout 300 python -m custom_alphazero_tpu.tools.run_report \
  --run_id=strong-r2 > results/logs/run_report_r3.log 2>&1
echo DONE
