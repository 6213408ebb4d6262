#!/bin/bash
# c4-r4 final strength battery (BASELINE strength row; VERDICT r3 #3 done
# criteria: >= 0.97 move accuracy vs the perfect solver and zero losses
# from non-lost openings over >= 20 random openings).
# Run AFTER the training run has released the chip.
cd "$(dirname "$0")"
RUN=${1:-c4-r4}
set -x
# Training-regime sims and a play-strength (deployment) budget.
python -m custom_alphazero_tpu.tools.final_eval --run_id=$RUN \
  --labels=data/eval_labels.npz --games=20 --sims=250 --seed=7
python -m custom_alphazero_tpu.tools.final_eval --run_id=$RUN \
  --games=20 --sims=800 --seed=7
python -m custom_alphazero_tpu.tools.lineage --run_id=$RUN --labels=data/eval_labels.npz
python -m custom_alphazero_tpu.tools.run_report --run_id=$RUN
