#!/bin/bash
# Round-5 chess strength panel (VERDICT r4 #1 done-criterion + weak #5):
# raw + searched tactics on the mate-in-1 and mate-in-2 sets, uniform-
# evaluator controls at matching budgets (separating net quality from
# structural search-budget sufficiency), and baseline-opponent matches.
cd "$(dirname "$0")"
RUN=${1:-chess-r5}
WHICH=${2:-best}
SIMS=${3:-100}
echo "== mate-in-1 raw =="
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_tactics_300.npz --run_id=$RUN --which=$WHICH
echo "== mate-in-1 searched ($SIMS sims) =="
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_tactics_300.npz --run_id=$RUN --which=$WHICH \
  --mcts=true --sims=$SIMS
echo "== mate-in-2 raw =="
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_mate2_300.npz --run_id=$RUN --which=$WHICH
echo "== mate-in-2 searched ($SIMS sims) =="
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_mate2_300.npz --run_id=$RUN --which=$WHICH \
  --mcts=true --sims=$SIMS
echo "== mate-in-2 UNIFORM control (100 sims) =="
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_mate2_300.npz --uniform=true --mcts=true --sims=100
echo "== mate-in-2 UNIFORM control (800 sims) =="
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_mate2_300.npz --uniform=true --mcts=true --sims=800
echo "== vs random + greedy-material =="
python -m custom_alphazero_tpu.tools.chess_strength \
  --run_id=$RUN --which=$WHICH --games=64 --sims=$SIMS
