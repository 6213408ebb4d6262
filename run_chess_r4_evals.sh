#!/bin/bash
# Chess-r4 strength panel (VERDICT r3 #2 done-criteria): raw + searched
# tactics on the committed mate-in-1 and mate-in-2 sets, and baseline
# opponent matches. Run AFTER the chess-r4 training run has released the
# chip. Usage: ./run_chess_r4_evals.sh [run_id] [which]
cd "$(dirname "$0")"
RUN=${1:-chess-r4}
WHICH=${2:-last}
set -x
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_tactics_300.npz --run_id=$RUN --which=$WHICH
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_tactics_300.npz --run_id=$RUN --which=$WHICH --mcts=true --sims=100
if [ -f data/chess_mate2_300.npz ]; then
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_mate2_300.npz --run_id=$RUN --which=$WHICH
python -m custom_alphazero_tpu.tools.chess_tactics \
  --labels=data/chess_mate2_300.npz --run_id=$RUN --which=$WHICH --mcts=true --sims=100
fi
python -m custom_alphazero_tpu.tools.chess_strength \
  --run_id=$RUN --which=$WHICH --opponent=random,greedy --games=64 --sims=100
