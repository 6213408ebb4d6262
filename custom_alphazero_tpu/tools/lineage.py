"""Strength progression over a run's promotion lineage.

The reference records only the arena winning score of each promotion as a
TensorBoard scalar (model/tensorflow/train.py:103-113); whether the lineage
is actually getting *stronger in absolute terms* is invisible. This tool
walks every promoted best-model checkpoint (``evaluation/iteration_N``,
reference utils.py:110-133 layout) and scores each one against the
exact-solver oracle:

- raw-policy move/value accuracy on a precomputed solver-labeled position
  set (fast, no solver calls — tools/distill.py output);
- optionally a full MCTS strength probe per promotion
  (tools/strength.evaluate_strength) at ``--probe_games`` games.

Output: a markdown table (promotion iteration -> accuracies) plus one JSON
line for machine consumption.

Run: python -m custom_alphazero_tpu.tools.lineage --run_id=strong-r2 \
       --labels=data/eval_labels.npz [--probe_games=0] [--sims=250]
"""

from __future__ import annotations

import json
import os
import sys

import jax

from custom_alphazero_tpu import paths
from custom_alphazero_tpu.config import MCTSConfig, from_json
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.io.checkpoint import (
    list_evaluation_iterations,
    load_checkpoint,
)
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.train import init_train_state, make_evaluate_fn
from custom_alphazero_tpu.tools.strength import (
    evaluate_strength,
    labeled_policy_accuracy,
)


def lineage_report(
    run_id: str,
    results_dir: str = "results",
    game: str = "connect_n",
    labels: str | None = None,
    probe_games: int = 0,
    sims: int | None = None,
    include_random_init: bool = True,
) -> dict:
    """Score every promoted checkpoint of ``run_id``; returns
    {run_id, entries: [{iteration, steps, move_accuracy, ...}]}.

    ``include_random_init`` prepends a random-initialization row (the
    baseline any promotion must beat)."""
    run_dir = paths.run_path(results_dir, game, run_id)
    with open(os.path.join(run_dir, paths.CONFIG_FILE)) as fp:
        cfg = from_json(fp.read())
    if game == "chess":
        if probe_games > 0:
            raise SystemExit(
                "--probe_games uses the Connect-4 exact-solver oracle; "
                "for chess lineages use --labels (e.g. a tactics set from "
                "tools/chess_tactics.py) or tools/chess_strength.py"
            )
        from custom_alphazero_tpu.envs.chess.engine import Chess

        env = Chess(cfg.chess)
    else:
        env = ConnectN(cfg.connect_n)
    net = PolicyValueNet(env.num_actions, cfg.model)
    template = init_train_state(
        net, cfg.model, jax.random.PRNGKey(0), env.obs_shape
    )
    evaluate = make_evaluate_fn(net)
    sims = sims if sims is not None else cfg.mcts.simulations
    lineage = list_evaluation_iterations(
        paths.evaluation_path(results_dir, game, run_id)
    )

    def score(state, iteration, steps):
        def evaluate_fn(obs):
            return evaluate(state.params, state.batch_stats, obs)

        entry = {"iteration": iteration, "steps": steps}
        if labels:
            entry.update(labeled_policy_accuracy(evaluate_fn, labels))
        if probe_games > 0:
            probe = evaluate_strength(
                env, evaluate_fn, num_games=probe_games, use_mcts=True,
                mcts_cfg=MCTSConfig(simulations=sims), opponent="random",
            )
            entry["mcts_move_accuracy"] = probe["move_accuracy"]
            entry["mcts_rank_score"] = probe["mean_rank_score"]
        return entry

    entries = []
    if include_random_init:
        entries.append(score(template, "random-init", 0))
    for iteration, path in lineage:
        state, meta = load_checkpoint(path, template)
        entries.append(score(state, iteration, meta.get("steps")))
    return {"run_id": run_id, "sims": sims, "entries": entries}


def format_table(report: dict) -> str:
    entries = report["entries"]
    probe = any("mcts_move_accuracy" in e for e in entries)
    labeled = any("move_accuracy" in e for e in entries)
    head = ["promotion iter", "steps"]
    if labeled:
        head += ["labeled move acc", "labeled value acc", "value sign acc"]
    if probe:
        head += [f"MCTS-{report['sims']} move acc", "rank score"]
    lines = ["| " + " | ".join(head) + " |",
             "|" + "---|" * len(head)]
    for e in entries:
        row = [str(e["iteration"]), str(e["steps"])]
        if labeled:
            row += [f"{e.get('move_accuracy', float('nan')):.3f}",
                    f"{e.get('value_accuracy', float('nan')):.3f}",
                    f"{e.get('value_sign_accuracy', float('nan')):.3f}"]
        if probe:
            row += [f"{e.get('mcts_move_accuracy', float('nan')):.3f}",
                    f"{e.get('mcts_rank_score', float('nan')):.3f}"]
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def main(argv=None):
    from custom_alphazero_tpu.tools.cli import parse_kv_args

    args = parse_kv_args(argv or sys.argv[1:], __doc__)
    report = lineage_report(
        args["--run_id"],
        results_dir=args.get("--results_dir", "results"),
        game=args.get("--game", "connect_n"),
        labels=args.get("--labels"),
        probe_games=int(args.get("--probe_games", 0)),
        sims=int(args["--sims"]) if "--sims" in args else None,
    )
    print(format_table(report))
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
