"""Supervised solver distillation: a net/trainer learning-capacity check.

Trains the policy-value net directly on exact-solver labels (one-hot best
move + game-theoretic value, the reference's ``exact_policy_and_value``
output, /root/reference/custom_alphazero/exact_solvers/c4_exact_solver.py:77-85)
over positions sampled from random rollouts, then measures raw-policy
move accuracy against the oracle on held-out positions.

This isolates the *learning machinery* (net capacity, losses, optimizer,
train step) from *self-play data quality*: if distillation reaches high
oracle accuracy, weak self-play results are a data/regime issue, not a
framework defect. The reference has no analogue — its only supervised
signal is self-play (s, pi, z).

Run:  python -m custom_alphazero_tpu.tools.distill --positions=5000
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu import solver as sv
from custom_alphazero_tpu.config import ConnectNConfig, ModelConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.train import init_train_state, make_train_step


def board_obs(board: np.ndarray) -> np.ndarray:
    """(H, W) canonical int8 board -> the env's (H, W, 4) observation
    (empty / side-to-move / opponent one-hot + constant turn plane,
    envs/connect_n.py observe)."""
    return np.stack(
        [
            (board == 0).astype(np.float32),
            (board == 1).astype(np.float32),
            (board == -1).astype(np.float32),
            np.ones_like(board, np.float32),
        ],
        axis=-1,
    )


def child_values(board: np.ndarray, solver: sv.ConnectFourSolver) -> dict:
    """Exact value (side-to-move view, {-1,0,1}) of each legal column."""
    vals = {}
    for col in sv.legal_columns(board):
        child, ended = sv.play_canonical(board, col)
        if ended:
            vals[col] = 1 if sv._board_has_win(-child) else 0
        else:
            vals[col] = -int(np.sign(solver.solve_board(child)))
    return vals


def labeled_dataset(
    n_positions: int,
    seed: int = 0,
    min_ply: int = 6,
    max_ply: int = 34,
    solver: Optional[sv.ConnectFourSolver] = None,
):
    """Sample distinct midgame positions from random rollouts and label them
    with the oracle.

    Returns dict of arrays: obs (N,6,7,4), pi (N,7) one-hot best move,
    z (N,) exact value, optimal (N,7) bool mask of value-optimal columns.
    """
    solver = solver or sv.ConnectFourSolver()
    rng = np.random.default_rng(seed)
    seen = set()
    obs, pis, zs, optimal = [], [], [], []
    while len(obs) < n_positions:
        board = np.zeros((6, 7), np.int8)
        target_ply = int(rng.integers(min_ply, max_ply + 1))
        ply, ended = 0, False
        while ply < target_ply and not ended:
            legal = sv.legal_columns(board)
            board, ended = sv.play_canonical(board, int(rng.choice(legal)))
            ply += 1
        if ended:
            continue
        key = board.tobytes()
        if key in seen:
            continue
        seen.add(key)
        vals = child_values(board, solver)
        best = max(vals.values())
        opt = np.zeros(7, bool)
        for col, v in vals.items():
            opt[col] = v == best
        pi = np.zeros(7, np.float32)
        # One-hot on the oracle's ranked-best move (reference one-hot policy).
        ranked, value = solver.ranked_moves_and_value(board)
        pi[sv.legal_columns(board)[ranked[0]]] = 1.0
        obs.append(board_obs(board))
        pis.append(pi)
        zs.append(np.float32(value))
        optimal.append(opt)
    return {
        "obs": np.stack(obs),
        "pi": np.stack(pis),
        "z": np.asarray(zs, np.float32),
        "optimal": np.stack(optimal),
    }


def _boards_from_obs(obs: np.ndarray):
    """Invert board_obs: (N, 6, 7, 4) observation -> (N, 6, 7) int8."""
    return (obs[..., 1] - obs[..., 2]).astype(np.int8)


def strongline_dataset(
    n_positions: int,
    seed: int = 0,
    opening_plies: int = 8,
    epsilon: float = 0.15,
    max_ply: int = 34,
    solver: Optional[sv.ConnectFourSolver] = None,
    exclude: tuple = (),
):
    """Label positions along (near-)perfect-play lines (round 5, VERDICT
    r4 #2): random ``opening_plies``-ply openings — the final_eval
    protocol's start distribution — then both sides play solver-optimal
    moves (uniform among value-optimal columns) with an ``epsilon``
    chance of a uniformly random deviation per ply. Every distinct
    position along these lines gets the oracle one-hot policy + exact
    value. This covers exactly the region where c4-r4 leaked games to
    the perfect opponent: positions reachable under strong play, which
    random-rollout sampling (labeled_dataset) under-represents.

    ``exclude``: board keys (bytes) never to emit (eval-set dedup).
    """
    solver = solver or sv.ConnectFourSolver()
    rng = np.random.default_rng(seed)
    seen = set(exclude)
    obs, pis, zs, optimal = [], [], [], []
    while len(obs) < n_positions:
        board = np.zeros((6, 7), np.int8)
        ended = False
        for _ in range(opening_plies):
            legal = sv.legal_columns(board)
            board, ended = sv.play_canonical(board, int(rng.choice(legal)))
            if ended:
                break
        ply = opening_plies
        while not ended and ply < max_ply and len(obs) < n_positions:
            vals = child_values(board, solver)
            best = max(vals.values())
            key = board.tobytes()
            if key not in seen:
                seen.add(key)
                opt = np.zeros(7, bool)
                for col, v in vals.items():
                    opt[col] = v == best
                ranked, value = solver.ranked_moves_and_value(board)
                pi = np.zeros(7, np.float32)
                pi[sv.legal_columns(board)[ranked[0]]] = 1.0
                obs.append(board_obs(board))
                pis.append(pi)
                zs.append(np.float32(value))
                optimal.append(opt)
            legal = sv.legal_columns(board)
            if rng.random() < epsilon:
                col = int(rng.choice(legal))
            else:
                best_cols = [c for c, v in vals.items() if v == best]
                col = int(rng.choice(best_cols))
            board, ended = sv.play_canonical(board, col)
            ply += 1
    return {
        "obs": np.stack(obs),
        "pi": np.stack(pis),
        "z": np.asarray(zs, np.float32),
        "optimal": np.stack(optimal),
    }


def run_distillation(
    train_set: dict,
    test_set: dict,
    model_cfg: Optional[ModelConfig] = None,
    steps: int = 3000,
    batch_size: int = 256,
    seed: int = 0,
    log_every: int = 500,
) -> dict:
    """Train on solver labels; return oracle accuracies of the raw policy."""
    model_cfg = model_cfg or ModelConfig(
        depth=3, filters=64, value_hidden=128, lr_values=(0.01, 0.001, 0.0001)
    )
    env = ConnectN(ConnectNConfig())
    net = PolicyValueNet(env.num_actions, model_cfg)
    state = init_train_state(net, model_cfg, jax.random.PRNGKey(seed),
                             env.obs_shape)
    train_step = jax.jit(make_train_step(net, model_cfg))

    @jax.jit
    def predict(params, batch_stats, obs):
        logits, value = net.apply(
            {"params": params, "batch_stats": batch_stats}, obs, train=False
        )
        return logits, value

    def evaluate(split: dict) -> dict:
        logits, value = jax.device_get(
            predict(state.params, state.batch_stats, jnp.asarray(split["obs"]))
        )
        legal = split["obs"][:, 0, :, 1] + split["obs"][:, 0, :, 2] == 0
        masked = np.where(legal, logits, -np.inf)
        choice = masked.argmax(-1)
        acc = split["optimal"][np.arange(len(choice)), choice].mean()
        # Value accuracy: tanh output binned into {-1, 0, +1} at +/- 1/3.
        pred_cat = np.where(value > 1 / 3, 1, np.where(value < -1 / 3, -1, 0))
        value_acc = (pred_cat == np.sign(split["z"])).mean()
        return {"move_accuracy": float(acc), "value_accuracy": float(value_acc)}

    rng = np.random.default_rng(seed)
    n = len(train_set["obs"])
    history = []
    for step in range(steps):
        idx = rng.choice(n, size=min(batch_size, n), replace=False)
        state, m = train_step(
            state,
            jnp.asarray(train_set["obs"][idx]),
            jnp.asarray(train_set["pi"][idx]),
            jnp.asarray(train_set["z"][idx]),
        )
        if (step + 1) % log_every == 0:
            ev = evaluate(test_set)
            history.append({"step": step + 1, "loss": float(m.loss), **ev})
            print(f"[distill {step + 1}] loss={float(m.loss):.3f} "
                  f"test-move-acc={ev['move_accuracy']:.3f} "
                  f"test-value-acc={ev['value_accuracy']:.3f}")
    return {
        "train": evaluate(train_set),
        "test": evaluate(test_set),
        "history": history,
        "state": state,
    }


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    n = int(args.get("--positions", 5000))
    steps = int(args.get("--steps", 3000))
    t0 = time.time()
    solver = sv.ConnectFourSolver()
    if "--strong_out" in args:
        # Strong-line labels (VERDICT r4 #2): dedup against any npz sets
        # passed via --exclude (comma-separated), then optionally merge
        # with an existing label set via --merge.
        exclude = set()
        for path in filter(None, args.get("--exclude", "").split(",")):
            prev = np.load(path)
            for b in _boards_from_obs(prev["obs"]):
                exclude.add(b.tobytes())
        data = strongline_dataset(
            n,
            seed=int(args.get("--seed", 2000)),
            epsilon=float(args.get("--epsilon", 0.15)),
            opening_plies=int(args.get("--opening_plies", 8)),
            max_ply=int(args.get("--max_ply", 34)),
            solver=solver,
            exclude=tuple(exclude),
        )
        if "--merge" in args:
            prev = np.load(args["--merge"])
            merged = {}
            for key in data:
                if key in prev:
                    merged[key] = np.concatenate([prev[key], data[key]])
                else:  # aux-value-only sets carry just obs/z
                    merged[key] = data[key]
            data = merged
        np.savez_compressed(args["--strong_out"], **data)
        print(
            f"Wrote {len(data['obs'])} labeled positions "
            f"({n} strong-line new) to {args['--strong_out']} in "
            f"{time.time() - t0:.0f}s"
        )
        return
    if "--labels_out" in args:
        # Write a labeled evaluation set (the eval_labels.npz generator;
        # consumed by tools/strength.labeled_policy_accuracy and
        # final_eval --labels). min_ply >= 10 keeps solves sub-second —
        # near-empty positions take minutes each without a deep book.
        data = labeled_dataset(
            n,
            seed=int(args.get("--seed", 1000)),
            min_ply=int(args.get("--min_ply", 10)),
            max_ply=int(args.get("--max_ply", 34)),
            solver=solver,
        )
        np.savez_compressed(args["--labels_out"], **data)
        print(
            f"Wrote {len(data['obs'])} labeled positions to "
            f"{args['--labels_out']} in {time.time() - t0:.0f}s"
        )
        return
    data = labeled_dataset(n + n // 5, seed=0, solver=solver)
    print(f"Labeled {len(data['obs'])} positions in {time.time() - t0:.0f}s")
    train_set = {k: v[:n] for k, v in data.items()}
    test_set = {k: v[n:] for k, v in data.items()}
    result = run_distillation(train_set, test_set, steps=steps)
    print(f"train: {result['train']}  test: {result['test']}")


if __name__ == "__main__":
    main()
