"""Mate-in-1 tactics set: generation, labeling, and model evaluation.

Chess has no exact-solver oracle (the reference's Connect-4 solver has no
chess counterpart), so objective — non-arena-relative — strength evidence
comes from engine-labeled tactics: the engine's own legal/terminal logic
labels mate-in-1 exactly (reference's game-generic pipeline has no such
eval at all; self_play.py:24-34 only ever reports arena scores).

Generation: random self-play positions are screened by stepping EVERY
legal move of every position in one batched ``vmap(env.step)`` call;
a position enters the set when at least one legal move ends the game as
a win for the mover (checkmate — stalemates end as draws). Labels are the
full set of mating actions.

Metrics (higher = stronger, random-legal baseline ~ 1/num_legal):
- raw_policy: argmax over legal of the net's policy is a mating move;
- mcts: argmax-visit move of a search is a mating move (search should
  solve these at any reasonable simulation budget — a weak net shows up
  as raw_policy << mcts).

Run:
  python -m custom_alphazero_tpu.tools.chess_tactics --generate=tactics.npz \
      [--positions=500] [--seed=0]
  python -m custom_alphazero_tpu.tools.chess_tactics --labels=tactics.npz \
      --run_id=chess-r3 [--which=best] [--sims=64] [--mcts=true]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.config import ChessConfig, MCTSConfig
from custom_alphazero_tpu.envs.chess.engine import Chess
from custom_alphazero_tpu.search.mcts import MCTS


def generate_tactics(
    path: str,
    positions: int = 500,
    seed: int = 0,
    batch: int = 256,
    max_plies: int = 160,
) -> dict:
    """Random-play screening for mate-in-1 positions; writes ``path``.

    Saved arrays: board/castling/ep_file/halfmove/fullmove (enough for
    ``Chess.state_from_arrays`` — mate-in-1 is history-independent), the
    (P, A) legal mask and the (P, A) mate-action mask."""
    env = Chess(ChessConfig())
    rng = jax.random.PRNGKey(seed)

    init = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    legal_fn = jax.jit(jax.vmap(env.legal_mask))
    step_fn = jax.jit(jax.vmap(env.step))

    @jax.jit
    def random_step(state, key):
        legal = jax.vmap(env.legal_mask)(state)
        logits = jnp.where(legal, 0.0, -1e9)
        action = jax.random.categorical(key, logits, axis=-1)
        nxt, _ = jax.vmap(env.step)(state, action.astype(jnp.int32))
        keep = state.terminal
        return jax.tree.map(
            lambda c, n: jnp.where(
                keep.reshape((-1,) + (1,) * (n.ndim - 1)), c, n
            ),
            state, nxt,
        )

    found = {k: [] for k in
             ("board", "castling", "ep_file", "halfmove", "fullmove")}
    mate_masks, legal_masks = [], []
    state = init
    total = 0
    for ply in range(max_plies):
        rng, k = jax.random.split(rng)
        state = random_step(state, k)
        active = ~np.asarray(state.terminal)
        if not active.any():
            state = init
            continue
        # Screen the batch: step every legal action of every active game.
        legal = np.asarray(legal_fn(state))  # (B, A)
        host = jax.device_get(state)
        pairs_state, pairs_action, owners = [], [], []
        for g in np.nonzero(active)[0]:
            acts = np.nonzero(legal[g])[0]
            for a in acts:
                pairs_state.append(g)
                pairs_action.append(a)
                owners.append(g)
        if not pairs_action:
            continue
        idx = jnp.asarray(np.asarray(pairs_state))
        sub = jax.tree.map(lambda l: jnp.asarray(np.asarray(l)[idx]), host)
        child, _ = step_fn(sub, jnp.asarray(pairs_action, jnp.int32))
        mate = np.asarray(child.terminal & child.won)
        owners = np.asarray(owners)
        actions = np.asarray(pairs_action)
        for g in np.unique(owners[mate]):
            mask = np.zeros((env.num_actions,), bool)
            mask[actions[(owners == g) & mate]] = True
            for key in found:
                found[key].append(np.asarray(getattr(host, key))[g])
            mate_masks.append(mask)
            legal_masks.append(legal[g])
            total += 1
        if total >= positions:
            break
    arrays = {k: np.stack(v) for k, v in found.items()}
    arrays["mate_mask"] = np.stack(mate_masks)
    arrays["legal_mask"] = np.stack(legal_masks)
    np.savez_compressed(path, **arrays)
    print(f"tactics: {total} mate-in-1 positions -> {path} "
          f"(mean mating moves "
          f"{arrays['mate_mask'].sum(1).mean():.2f}, "
          f"mean legal {arrays['legal_mask'].sum(1).mean():.1f})")
    return {"positions": total, "path": path}


def generate_mate_in_2(
    path: str,
    positions: int = 200,
    seed: int = 0,
    batch: int = 128,
    max_plies: int = 160,
) -> dict:
    """Engine-labeled forced mate-in-2 set (VERDICT r3 weak #7: mate-in-1
    was the only absolute chess metric; a 2-ply-lookahead set separates
    one-move pattern matching from real calculation).

    A position enters the set when the mover has NO mate-in-1 but at
    least one CHECKING move m such that every opponent reply leaves the
    mover a mate-in-1 (a reply that ends the game itself — draw or
    cross-mate — refutes m). Labels are all such m. Restricting first
    moves to checks keeps the exact 3-ply expansion tractable (replies
    while in check are few); quiet mate-in-2s (all-replies-fail without
    check, rare in random positions) are deliberately out of scope —
    the metric's random baseline is computed from the same labels, so
    scoring stays consistent. Labeling is exact search over ``env.step``:
    the engine's own rules are the oracle, same contract as mate-in-1.

    Saved arrays: the state_from_arrays fields + (P, A) legal_mask and
    mate2_mask."""
    env = Chess(ChessConfig())
    rng = jax.random.PRNGKey(seed)
    CHUNK = 512

    init = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    step_fn = jax.jit(jax.vmap(env.step))

    @jax.jit
    def random_step(state, key):
        legal = state.legal
        logits = jnp.where(legal, 0.0, -1e9)
        action = jax.random.categorical(key, logits, axis=-1)
        nxt, _ = jax.vmap(env.step)(state, action.astype(jnp.int32))
        # Finished slots restart from the opening so the whole batch keeps
        # producing candidate positions (mate-in-2s cluster in endgames;
        # without the reset the active count decays over the rollout).
        done = nxt.terminal
        return jax.tree.map(
            lambda f, n: jnp.where(
                done.reshape((-1,) + (1,) * (n.ndim - 1)), f, n
            ),
            init, nxt,
        )

    def expand_pairs(host_states, owner_idx, actions):
        """Step host_states[owner_idx[i]] with actions[i], chunked at a
        fixed CHUNK width (one jit shape): returns the children as a host
        pytree of stacked rows."""
        n = len(actions)
        outs = []
        arrs = jax.tree.map(np.asarray, host_states)
        for i0 in range(0, n, CHUNK):
            idx = np.asarray(owner_idx[i0:i0 + CHUNK], np.int32)
            act = np.asarray(actions[i0:i0 + CHUNK], np.int32)
            m = len(idx)
            if m < CHUNK:  # pad by repeating row 0 (masked off below)
                idx = np.concatenate([idx, np.full(CHUNK - m, idx[0],
                                                   np.int32)])
                act = np.concatenate([act, np.full(CHUNK - m, act[0],
                                                   np.int32)])
            sub = jax.tree.map(lambda l: jnp.asarray(l[idx]), arrs)
            child, _ = step_fn(sub, jnp.asarray(act))
            outs.append(jax.tree.map(
                lambda x: np.asarray(x)[:m], jax.device_get(child)
            ))
        return jax.tree.map(lambda *xs: np.concatenate(xs), *outs)

    found = {k: [] for k in
             ("board", "castling", "ep_file", "halfmove", "fullmove")}
    mate2_masks, legal_masks = [], []
    state = init
    total = 0
    for ply in range(max_plies):
        if total >= positions:
            break
        if ply % 10 == 0:
            print(f"tactics2: ply {ply}, {total}/{positions} found",
                  flush=True)
        rng, k = jax.random.split(rng)
        state = random_step(state, k)
        host = jax.device_get(state)
        active = ~np.asarray(host.terminal)
        if not active.any():
            state = init
            continue
        legal = np.asarray(host.legal)

        # L1: every legal move of every active game, one batched sweep.
        own1, act1 = [], []
        for g in np.nonzero(active)[0]:
            for a in np.nonzero(legal[g])[0]:
                own1.append(g)
                act1.append(a)
        if not act1:
            continue
        l1 = expand_pairs(host, own1, act1)
        own1 = np.asarray(own1)
        act1 = np.asarray(act1)
        l1_mate = np.asarray(l1.terminal) & np.asarray(l1.won)
        has_mate1 = set(own1[l1_mate].tolist())
        # Candidate first moves: checking, game not over, position has no
        # mate-in-1.
        cand = (~np.asarray(l1.terminal)) & np.asarray(l1.in_check) \
            & ~np.isin(own1, list(has_mate1))
        cidx = np.nonzero(cand)[0]
        if len(cidx) == 0:
            continue

        # L2: all replies of every candidate child.
        l1_legal = np.asarray(l1.legal)
        own2, act2 = [], []   # own2 indexes into cidx rows
        for ci, li in enumerate(cidx):
            for r in np.nonzero(l1_legal[li])[0]:
                own2.append(ci)
                act2.append(r)
        l1_sub = jax.tree.map(lambda x: np.asarray(x)[cidx], l1)
        l2 = expand_pairs(l1_sub, own2, act2)
        own2 = np.asarray(own2)
        l2_term = np.asarray(l2.terminal)
        # Any game-ending reply refutes its candidate move.
        refuted = set(own2[l2_term].tolist())

        # L3: for each surviving grandchild, does the mover have a
        # mate-in-1? One batched sweep over every legal move.
        keep2 = ~l2_term & ~np.isin(own2, list(refuted))
        kidx = np.nonzero(keep2)[0]
        mate1_ok = np.zeros(len(own2), bool)
        if len(kidx):
            l2_legal = np.asarray(l2.legal)
            own3, act3 = [], []
            for ki in kidx:
                for a in np.nonzero(l2_legal[ki])[0]:
                    own3.append(ki)
                    act3.append(a)
            l3 = expand_pairs(l2, own3, act3)
            own3 = np.asarray(own3)
            l3_mate = np.asarray(l3.terminal) & np.asarray(l3.won)
            mate1_ok[np.unique(own3[l3_mate])] = True

        # A candidate survives when every reply leaves a mate-in-1.
        per_pos = {}
        for ci in range(len(cidx)):
            rows = np.nonzero(own2 == ci)[0]
            if len(rows) and mate1_ok[rows].all():
                g = int(own1[cidx[ci]])
                per_pos.setdefault(g, []).append(int(act1[cidx[ci]]))
        for g, moves in per_pos.items():
            mask = np.zeros((env.num_actions,), bool)
            mask[moves] = True
            for key in found:
                found[key].append(np.asarray(getattr(host, key))[g])
            mate2_masks.append(mask)
            legal_masks.append(legal[g])
            total += 1
            if total >= positions:
                break
    arrays = {k: np.stack(v) for k, v in found.items()}
    arrays["mate2_mask"] = np.stack(mate2_masks)
    arrays["legal_mask"] = np.stack(legal_masks)
    np.savez_compressed(path, **arrays)
    print(f"tactics2: {total} mate-in-2 positions -> {path} "
          f"(mean mating moves {arrays['mate2_mask'].sum(1).mean():.2f}, "
          f"mean legal {arrays['legal_mask'].sum(1).mean():.1f})",
          flush=True)
    return {"positions": total, "path": path}


def states_from_npz(env: Chess, data):
    """BATCHED state construction: one jitted vmap over every row.

    The per-row path (one state_from_arrays call per position, each
    dispatching a full 1968-action legality pass through the device
    tunnel at ~0.3-0.5 s of latency) made the eval tools tens of minutes
    slow at round-5 set sizes; one vmapped build is a single compile +
    one dispatch. Returns a batched state pytree (leading axis = rows)."""

    @jax.jit
    def build(board, castling, ep, hm, fm):
        return jax.vmap(env.state_from_arrays)(board, castling, ep, hm, fm)

    return build(
        jnp.asarray(np.asarray(data["board"]), jnp.int8),
        jnp.asarray(np.asarray(data["castling"]).astype(bool)),
        jnp.asarray(np.asarray(data["ep_file"]), jnp.int32),
        jnp.asarray(np.asarray(data["halfmove"]), jnp.int32),
        jnp.asarray(np.asarray(data["fullmove"]), jnp.int32),
    )


def slice_states(states, i0, i1):
    """Slice a batched state pytree along the leading axis."""
    return jax.tree.map(lambda x: x[i0:i1], states)


def evaluate_tactics(
    evaluate_fn,
    labels_npz: str,
    use_mcts: bool = False,
    sims: int = 64,
    batch: int = 64,
) -> dict:
    """Fraction of tactics positions whose chosen move mates."""
    env = Chess(ChessConfig())
    data = np.load(labels_npz)
    states = states_from_npz(env, data)
    # mate-in-1 sets store mate_mask; mate-in-2 sets store mate2_mask
    # (generate_mate_in_2) — scoring is identical: the chosen move must
    # be a labeled mating/forced-mating move.
    key = "mate_mask" if "mate_mask" in data else "mate2_mask"
    mate_mask = data[key]
    legal_mask = data["legal_mask"]
    hits, rand_base = [], []
    if use_mcts:
        mcts = MCTS(env, MCTSConfig(simulations=sims))
        search = jax.jit(lambda s, k: mcts.root_child_visits(
            mcts.search(s, evaluate_fn, k, sims)))
        n_rows = len(data["board"])
        for i0 in range(0, n_rows, batch):
            stacked = slice_states(states, i0, min(i0 + batch, n_rows))
            visits = np.asarray(
                search(stacked, jax.random.PRNGKey(i0))
            )
            act = visits.argmax(axis=-1)
            for j, a in enumerate(act):
                hits.append(bool(mate_mask[i0 + j, a]))
    else:
        obs_fn = jax.jit(jax.vmap(env.observe))
        fwd = jax.jit(lambda o: evaluate_fn(o)[0])
        n_rows = len(data["board"])
        for i0 in range(0, n_rows, batch):
            stacked = slice_states(states, i0, min(i0 + batch, n_rows))
            probs = np.asarray(fwd(obs_fn(stacked)))
            probs = np.where(legal_mask[i0:i0 + len(probs)], probs, -1.0)
            act = probs.argmax(axis=-1)
            for j, a in enumerate(act):
                hits.append(bool(mate_mask[i0 + j, a]))
    for i in range(len(data["board"])):
        rand_base.append(mate_mask[i].sum() / max(legal_mask[i].sum(), 1))
    return {
        "accuracy": float(np.mean(hits)),
        "positions": len(hits),
        "random_baseline": float(np.mean(rand_base)),
        "mode": "mcts" if use_mcts else "raw_policy",
        "sims": sims if use_mcts else None,
    }


def main(argv=None):
    from custom_alphazero_tpu.tools.cli import parse_kv_args

    args = parse_kv_args(argv or sys.argv[1:], __doc__)
    if "--export_labels" in args:
        # Convert tactics sets (--labels=a.npz,b.npz) into the aux-label
        # format the training loop consumes (loop.solver_labels_path:
        # obs/pi/z): pi = uniform over the labeled mating moves, z = +1
        # (the side to move mates / forces mate — the exact value).
        import jax.numpy as jnp

        env = Chess(ChessConfig())
        obs_fn = jax.jit(jax.vmap(env.observe))
        obs_all, pi_all, z_all = [], [], []
        for src in args["--labels"].split(","):
            data = np.load(src)
            states = states_from_npz(env, data)
            key = "mate_mask" if "mate_mask" in data else "mate2_mask"
            mm = data[key].astype(np.float32)
            pi = mm / np.maximum(mm.sum(-1, keepdims=True), 1e-9)
            n_rows = len(data["board"])
            for i0 in range(0, n_rows, 64):
                stacked = slice_states(states, i0, min(i0 + 64, n_rows))
                obs_all.append(np.asarray(obs_fn(stacked)))
            pi_all.append(pi)
            z_all.append(np.ones(n_rows, np.float32))
        out = args["--export_labels"]
        np.savez_compressed(
            out,
            obs=np.concatenate(obs_all).astype(np.float32),
            pi=np.concatenate(pi_all),
            z=np.concatenate(z_all),
        )
        print(f"Wrote {sum(len(z) for z in z_all)} tactic labels to {out}")
        return
    if "--generate" in args:
        return generate_tactics(
            args["--generate"],
            positions=int(args.get("--positions", 500)),
            seed=int(args.get("--seed", 0)),
        )
    if "--generate2" in args:
        return generate_mate_in_2(
            args["--generate2"],
            positions=int(args.get("--positions", 200)),
            seed=int(args.get("--seed", 0)),
        )
    if args.get("--uniform", "false").lower() == "true":
        # Uniform-evaluator control (VERDICT r4 weak #5): separates "the
        # net is bad" from "the simulation budget is structurally
        # insufficient" — the round-3 mate-in-1 control methodology,
        # now available for any labels set / budget.
        import jax.numpy as jnp

        env = Chess(ChessConfig())
        a = env.num_actions

        def evaluate_fn(obs):
            b = obs.shape[0]
            return (jnp.full((b, a), 1.0 / a, jnp.float32),
                    jnp.zeros((b,), jnp.float32))

        meta = {"steps": None}
        run_id = "uniform"
    else:
        from custom_alphazero_tpu.tools.strength import load_run_model

        env, evaluate_fn, cfg, meta = load_run_model(
            args["--run_id"], args.get("--results_dir", "results"),
            args.get("--which", "best"), game="chess",
        )
        run_id = args["--run_id"]
    report = evaluate_tactics(
        evaluate_fn,
        args["--labels"],
        use_mcts=args.get("--mcts", "false").lower() == "true",
        sims=int(args.get("--sims", 64)),
    )
    report.update(run_id=run_id, steps=meta.get("steps"))
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
