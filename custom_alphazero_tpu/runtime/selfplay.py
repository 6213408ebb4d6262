"""Fully-jitted lockstep self-play generation.

Replaces the reference's one-game-per-CPU-process joblib fan-out
(/root/reference/custom_alphazero/self_play.py:37-119) with a single jitted
program stepping a batch of games in lockstep on device: per ply, one batched
MCTS (itself batching leaf evaluation into one network forward per simulation
wave), a move sampled per game, and sample recording under a liveness mask.

Sample semantics reproduce the reference exactly:

- pi = root child visits normalized; from fullmove >= greedy_from_move the
  played distribution (and the stored policy target) is a one-hot argmax
  (self_play.py:62, mcts.py:188-197, config.py:55).
- The recorded state is the canonical observation *before* the move
  (parent_state, mcts.py:204).
- Game outcome z: with result r for the last mover (+1 win / 0 draw) and
  distance d = L-1-t from the end, z_t = r * (-1)^d * discount^d
  (self_play.py:69-78: repeat, flip odd-from-end signs, geometric discount).
- Draw games can be excluded from the sample set (self_play.py:155-162).

Two throughput options on top (both default-off, semantics per segment
unchanged): ``mcts.reuse_tree`` carries each game's search tree across
moves like the reference (mcts.py:207), and ``self_play.continuous``
auto-resets finished slots so no search wave is wasted on absorbed games
(the trailing incomplete game per slot is dropped; tests/test_continuous.py
proves first-game sample equality with the plain mode under a shared seed).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from custom_alphazero_tpu.config import MCTSConfig, SelfPlayConfig
from custom_alphazero_tpu.envs.core import Env
from custom_alphazero_tpu.search.mcts import MCTS, EvaluateFn


class SelfPlayBatch(NamedTuple):
    """Flattened (T*B) sample arrays + validity mask.

    ``obs`` is the raw (T*B, H, W, C) observation tensor, or — when the
    generation was built with an ``obs_codec`` — the codec's packed pytree
    (replay/codec.py PackedObs, bit-packed in-scan). Packing inside the
    generation matters at chess scale: the raw per-ply sample buffer is
    T*B x 30 KB of f32 118-plane observations (~4 GB at 256 games x 512
    plies, enough to OOM the chip with transients — the round-3 worker
    crash at batch >= 128), while the packed buffer is ~30x smaller."""

    obs: Any              # (T*B, H, W, C) array, or PackedObs pytree
    policy: jnp.ndarray   # (T*B, A)
    value: jnp.ndarray    # (T*B,)
    valid: jnp.ndarray    # (T*B,) bool — live ply, non-excluded game


class SelfPlayStats(NamedTuple):
    games: jnp.ndarray          # scalar
    plies: jnp.ndarray          # scalar — total live plies (== simulations run / sims-per-move)
    wins_first_mover: jnp.ndarray
    wins_second_mover: jnp.ndarray
    draws: jnp.ndarray
    mean_game_length: jnp.ndarray


def make_selfplay_fn(
    env: Env,
    mcts_cfg: MCTSConfig,
    sp_cfg: SelfPlayConfig,
    max_plies: int,
    fused: bool = None,
    obs_codec=None,
) -> Callable[[EvaluateFn, jnp.ndarray, int], Tuple[SelfPlayBatch, SelfPlayStats]]:
    """Build the generation function; callers jit the returned closure
    (typically wrapped so `evaluate_fn` closes over dynamic params).

    fused: use the Pallas fused search kernel (ops/fused_mcts.py) for the
    per-ply MCTS — bit-identical root statistics, tree state kept in VMEM.
    Default (None): auto — on TPU, whenever the env/config supports it
    (elsewhere the kernel would run interpreted, slower than the XLA path).

    obs_codec: a replay/codec.py BitplaneCodec; when given, observations
    are bit-packed INSIDE the generation scan and SelfPlayBatch.obs is the
    packed pytree (see SelfPlayBatch docstring for why)."""

    from custom_alphazero_tpu.ops import fused_mcts, fused_mcts_v2

    reuse = mcts_cfg.reuse_tree
    gumbel = mcts_cfg.use_gumbel
    if fused is None:
        fused = (
            not reuse
            and not gumbel
            and fused_mcts.supports(env, mcts_cfg)
            and jax.default_backend() == "tpu"
        )
    assert not (fused and reuse), "fused search builds fresh trees per move"
    assert not (gumbel and (reuse or fused)), (
        "gumbel search uses fresh trees (no reuse, no fused kernel)"
    )
    if gumbel:
        from custom_alphazero_tpu.search.gumbel import GumbelMCTS

        gumbel_search = GumbelMCTS(env, mcts_cfg)
    fused_search = (
        fused_mcts_v2.FusedConnectNSearchV2(env, mcts_cfg) if fused else None
    )
    mcts = MCTS(env, mcts_cfg)
    if reuse and mcts_cfg.topk_actions != -1:
        # Reuse trees are full-width. If this config would otherwise have
        # compressed priors (explicit top-K, or auto mode on a large action
        # space), refuse loudly rather than silently allocating ~30x the
        # expected memory; require topk_actions=-1 as the acknowledgement.
        if mcts.prior_width(mcts_cfg.simulations) < env.num_actions:
            raise ValueError(
                "mcts.reuse_tree uses full-width priors but this config "
                "would compress (topk/auto on a large action space); set "
                "mcts.topk_actions=-1 to acknowledge the memory cost"
            )
    num_actions = env.num_actions
    # Subtree reuse (reference mcts.py:207): capacity for carried + fresh
    # nodes; the kept subtree is truncated to keep_cap so a search's new
    # nodes always fit.
    tree_capacity = max(mcts_cfg.max_nodes, 2 * mcts_cfg.simulations)
    keep_cap = tree_capacity - mcts_cfg.simulations

    def generate(evaluate_fn: EvaluateFn, rng, batch_size: int):
        init_states = jax.vmap(lambda _: env.init())(jnp.arange(batch_size))
        fresh_states = init_states
        if reuse:
            init_tree = jax.vmap(
                lambda s: mcts.init_tree(s, tree_capacity)
            )(init_states)
            init_free = jnp.ones((batch_size,), jnp.int32)
        else:
            # Fresh-tree paths ignore the carried tree; keep the carry tiny.
            init_tree = jnp.zeros((batch_size,), jnp.int32)
            init_free = jnp.zeros((batch_size,), jnp.int32)
        fresh_tree = init_tree

        def ply_body(carry, _):
            states, tree, free, rng = carry
            rng, k_search, k_sample = jax.random.split(rng, 3)
            active = ~jax.vmap(env.is_terminal)(states)
            obs = jax.vmap(env.observe)(states)
            rec_obs = obs_codec.encode(obs) if obs_codec is not None else obs

            mv = jax.vmap(lambda s: s.fullmove)(states)
            if gumbel:
                # Gumbel mode: play the sequential-halving winner, train on
                # the improved policy (exploration = the Gumbel draw).
                _, actions, pi = gumbel_search.search_select(
                    states, evaluate_fn, k_search, mcts_cfg.simulations
                )
            else:
                if fused_search is not None:
                    root_visits, _ = fused_search.search_root_stats(
                        states, evaluate_fn, k_search, mcts_cfg.simulations
                    )
                elif reuse:
                    tree, free = mcts.search_tree(
                        tree, free, evaluate_fn, k_search,
                        mcts_cfg.simulations,
                    )
                    root_visits = mcts.root_child_visits(tree)
                else:
                    searched = mcts.search(
                        states, evaluate_fn, k_search, mcts_cfg.simulations
                    )
                    root_visits = mcts.root_child_visits(searched)
                visits = root_visits.astype(jnp.float32)  # (B, A)
                visit_sum = jnp.maximum(
                    visits.sum(axis=-1, keepdims=True), 1.0
                )
                probs = visits / visit_sum
                greedy = mv >= mcts_cfg.greedy_from_move
                one_hot = jax.nn.one_hot(
                    jnp.argmax(visits, axis=-1), num_actions
                )
                pi = jnp.where(greedy[:, None], one_hot, probs)

                # Sample ∝ pi (greedy rows are one-hot: sampling == argmax).
                keys = jax.random.split(k_sample, batch_size)
                safe_pi = jnp.where(
                    pi.sum(axis=-1, keepdims=True) > 0, pi,
                    jax.nn.one_hot(
                        jnp.zeros(batch_size, jnp.int32), num_actions
                    ),
                )
                actions = jax.vmap(
                    lambda k, p: jax.random.categorical(k, jnp.log(p + 1e-30))
                )(keys, safe_pi)

            next_states, rewards = jax.vmap(env.step)(states, actions)
            if reuse:
                tree, free = mcts.advance_root(
                    tree, actions, keep_cap, next_states
                )
            done = active & jax.vmap(env.is_terminal)(next_states)
            if sp_cfg.continuous:
                # Auto-reset finished slots (and their carried trees).
                blend = lambda f, n: jnp.where(
                    done.reshape((-1,) + (1,) * (n.ndim - 1)), f, n
                )
                next_states = jax.tree.map(blend, fresh_states, next_states)
                if reuse:
                    tree = jax.tree.map(blend, fresh_tree, tree)
                    free = jnp.where(done, 1, free)
            return (
                (next_states, tree, free, rng),
                (rec_obs, pi, active, rewards, done, mv),
            )

        (final_states, _, _, _), (
            obs_seq, pi_seq, active_seq, reward_seq, done_seq, mv_seq
        ) = jax.lax.scan(
            ply_body, (init_states, init_tree, init_free, rng),
            length=max_plies,
        )

        if sp_cfg.continuous:
            # Per-segment assembly, back to front: at a segment's final ply
            # z = r (the mover's result); before it z_t = -discount *
            # z_{t+1} — exactly the reference's repeat/sign-flip/discount
            # construction (self_play.py:69-78) applied per segment. The
            # trailing incomplete game of each slot never meets a done ply,
            # so it stays invalid.
            def back(carry, xs):
                z_next, valid_next, res_next = carry
                r, done = xs
                z = jnp.where(done, r, -sp_cfg.discount * z_next)
                res = jnp.where(done, r, res_next)
                valid = done | valid_next
                return (z, valid, res), (z, valid, res)

            zeros = jnp.zeros((batch_size,), jnp.float32)
            _, (z, valid, res_seq) = jax.lax.scan(
                back,
                (zeros, jnp.zeros((batch_size,), bool), zeros),
                (reward_seq, done_seq),
                reverse=True,
            )
            if sp_cfg.exclude_draws:
                valid = valid & (res_seq != 0)
            games = done_seq.sum()
            won_seg = done_seq & (reward_seq > 0)
            seg_len = jnp.where(done_seq, mv_seq + 1, 0)
            odd_len = done_seq & (jnp.mod(seg_len, 2) == 1)
            stats = SelfPlayStats(
                games=games.astype(jnp.int32),
                plies=active_seq.sum(),
                wins_first_mover=jnp.sum(won_seg & odd_len),
                wins_second_mover=jnp.sum(won_seg & ~odd_len),
                draws=jnp.sum(done_seq & ~won_seg),
                mean_game_length=seg_len.sum()
                / jnp.maximum(games, 1).astype(jnp.float32),
            )
        else:
            # active_seq: (T, B); games absorb, so active is a prefix mask.
            lengths = active_seq.sum(axis=0)                  # (B,)
            # Only a winning final move yields a nonzero reward; draws sum
            # to 0.
            results = reward_seq.sum(axis=0)                  # (B,) in {0, 1}

            t_idx = jnp.arange(max_plies, dtype=jnp.int32)[:, None]  # (T, 1)
            dist_from_end = (lengths[None, :] - 1 - t_idx).astype(jnp.float32)
            sign = jnp.where(jnp.mod(dist_from_end, 2.0) == 0.0, 1.0, -1.0)
            z = results[None, :] * sign * sp_cfg.discount ** jnp.maximum(
                dist_from_end, 0.0
            )

            valid = active_seq
            if sp_cfg.exclude_draws:
                valid = valid & (results[None, :] != 0)

            # First mover wins games of odd length (moves 0, 2, ...).
            won = results != 0
            odd_len = jnp.mod(lengths, 2) == 1
            stats = SelfPlayStats(
                games=jnp.int32(batch_size),
                plies=active_seq.sum(),
                wins_first_mover=jnp.sum(won & odd_len),
                wins_second_mover=jnp.sum(won & ~odd_len),
                draws=jnp.sum(~won),
                mean_game_length=lengths.astype(jnp.float32).mean(),
            )

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = SelfPlayBatch(
            obs=jax.tree.map(flat, obs_seq),
            policy=flat(pi_seq),
            value=flat(z).astype(jnp.float32),
            valid=flat(valid),
        )
        return batch, stats

    return generate
