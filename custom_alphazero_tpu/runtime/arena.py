"""Vectorized arena evaluation (candidate vs incumbent).

Replaces the reference's 150 sequential head-to-head games
(/root/reference/custom_alphazero/evaluation/evaluate.py:29-134) with one
jitted lockstep batch. Semantics preserved:

- half the games are candidate-first, half incumbent-first; models alternate
  every ply (evaluate.py:39,60-62 — the reference alternates the starter by
  game index; here starters are assigned by contiguous halves so that at any
  ply every game in a half is acted by the SAME model, letting each model
  forward only its own half-batch: 1x total network cost per ply instead of
  evaluating both models on the full batch);
- raw-policy mode: each move is sampled (or argmax'd when deterministic) from
  the acting model's legal-masked renormalized policy (evaluate.py:41-52);
- MCTS mode: a fresh search per move with the acting model, greedy argmax
  after fullmove > greedy_from_move (strict >, evaluate.py:63-83 — note the
  off-by-one vs self-play's >=, preserved faithfully);
- score = wins / decisive games; an all-draw series scores 0.5; promotion at
  score >= 0.55 (evaluate.py:117-131, config.py:90).

The played action sequences are returned so the host can replay candidate
moves through the exact solver for oracle scoring (evaluate.py:53-59) without
a device->host hop per move.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from custom_alphazero_tpu.config import ArenaConfig, MCTSConfig
from custom_alphazero_tpu.envs.core import Env
from custom_alphazero_tpu.models.policy_value import masked_policy
from custom_alphazero_tpu.search.mcts import MCTS, EvaluateFn

CANDIDATE, INCUMBENT = 0, 1


class ArenaGameLog(NamedTuple):
    actions: jnp.ndarray  # (T, B) played action per ply
    movers: jnp.ndarray   # (T, B) 0 = candidate moved, 1 = incumbent
    active: jnp.ndarray   # (T, B) game still live at this ply


class ArenaResult(NamedTuple):
    score: jnp.ndarray            # scalar in [0, 1]
    promote: jnp.ndarray          # bool, score >= threshold (a draws-only
    #     series scores exactly 0.5, reference evaluate.py:127-129, and the
    #     default 0.55 gate filters it; a threshold <= 0.5 admits it, like
    #     the reference formula)
    wins: jnp.ndarray             # candidate wins
    losses: jnp.ndarray           # incumbent wins
    draws: jnp.ndarray
    per_game: jnp.ndarray         # (B,) +1 candidate win / -1 loss / 0 draw
    log: ArenaGameLog


def make_arena_fn(
    env: Env,
    arena_cfg: ArenaConfig,
    mcts_cfg: MCTSConfig,
    max_plies: int,
) -> Callable[[EvaluateFn, EvaluateFn, jnp.ndarray, int], ArenaResult]:
    """Build the arena; `evaluate_candidate` / `evaluate_incumbent` are
    batched (obs) -> (probs, value) closures. Callers jit the result."""

    mcts = MCTS(env, mcts_cfg)
    num_actions = env.num_actions

    def arena(
        evaluate_candidate: EvaluateFn,
        evaluate_incumbent: EvaluateFn,
        rng,
        num_games: int,
    ) -> ArenaResult:
        states = jax.vmap(lambda _: env.init())(jnp.arange(num_games))
        half = num_games // 2
        if num_games % 2 == 0:
            # Candidate starts the first half of games. At ply t the
            # candidate acts on half 0 when t is even, on half 1 when odd —
            # so each model's forward covers exactly one contiguous
            # half-batch (leaf batches align with the game batch in both
            # modes: search evaluates one leaf per game per wave).
            starters = (jnp.arange(num_games) >= half).astype(jnp.int32)
        else:
            starters = jnp.mod(jnp.arange(num_games), 2)  # 0: candidate first

        def ply_body(carry, t):
            states, rng = carry
            rng, k_search, k_sample = jax.random.split(rng, 3)
            active = ~jax.vmap(env.is_terminal)(states)
            movers = jnp.mod(starters + t, 2)  # (B,) acting model this ply
            obs = jax.vmap(env.observe)(states)
            legal = jax.vmap(env.legal_mask)(states)

            def half_evaluate(batch_obs):
                # swap: candidate acts on the second half this ply.
                swap = jnp.mod(t, 2) == 1
                a, b = batch_obs[:half], batch_obs[half:]
                pc, vc = evaluate_candidate(jnp.where(swap, b, a))
                pi_, vi_ = evaluate_incumbent(jnp.where(swap, a, b))
                probs = jnp.concatenate(
                    [jnp.where(swap, pi_, pc), jnp.where(swap, pc, pi_)]
                )
                value = jnp.concatenate(
                    [jnp.where(swap, vi_, vc), jnp.where(swap, vc, vi_)]
                )
                return probs, value

            def full_mixed_evaluate(batch_obs):
                # Odd game counts only: both models forward the full batch.
                pc, vc = evaluate_candidate(batch_obs)
                pi_, vi_ = evaluate_incumbent(batch_obs)
                sel = movers == CANDIDATE
                probs = jnp.where(sel[:, None], pc, pi_)
                value = jnp.where(sel, vc, vi_)
                return probs, value

            mixed_evaluate = (
                half_evaluate if num_games % 2 == 0 else full_mixed_evaluate
            )

            if arena_cfg.evaluate_with_mcts:
                tree = mcts.search(
                    states, mixed_evaluate, k_search, mcts_cfg.simulations
                )
                visits = mcts.root_child_visits(tree).astype(jnp.float32)
                total = jnp.maximum(visits.sum(-1, keepdims=True), 1.0)
                probs = visits / total
                fullmove = jax.vmap(lambda s: s.fullmove)(states)
                greedy = fullmove > mcts_cfg.greedy_from_move  # strict: evaluate.py:73
                one_hot = jax.nn.one_hot(jnp.argmax(visits, -1), num_actions)
                pi = jnp.where(greedy[:, None], one_hot, probs)
            else:
                probs, _ = mixed_evaluate(obs)
                pi = masked_policy(jnp.log(probs + 1e-30), legal)

            if arena_cfg.deterministic:
                actions = jnp.argmax(pi, axis=-1).astype(jnp.int32)
            else:
                keys = jax.random.split(k_sample, num_games)
                safe_pi = jnp.where(
                    pi.sum(-1, keepdims=True) > 0, pi,
                    jax.nn.one_hot(jnp.zeros(num_games, jnp.int32), num_actions),
                )
                actions = jax.vmap(
                    lambda k, p: jax.random.categorical(k, jnp.log(p + 1e-30))
                )(keys, safe_pi).astype(jnp.int32)

            next_states, _ = jax.vmap(env.step)(states, actions)
            return (next_states, rng), (actions, movers, active)

        (final_states, _), (actions_seq, movers_seq, active_seq) = jax.lax.scan(
            ply_body, (states, rng), jnp.arange(max_plies)
        )

        lengths = active_seq.sum(axis=0)  # (B,)
        # terminal_value < 0 <=> the last mover won; unterminated games
        # (possible only if max_plies truncates) count as draws.
        won = jax.vmap(env.terminal_value)(final_states) < 0
        last_mover = jnp.mod(starters + lengths - 1, 2)
        per_game = jnp.where(
            won, jnp.where(last_mover == CANDIDATE, 1, -1), 0
        ).astype(jnp.int32)

        wins = jnp.sum(per_game == 1)
        losses = jnp.sum(per_game == -1)
        draws = jnp.sum(per_game == 0)
        decisive = wins + losses
        score = jnp.where(
            decisive > 0,
            wins.astype(jnp.float32) / jnp.maximum(decisive, 1).astype(jnp.float32),
            0.5,
        ).astype(jnp.float32)
        # Draw-heavy gate (ArenaConfig.min_decisives): a series with too
        # few decisive games is inconclusive — wins/decisives over 2
        # games carries no evidence — and promote_when_inconclusive
        # decides it instead of the threshold. min_decisives = 0 is the
        # reference gate exactly (evaluate.py:106-131).
        conclusive = decisive >= arena_cfg.min_decisives
        promote = jnp.where(
            conclusive,
            score >= arena_cfg.promote_threshold,
            bool(arena_cfg.promote_when_inconclusive),
        )
        return ArenaResult(
            score=score,
            promote=promote,
            wins=wins,
            losses=losses,
            draws=draws,
            per_game=per_game,
            log=ArenaGameLog(actions=actions_seq, movers=movers_seq,
                             active=active_seq),
        )

    return arena
