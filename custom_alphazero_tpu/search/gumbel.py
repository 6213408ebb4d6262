"""Gumbel root search: sequential halving + completed-Q selection.

A beyond-the-reference search mode (the reference only has PUCT,
mcts/mcts.py:39-85) implementing the Gumbel MuZero planning procedure
(Danihelka et al., "Policy improvement by planning with Gumbel", ICLR'22;
cf. PAPERS.md "Accelerating Monte-Carlo Tree Search with Optimized
Posterior Policies") on the same array tree:

- ROOT: sample one Gumbel g(a) per action; the top-``m`` actions by
  g + logits are the candidate set (Gumbel-top-k = sampling without
  replacement). Simulations follow a *static* sequential-halving
  schedule — phases of round-robin visits, after each phase the worse
  half of the candidates (by g + logits + sigma(q)) is eliminated —
  which is exactly what a lockstep TPU batch wants: the root action of
  wave ``i`` is a compile-time slot index, no per-game control flow.
- NON-ROOT: deterministic action selection
  ``argmax_a pi'(a) - N(a) / (1 + sum N)`` with
  ``pi' = softmax(logits + sigma(completedQ))``, where completedQ
  completes unvisited actions with the mixed value estimate.
- OUTPUT: the played action is the final surviving candidate, and the
  policy *target* is the improved policy pi' at the root over the full
  action space — a better training signal than visit counts at small
  simulation budgets.

sigma(q) = (c_visit + max_a N(a)) * c_scale * q (paper defaults 50, 1).

Search runs on fresh full-width trees (no Dirichlet noise — the Gumbel
noise is the exploration; no subtree reuse). Tree layout, expansion and
backup are exactly search/mcts.py's; only the selection rules differ.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.search.mcts import (
    MCTS,
    UNVISITED,
    _NEW,
    _onehot,
    EvaluateFn,
)

NEG_INF = jnp.finfo(jnp.float32).min


def halving_schedule(m: int, sims: int) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """Static sequential-halving plan for ``sims`` root visits over ``m``
    candidates: per-wave (candidate_slot, halve_after, alive_count).

    Phases r = 0..R-1 (R = ceil(log2 m)) visit the alive candidates
    round-robin; non-final phases give each candidate
    max(floor(sims / (R * alive)), 1) visits, the final phase (alive == 2,
    or the budget's tail) spreads everything remaining.
    """
    assert m >= 1
    slots, halves, alives = [], [], []
    alive = m
    r_total = max(math.ceil(math.log2(m)), 1)
    r = 0
    while len(slots) < sims:
        last = alive <= 2 or r >= r_total - 1
        remaining = sims - len(slots)
        per = remaining // alive if last else max(
            sims // (r_total * alive), 1
        )
        per = max(min(per, remaining // alive), 1) if remaining >= alive else 1
        for _ in range(per):
            for slot in range(alive):
                if len(slots) >= sims:
                    break
                slots.append(slot)
                halves.append(False)
                alives.append(alive)
        if len(slots) >= sims:
            break
        if alive > 1:
            halves[-1] = True
            alive = max(alive // 2, 1)
        r += 1
    return (
        np.asarray(slots, np.int32),
        np.asarray(halves, np.bool_),
        np.asarray(alives, np.int32),
    )


class GumbelMCTS(MCTS):
    """Batched Gumbel sequential-halving search over an :class:`Env`.

    Config knobs come from MCTSConfig: ``simulations``,
    ``gumbel_max_considered`` (m), ``gumbel_c_visit``, ``gumbel_c_scale``.
    """

    # -- pieces --------------------------------------------------------------

    def _sigma(self, q, max_visits):
        cfg = self.cfg
        return (
            (cfg.gumbel_c_visit + max_visits) * cfg.gumbel_c_scale * q
        )

    def _completed_q(self, prior, nv, w, v_node):
        """completedQ (..., A): q(a) = W/N where visited, else the mixed
        value (v + sum(N) * weighted-visited-q) / (1 + sum(N))."""
        nv_f = nv.astype(jnp.float32)
        visited = nv_f > 0
        q = jnp.where(visited, w / jnp.maximum(nv_f, 1.0), 0.0)
        n_total = jnp.sum(nv_f, axis=-1)
        pi_vis = jnp.where(visited, prior, 0.0)
        pi_vis_sum = jnp.sum(pi_vis, axis=-1)
        q_weighted = jnp.sum(pi_vis * q, axis=-1) / jnp.maximum(
            pi_vis_sum, 1e-30
        )
        v_mix = (v_node + n_total * q_weighted) / (1.0 + n_total)
        v_mix = jnp.where(pi_vis_sum > 0, v_mix, v_node)
        return jnp.where(visited, q, v_mix[..., None])

    def _improved_policy(self, prior, nv, w, v_node):
        """pi' = softmax over legal of (log prior + sigma(completedQ))."""
        legal = prior > 0
        completed = self._completed_q(prior, nv, w, v_node)
        max_n = jnp.max(nv.astype(jnp.float32), axis=-1, keepdims=True)
        logits = jnp.where(
            legal, jnp.log(jnp.maximum(prior, 1e-35))
            + self._sigma(completed, max_n), NEG_INF,
        )
        return jax.nn.softmax(logits, axis=-1)

    def _nonroot_action(self, prior, nv, w, v_node):
        """Deterministic selection: argmax pi'(a) - N(a)/(1 + sum N)."""
        pi = self._improved_policy(prior, nv, w, v_node)
        nv_f = nv.astype(jnp.float32)
        n_total = jnp.sum(nv_f, axis=-1, keepdims=True)
        score = pi - nv_f / (1.0 + n_total)
        return jnp.argmax(
            jnp.where(prior > 0, score, NEG_INF), axis=-1
        ).astype(jnp.int32)

    # -- search --------------------------------------------------------------

    def search_select(self, root_states, evaluate_fn: EvaluateFn, rng,
                      simulations: int):
        """Run Gumbel sequential-halving search; returns
        (tree, action (B,), improved_policy (B, A)).

        Named distinctly from MCTS.search on purpose: the return shape
        differs (tuple vs Tree), so generic MCTS callers are never handed
        a GumbelMCTS unknowingly.

        Simulation 0 evaluates/expands the root (no backup — same as the
        PUCT path); the remaining ``simulations - 1`` are root visits on
        the halving schedule.
        """
        env, a = self.env, self.env.num_actions
        num_nodes = max(self.cfg.max_nodes, simulations)
        batch = jax.tree.leaves(root_states)[0].shape[0]
        m = max(min(self.cfg.gumbel_max_considered, a, simulations - 1), 1)
        tree = jax.vmap(lambda s: self.init_tree(s, num_nodes))(root_states)
        n = num_nodes

        rng, k_gumbel = jax.random.split(rng)
        gumbels = jax.random.gumbel(k_gumbel, (batch, a))

        def read_node(arr, node):
            return jnp.einsum(
                "bn,bn->b", _onehot(node, n), arr.astype(jnp.float32)
            )

        def write_col(arr, col, value, mask):
            cur = jax.lax.dynamic_slice(arr, (0, col), (batch, 1))
            val = jnp.where(mask[:, None], value[:, None].astype(arr.dtype),
                            cur)
            return jax.lax.dynamic_update_slice(arr, val, (0, col))

        # ---- wave 0: evaluate + expand the root ----------------------------
        obs0 = jax.vmap(env.observe)(root_states)
        probs0, values0 = evaluate_fn(obs0)
        legal0 = jax.vmap(env.legal_mask)(root_states)
        prior0 = self._renormalize(probs0, legal0)
        root_live = ~jax.vmap(env.is_terminal)(root_states)
        tree = tree.replace(
            prior=tree.prior.at[:, 0, :].set(
                jnp.where(root_live[:, None], prior0, tree.prior[:, 0])
            ),
            expanded=tree.expanded.at[:, 0].set(root_live),
            value_evaluated=tree.value_evaluated.at[:, 0].set(
                jnp.where(root_live, values0, 0.0)
            ),
        )

        # Candidate set: top-m legal actions by g + logits, slot-sorted
        # descending (Gumbel-top-k). log(prior) differs from the policy
        # logits by a per-row constant — score ordering is unchanged.
        root_logits = jnp.where(
            prior0 > 0, jnp.log(jnp.maximum(prior0, 1e-35)), NEG_INF
        )
        base_score = jnp.where(
            prior0 > 0, gumbels + root_logits, NEG_INF
        )
        _, cand_actions = jax.lax.top_k(base_score, m)  # (B, m)
        cand_actions = cand_actions.astype(jnp.int32)

        sims_left = max(simulations - 1, 0)
        if sims_left == 0:
            action = jnp.argmax(base_score, axis=-1).astype(jnp.int32)
            return tree, action, prior0

        slots_np, halves_np, alives_np = halving_schedule(m, sims_left)
        sched_slot = jnp.asarray(slots_np)
        sched_halve = jnp.asarray(halves_np)
        sched_alive = jnp.asarray(alives_np)

        def cand_scores(tree, cand_actions):
            """(B, m) g + logits + sigma(q) of each candidate's root edge
            (unvisited candidates use q = 0 like the paper's q-completion
            at the root never matters: every alive candidate gets visits
            in phase 0)."""
            nv = self.root_child_visits(tree).astype(jnp.float32)  # (B, A)
            w = self.root_child_value_sums(tree)                   # (B, A)
            q = jnp.where(nv > 0, w / jnp.maximum(nv, 1.0), 0.0)
            max_n = jnp.max(nv, axis=-1, keepdims=True)
            score_a = gumbels + root_logits + self._sigma(q, max_n)  # (B, A)
            oh = cand_actions[..., None] == jnp.arange(a)            # (B,m,A)
            return jnp.einsum(
                "bma,ba->bm", oh.astype(jnp.float32), score_a
            )

        def sim_body(i, carry):
            tree, cand_actions = carry
            slot = sched_slot[i]
            alive = sched_alive[i]

            # Per-wave precompute: deterministic non-root best actions.
            nv, w = self._edge_stats(tree, n)                  # (B, N, A)
            best_a = jax.vmap(
                lambda p, nvv, ww, vv: self._nonroot_action(p, nvv, ww, vv)
            )(tree.prior, nv, w, tree.value_evaluated)         # (B, N)
            # Root action: the scheduled candidate (slot is batch-uniform;
            # a slot past a game's legal-action count scores -inf at
            # halving time and simply burns the wave on the best slot 0
            # candidate instead).
            root_action = jnp.einsum(
                "bm,bm->b",
                (jnp.arange(m)[None, :] == slot).astype(jnp.float32),
                cand_actions.astype(jnp.float32),
            ).astype(jnp.int32)
            root_legal = jnp.einsum(
                "ba,ba->b",
                (jnp.arange(a)[None, :] == root_action[:, None]).astype(
                    jnp.float32
                ),
                (tree.prior[:, 0] > 0).astype(jnp.float32),
            ) > 0
            root_action = jnp.where(
                root_legal, root_action, cand_actions[:, 0]
            )
            best_a = best_a.at[:, 0].set(root_action)

            cmatch = (
                tree.parent[:, :, None] == jnp.arange(n)[None, None, :]
            ) & (tree.parent_action[:, :, None] == best_a[:, None, :])
            best_child = jnp.max(
                jnp.where(cmatch, jnp.arange(n)[None, :, None], UNVISITED),
                axis=1,
            ).astype(jnp.int32)

            node, action, code, state = self._descend(
                tree, best_a, best_child, batch, n
            )

            # CREATE in the wave's static slot (slot i+1: wave 0 was the
            # root expansion and used slot 0).
            new = code == _NEW
            child_state, reward = jax.vmap(env.step)(state, action)
            slot_i = i + 1
            leaf = jnp.where(new, slot_i, node)
            emask = lambda x, ref: x.reshape((-1,) + (1,) * (ref.ndim - 1))
            leaf_state = jax.tree.map(
                lambda cs, s: jnp.where(emask(new, cs), cs, s),
                child_state, state,
            )
            child_terminal = jax.vmap(env.is_terminal)(child_state)
            node_terminal = read_node(tree.is_terminal, node) > 0
            node_reward = read_node(tree.reward, node)
            leaf_terminal = jnp.where(new, child_terminal, node_terminal)
            leaf_reward = jnp.where(new, reward, node_reward)

            obs = jax.vmap(env.observe)(leaf_state)
            probs, values = evaluate_fn(obs)

            tree = tree.replace(
                parent=write_col(tree.parent, slot_i, node, new),
                parent_action=write_col(
                    tree.parent_action, slot_i, action, new
                ),
                is_terminal=write_col(
                    tree.is_terminal, slot_i, child_terminal, new
                ),
                reward=write_col(tree.reward, slot_i, reward, new),
                node_count=tree.node_count + new.astype(jnp.int32),
            )

            leaf_expanded = read_node(tree.expanded, leaf) > 0
            do = ~leaf_expanded & ~leaf_terminal
            legal = jax.vmap(env.legal_mask)(leaf_state)
            renormed = self._renormalize(probs, legal)
            prior_cur = jax.lax.dynamic_slice(
                tree.prior, (0, slot_i, 0), (batch, 1, a)
            )
            prior_new = jnp.where(
                do[:, None, None], renormed[:, None, :], prior_cur
            )
            tree = tree.replace(
                prior=jax.lax.dynamic_update_slice(
                    tree.prior, prior_new, (0, slot_i, 0)
                ),
                value_evaluated=write_col(
                    tree.value_evaluated, slot_i, values, do & new
                ),
                expanded=write_col(
                    tree.expanded, slot_i,
                    jnp.ones((batch,), jnp.bool_), do & new,
                ),
            )

            leaf_value = jnp.where(leaf_terminal, leaf_reward, -values)

            tree = self._backup(tree, leaf, leaf_value, n)

            # Sequential halving: keep the best half of the alive prefix
            # (sorted descending, so the alive set stays a prefix).
            def halve(cand_actions):
                scores = cand_scores(tree, cand_actions)
                scores = jnp.where(
                    jnp.arange(m)[None, :] < alive, scores, NEG_INF
                )
                order = jnp.argsort(-scores, axis=-1)
                oh = order[..., None] == jnp.arange(m)[None, None, :]
                return jnp.einsum(
                    "bmk,bk->bm", oh.astype(jnp.float32),
                    cand_actions.astype(jnp.float32),
                ).astype(jnp.int32)

            cand_actions = jax.lax.cond(
                sched_halve[i], halve, lambda c: c, cand_actions
            )
            return tree, cand_actions

        tree, cand_actions = jax.lax.fori_loop(
            0, sims_left, sim_body, (tree, cand_actions)
        )

        # Final selection among the last phase's survivors.
        final_alive = int(alives_np[-1]) if len(alives_np) else 1
        scores = cand_scores(tree, cand_actions)
        scores = jnp.where(
            jnp.arange(m)[None, :] < final_alive, scores, NEG_INF
        )
        best_slot = jnp.argmax(scores, axis=-1)
        action = jnp.einsum(
            "bm,bm->b",
            (jnp.arange(m)[None, :] == best_slot[:, None]).astype(
                jnp.float32
            ),
            cand_actions.astype(jnp.float32),
        ).astype(jnp.int32)
        # Terminal roots: keep action 0 (masked upstream like PUCT play).
        action = jnp.where(root_live, action, 0)

        # Improved-policy training target at the root.
        nv_root = self.root_child_visits(tree).astype(jnp.float32)
        w_root = self.root_child_value_sums(tree)
        pi_improved = self._improved_policy(
            tree.prior[:, 0], nv_root, w_root, values0
        )
        return tree, action, pi_improved
