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

Search runs on fresh trees (no Dirichlet noise — the Gumbel noise is the
exploration; no subtree reuse). Tree layout, expansion and backup are
exactly search/mcts.py's; only the selection rules differ. At large
action spaces the tree uses the same top-K compressed prior layout as
the PUCT path (prior_width), with full-width root statistics maintained
incrementally — which is precisely what candidate scoring and the
improved-policy target need. Round-5 note: the compressed layout is
what makes Gumbel runnable in-loop at chess scale on the TPU — the
full-width per-wave (B, N, A) selection precompute (~50-100 MB of
temporaries per wave) kernel-faults the worker inside the generation
ply scan (bisect: standalone B=64 OK, in-loop B=8 OK, in-loop B=64
faults), the same footprint class as the round-3/4 noise-presample
crashers. Parity: tests/test_gumbel.py
test_gumbel_compressed_matches_full_width_chess.
"""

from __future__ import annotations

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.search.mcts import (
    MCTS,
    UNVISITED,
    _NEW,
    _onehot,
    _tpu_backend,
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

    def _nonroot_scores(self, prior, nv, w, v_node):
        """Deterministic-selection scores pi'(a) - N(a)/(1 + sum N);
        empty/illegal slots (prior == 0) score -inf. Works on full-width
        (..., A) rows and on compressed per-node (..., K) slot rows alike."""
        pi = self._improved_policy(prior, nv, w, v_node)
        nv_f = nv.astype(jnp.float32)
        n_total = jnp.sum(nv_f, axis=-1, keepdims=True)
        score = pi - nv_f / (1.0 + n_total)
        return jnp.where(prior > 0, score, NEG_INF)

    def _nonroot_action(self, prior, nv, w, v_node):
        """Deterministic selection: argmax pi'(a) - N(a)/(1 + sum N)."""
        return jnp.argmax(
            self._nonroot_scores(prior, nv, w, v_node), axis=-1
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
        # Top-K compressed tree layout at large action spaces (same policy
        # as the PUCT path, prior_width): the full-width per-wave
        # (B, N, A) selection precompute at chess scale builds ~50-100 MB
        # temporaries per wave, which kernel-faults the TPU worker once the
        # search sits inside the generation ply scan (round-5 bisect:
        # standalone B=64 runs, in-loop B=64 faults, in-loop B=8 runs —
        # the footprint, not the ops, is the variable; the same class as
        # round 3/4's noise-presample crashers). Root statistics stay
        # full-width (incrementally maintained root_visits/root_value_sum),
        # which is exactly what Gumbel's candidate scoring and
        # improved-policy target need.
        k = self.prior_width(simulations)
        compressed = k < a
        tree = jax.vmap(
            lambda s: self.init_tree(s, num_nodes, k)
        )(root_states)
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
        if compressed:
            # Root selection never reads the root's K-row (the scheduled
            # candidate overrides slot 0 each wave), but keep the layout
            # consistent: store the top-K priors + the full-width root row.
            r_vals, r_acts = jax.lax.top_k(prior0, k)
            tree = tree.replace(
                prior=tree.prior.at[:, 0, :].set(
                    jnp.where(root_live[:, None], r_vals, tree.prior[:, 0])
                ),
                prior_acts=tree.prior_acts.at[:, 0, :].set(
                    jnp.where(
                        root_live[:, None], r_acts.astype(jnp.int32),
                        tree.prior_acts[:, 0],
                    )
                ),
                root_prior=jnp.where(
                    root_live[:, None], prior0, tree.root_prior
                ),
                expanded=tree.expanded.at[:, 0].set(root_live),
                value_evaluated=tree.value_evaluated.at[:, 0].set(
                    jnp.where(root_live, values0, 0.0)
                ),
            )
        else:
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
            if compressed:
                nv = tree.root_visits  # incrementally maintained, (B, A)
                w = tree.root_value_sum
            else:
                nv = self.root_child_visits(tree).astype(jnp.float32)
                w = self.root_child_value_sums(tree)               # (B, A)
            q = jnp.where(nv > 0, w / jnp.maximum(nv, 1.0), 0.0)
            max_n = jnp.max(nv, axis=-1, keepdims=True)
            score_a = gumbels + root_logits + self._sigma(q, max_n)  # (B, A)
            oh = cand_actions[..., None] == jnp.arange(a)            # (B,m,A)
            return jnp.einsum(
                "bma,ba->bm", oh.astype(jnp.float32), score_a
            )

        # Round-5 on-chip bisect toggles (single-variable probes for the
        # chess-scale TPU kernel fault; see PARITY.md round-5):
        #   AZ_GUMBEL_SCAN=1   — feed the halving schedule through lax.scan
        #                        xs instead of indexing sched_*[i] inside the
        #                        loop body (removes the in-scan gathers, the
        #                        round-4 crasher class).
        #   AZ_GUMBEL_NOCOND=1 — compute the halving unconditionally and
        #                        select with jnp.where instead of lax.cond.
        _use_scan = os.environ.get("AZ_GUMBEL_SCAN", "1") == "1"
        _no_cond = os.environ.get("AZ_GUMBEL_NOCOND", "1") == "1"

        def sim_body(i, carry, slot=None, halve_flag=None, alive=None):
            tree, cand_actions = carry
            if slot is None:
                slot = sched_slot[i]
                alive = sched_alive[i]
                halve_flag = sched_halve[i]

            # Per-wave precompute: deterministic non-root best actions.
            if compressed:
                # (B, N, K) per-slot stats via (parent, parent_slot) match
                # (root children carry parent_slot = -1 and match nothing;
                # column 0 is overridden below).
                pm = (
                    tree.parent[:, :, None] == jnp.arange(n)
                ).astype(jnp.float32)
                sm = (
                    tree.parent_slot[:, :, None] == jnp.arange(k)
                ).astype(jnp.float32)
                stacked = jnp.concatenate(
                    [
                        sm * tree.visits[:, :, None],
                        sm * tree.value_sum[:, :, None],
                    ],
                    axis=-1,
                )  # (B, C, 2K)
                out = jnp.einsum("bcn,bck->bnk", pm, stacked)
                nv_k, w_k = out[..., :k], out[..., k:]
                score_k = jax.vmap(
                    lambda p, nvv, ww, vv: self._nonroot_scores(
                        p, nvv, ww, vv
                    )
                )(tree.prior, nv_k, w_k, tree.value_evaluated)  # (B, N, K)
                # Tie-break toward the lowest ACTION index (full-width
                # argmax semantics), then recover the slot.
                tied = score_k == jnp.max(score_k, axis=-1, keepdims=True)
                best_a = jnp.min(
                    jnp.where(tied, tree.prior_acts, a), axis=-1
                ).astype(jnp.int32)  # (B, N)
                best_k = jnp.argmax(
                    tied & (tree.prior_acts == best_a[..., None]), axis=-1
                ).astype(jnp.int32)  # (B, N)
            else:
                nv, w = self._edge_stats(tree, n)              # (B, N, A)
                best_a = jax.vmap(
                    lambda p, nvv, ww, vv: self._nonroot_action(
                        p, nvv, ww, vv
                    )
                )(tree.prior, nv, w, tree.value_evaluated)     # (B, N)
                best_k = None
            # Root action: the scheduled candidate (slot is batch-uniform;
            # a slot past a game's legal-action count scores -inf at
            # halving time and simply burns the wave on the best slot 0
            # candidate instead).
            root_action = jnp.einsum(
                "bm,bm->b",
                (jnp.arange(m)[None, :] == slot).astype(jnp.float32),
                cand_actions.astype(jnp.float32),
            ).astype(jnp.int32)
            root_prior_full = (
                tree.root_prior if compressed else tree.prior[:, 0]
            )
            root_legal = jnp.einsum(
                "ba,ba->b",
                (jnp.arange(a)[None, :] == root_action[:, None]).astype(
                    jnp.float32
                ),
                (root_prior_full > 0).astype(jnp.float32),
            ) > 0
            root_action = jnp.where(
                root_legal, root_action, cand_actions[:, 0]
            )
            best_a = best_a.at[:, 0].set(root_action)

            if compressed:
                # Non-root children matched by (parent, parent_slot); root
                # children carry parent_slot = -1, matched by parent_action.
                cmatch = (
                    tree.parent[:, :, None] == jnp.arange(n)[None, None, :]
                ) & (tree.parent_slot[:, :, None] == best_k[:, None, :])
                best_child = jnp.max(
                    jnp.where(
                        cmatch, jnp.arange(n)[None, :, None], UNVISITED
                    ),
                    axis=1,
                ).astype(jnp.int32)
                root_child = jnp.max(
                    jnp.where(
                        (tree.parent == 0)
                        & (tree.parent_action == root_action[:, None]),
                        jnp.arange(n)[None, :],
                        UNVISITED,
                    ),
                    axis=1,
                ).astype(jnp.int32)
                best_child = best_child.at[:, 0].set(root_child)
            else:
                cmatch = (
                    tree.parent[:, :, None] == jnp.arange(n)[None, None, :]
                ) & (tree.parent_action[:, :, None] == best_a[:, None, :])
                best_child = jnp.max(
                    jnp.where(
                        cmatch, jnp.arange(n)[None, :, None], UNVISITED
                    ),
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
            if compressed:
                # The new child's slot in its parent's top-K row (root
                # children get UNVISITED — matched by parent_action).
                sel_slot = jnp.where(
                    node == 0,
                    UNVISITED,
                    jnp.einsum(
                        "bn,bn->b", _onehot(node, n),
                        best_k.astype(jnp.float32),
                    ).astype(jnp.int32),
                )
                tree = tree.replace(
                    parent_slot=write_col(
                        tree.parent_slot, slot_i, sel_slot, new
                    )
                )

            leaf_expanded = read_node(tree.expanded, leaf) > 0
            do = ~leaf_expanded & ~leaf_terminal
            legal = jax.vmap(env.legal_mask)(leaf_state)
            renormed = self._renormalize(probs, legal)
            if compressed:
                # Same expansion layout as the PUCT compressed path
                # (mcts.py search): slot 0 of the row is the node's lowest
                # legal action (the zero-sibling-visits tie winner there —
                # harmless here, Gumbel never takes that tie path), the
                # rest are the remaining top-(K-1) priors descending.
                a0 = jnp.argmax(legal, axis=-1)
                a0_oh = (jnp.arange(a)[None, :] == a0[:, None])
                boosted = renormed + a0_oh.astype(jnp.float32) * 2.0
                if _tpu_backend() and k >= 128:
                    top_vals, top_acts = jax.lax.optimization_barrier(
                        jax.lax.top_k(
                            jax.lax.optimization_barrier(boosted), k
                        )
                    )
                else:
                    top_vals, top_acts = jax.lax.top_k(boosted, k)
                p0 = jnp.einsum(
                    "ba,ba->b", a0_oh.astype(jnp.float32), renormed
                )
                top_vals = jnp.where(
                    jnp.arange(k)[None, :] == 0, p0[:, None], top_vals
                )
                prior_cur = jax.lax.dynamic_slice(
                    tree.prior, (0, slot_i, 0), (batch, 1, k)
                )
                acts_cur = jax.lax.dynamic_slice(
                    tree.prior_acts, (0, slot_i, 0), (batch, 1, k)
                )
                prior_new = jnp.where(
                    do[:, None, None], top_vals[:, None, :], prior_cur
                )
                acts_new = jnp.where(
                    do[:, None, None], top_acts[:, None, :], acts_cur
                )
                tree = tree.replace(
                    prior=jax.lax.dynamic_update_slice(
                        tree.prior, prior_new, (0, slot_i, 0)
                    ),
                    prior_acts=jax.lax.dynamic_update_slice(
                        tree.prior_acts, acts_new, (0, slot_i, 0)
                    ),
                )
            else:
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
                )
            tree = tree.replace(
                value_evaluated=write_col(
                    tree.value_evaluated, slot_i, values, do & new
                ),
                expanded=write_col(
                    tree.expanded, slot_i,
                    jnp.ones((batch,), jnp.bool_), do & new,
                ),
            )

            leaf_value = jnp.where(leaf_terminal, leaf_reward, -values)

            if compressed:
                # Backup that also maintains the incremental full-width
                # root statistics (the root edge of this wave's path is
                # always best_a[:, 0] == root_action).
                def bcond(c):
                    return jnp.any(c[0] > 0)

                def bbody(c):
                    bnode, bvalue, visits, value_sum, root_val, root_hit = c
                    active = bnode > 0
                    oh = _onehot(bnode, n) * active[:, None].astype(
                        jnp.float32
                    )
                    visits = visits + oh
                    value_sum = value_sum + oh * bvalue[:, None]
                    parent = read_node(tree.parent, bnode).astype(jnp.int32)
                    is_root_edge = active & (parent == 0)
                    root_val = jnp.where(is_root_edge, bvalue, root_val)
                    root_hit = root_hit | is_root_edge
                    bnode = jnp.where(active, parent, bnode)
                    return (bnode, -bvalue, visits, value_sum, root_val,
                            root_hit)

                _, _, visits, value_sum, root_val, root_hit = (
                    jax.lax.while_loop(
                        bcond, bbody,
                        (
                            leaf, leaf_value, tree.visits, tree.value_sum,
                            jnp.zeros((batch,), jnp.float32),
                            jnp.zeros((batch,), jnp.bool_),
                        ),
                    )
                )
                roh = _onehot(root_action, a) * root_hit[:, None].astype(
                    jnp.float32
                )
                tree = tree.replace(
                    visits=visits,
                    value_sum=value_sum,
                    root_visits=tree.root_visits + roh,
                    root_value_sum=tree.root_value_sum
                    + roh * root_val[:, None],
                )
            else:
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

            if _no_cond:
                cand_actions = jnp.where(
                    halve_flag, halve(cand_actions), cand_actions
                )
            else:
                cand_actions = jax.lax.cond(
                    halve_flag, halve, lambda c: c, cand_actions
                )
            return tree, cand_actions

        if _use_scan:
            def scan_body(carry, xs):
                i, slot, halve_flag, alive = xs
                return sim_body(i, carry, slot, halve_flag, alive), None

            (tree, cand_actions), _ = jax.lax.scan(
                scan_body, (tree, cand_actions),
                (jnp.arange(sims_left, dtype=jnp.int32), sched_slot,
                 sched_halve, sched_alive),
            )
        else:
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

        # Improved-policy training target at the root — always over the
        # FULL action space (compressed trees keep full-width root stats).
        if compressed:
            nv_root, w_root = tree.root_visits, tree.root_value_sum
            root_prior_out = tree.root_prior
        else:
            nv_root = self.root_child_visits(tree).astype(jnp.float32)
            w_root = self.root_child_value_sums(tree)
            root_prior_out = tree.prior[:, 0]
        pi_improved = self._improved_policy(
            root_prior_out, nv_root, w_root, values0
        )
        return tree, action, pi_improved
