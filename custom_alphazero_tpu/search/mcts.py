"""Array-tree PUCT Monte-Carlo tree search.

Re-designs the reference's sequential object-tree MCTS
(/root/reference/custom_alphazero/mcts/mcts.py) as fixed-width arrays with
select / expand / backup as gather-scatter ops under ``lax.while_loop`` /
``fori_loop``, vmapped over a batch of games. Leaf evaluation is one batched
policy-value forward per simulation wave — the on-device replacement for the
reference's HTTP micro-batching inference service
(serving/inference_batch.py:35-54).

Search semantics reproduce the reference exactly:

- PUCT scores: Q = W/N (0 when unvisited) and
  U = c_puct * P * sqrt(sum sibling visits) / (1 + N)  (mcts.py:39-55).
  Ties break toward the lowest action index like np.argmax (mcts.py:64-68).
- Root Dirichlet noise, when enabled, is re-sampled *every simulation* over
  the legal actions and mixed (1-eps)*P + eps*Dir(alpha) (mcts.py:70-85).
- Priors are masked to legal moves and renormalized; an all-zero vector
  falls back to uniform over legal moves (mcts.py:148-150, mcts/utils.py:4-16).
- Values follow the canonical-mirror negamax convention: a leaf evaluated by
  the network backs up ``-value`` (the board was mirrored after the last
  action, mcts.py:174-175); a terminal leaf backs up the game result for the
  player who just moved: +1 win / 0 draw (mcts.py:176-179). Signs alternate
  each ply on the walk to the root (mcts.py:163-168).
- The first simulation that evaluates the root performs no backup (the
  reference's empty path_cache, mcts.py:170-180), so after k simulations the
  root's children hold k-1 visits in total.

Unlike the reference, child boards are materialized lazily (one new node per
simulation) instead of all-at-once at expansion — identical search behavior,
O(simulations) instead of O(simulations * actions) state storage, which is
what makes the chess action space (~1900 moves) feasible.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from custom_alphazero_tpu.config import MCTSConfig
from custom_alphazero_tpu.envs.core import Env

# Select-loop stop codes.
_CONTINUE = 0  # keep descending
_NEW = 1       # expanded node with an unvisited (child == -1) best action
_UNEXPANDED = 2  # reached an unexpanded node (only the root, simulation 0)
_TERMINAL = 3  # reached a terminal node

NO_PARENT = -1
UNVISITED = -1

EvaluateFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


@struct.dataclass
class Tree:
    """Per-game search tree of capacity N nodes over A actions.

    All fields carry a leading batch axis (B, ...) in normal use; the
    per-node layout is:

    states: env-state pytree with leading (N,) — canonical board per node.
    parent: (N,) index of the parent node (NO_PARENT for the root).
    parent_action: (N,) action taken from the parent to reach this node.
    children: (N, A) child node index or UNVISITED.
    visits: (N,) incoming-edge visit count (reference UCTEdge.visit_count).
    value_sum: (N,) summed backed-up value from the perspective of the
        player who moved into the node (reference UCTEdge.total_action_value).
    prior: (N, A) legal-masked renormalized priors (reference UCTEdge.prior).
    legal: (N, A) legal-action mask captured at expansion.
    expanded: (N,) priors valid (reference: node has edges).
    is_terminal: (N,) game over at this node.
    reward: (N,) step reward for the mover who created the node (+1 win/0) —
        the value a terminal leaf backs up (reference get_result, mcts.py:179).
    value_evaluated: (N,) raw network value at expansion (for visualization,
        reference UCTNode.evaluated_value).
    node_count: () number of allocated nodes.
    """

    states: Any
    parent: jnp.ndarray
    parent_action: jnp.ndarray
    children: jnp.ndarray
    visits: jnp.ndarray
    value_sum: jnp.ndarray
    prior: jnp.ndarray
    legal: jnp.ndarray
    expanded: jnp.ndarray
    is_terminal: jnp.ndarray
    reward: jnp.ndarray
    value_evaluated: jnp.ndarray
    node_count: jnp.ndarray


class MCTS:
    """Batched array-tree PUCT search over an :class:`Env`."""

    def __init__(self, env: Env, cfg: MCTSConfig = MCTSConfig()):
        self.env = env
        self.cfg = cfg

    # -- tree construction -------------------------------------------------

    def init_tree(self, root_state, num_nodes: int) -> Tree:
        """Allocate a single-game tree with the root at node 0 (vmap me)."""
        env, n, a = self.env, num_nodes, self.env.num_actions
        states = jax.tree.map(
            lambda leaf: jnp.zeros((n,) + jnp.shape(leaf), leaf.dtype).at[0].set(leaf),
            root_state,
        )
        return Tree(
            states=states,
            parent=jnp.full((n,), NO_PARENT, jnp.int32),
            parent_action=jnp.zeros((n,), jnp.int32),
            children=jnp.full((n, a), UNVISITED, jnp.int32),
            visits=jnp.zeros((n,), jnp.int32),
            value_sum=jnp.zeros((n,), jnp.float32),
            prior=jnp.zeros((n, a), jnp.float32),
            legal=jnp.zeros((n, a), jnp.bool_),
            expanded=jnp.zeros((n,), jnp.bool_),
            is_terminal=jnp.zeros((n,), jnp.bool_).at[0].set(env.is_terminal(root_state)),
            reward=jnp.zeros((n,), jnp.float32).at[0].set(
                # Root "reward" = value for the player who moved into the
                # root; only consulted if the root itself is terminal.
                -env.terminal_value(root_state)
            ),
            value_evaluated=jnp.zeros((n,), jnp.float32),
            node_count=jnp.int32(1),
        )

    # -- per-game kernels (vmapped by search) ------------------------------

    def _select_one(self, tree: Tree, root_prior: jnp.ndarray):
        """Descend from the root via PUCT until a stop condition."""
        c_puct = self.cfg.c_puct
        neg_inf = jnp.finfo(jnp.float32).min

        def body(carry):
            node, _, _ = carry
            prior = jnp.where(node == 0, root_prior, tree.prior[node])
            legal = tree.legal[node]
            child_idx = tree.children[node]
            safe_idx = jnp.maximum(child_idx, 0)
            has_child = child_idx >= 0
            nv = jnp.where(has_child, tree.visits[safe_idx], 0)
            w = jnp.where(has_child, tree.value_sum[safe_idx], 0.0)
            q = jnp.where(nv > 0, w / jnp.maximum(nv, 1), 0.0)
            u = c_puct * prior * jnp.sqrt(jnp.sum(nv).astype(jnp.float32)) / (1.0 + nv)
            score = jnp.where(legal, q + u, neg_inf)
            action = jnp.argmax(score).astype(jnp.int32)
            child = child_idx[action]
            # Terminal wins over unexpanded: terminal nodes are never
            # expanded but must stop with code TERMINAL.
            code = jnp.where(
                tree.is_terminal[node],
                _TERMINAL,
                jnp.where(
                    ~tree.expanded[node],
                    _UNEXPANDED,
                    jnp.where(child == UNVISITED, _NEW, _CONTINUE),
                ),
            ).astype(jnp.int32)
            next_node = jnp.where(code == _CONTINUE, child, node)
            return next_node, action, code

        init = (jnp.int32(0), jnp.int32(0), jnp.int32(_CONTINUE))
        node, action, code = jax.lax.while_loop(
            lambda c: c[2] == _CONTINUE, body, init
        )
        return node, action, code

    def _maybe_create_child(self, tree: Tree, node, action, code):
        """Materialize the selected unvisited child (code == NEW)."""
        new = code == _NEW
        slot = tree.node_count  # next free slot; writes drop when not new
        parent_state = jax.tree.map(lambda s: s[node], tree.states)
        child_state, reward = self.env.step(parent_state, action)
        write = lambda buf, value: buf.at[slot].set(
            jnp.where(new, value, buf[slot])
        )
        states = jax.tree.map(write, tree.states, child_state)
        tree = tree.replace(
            states=states,
            parent=write(tree.parent, node),
            parent_action=write(tree.parent_action, action),
            children=tree.children.at[node, action].set(
                jnp.where(new, slot, tree.children[node, action])
            ),
            is_terminal=write(tree.is_terminal, self.env.is_terminal(child_state)),
            reward=write(tree.reward, reward),
            node_count=tree.node_count + new.astype(jnp.int32),
        )
        leaf = jnp.where(new, slot, node)
        return tree, leaf

    def _expand_one(self, tree: Tree, leaf, probs, value):
        """Store legal-masked renormalized priors + bookkeeping at the leaf."""
        do = ~tree.expanded[leaf] & ~tree.is_terminal[leaf]
        state = jax.tree.map(lambda s: s[leaf], tree.states)
        legal = self.env.legal_mask(state)
        masked = jnp.where(legal, probs, 0.0)
        total = jnp.sum(masked)
        num_legal = jnp.maximum(jnp.sum(legal), 1)
        # All-zero fallback: uniform over legal (reference mcts/utils.py:4-16).
        renormed = jnp.where(
            total > 0.0, masked / jnp.maximum(total, 1e-30), legal / num_legal
        )
        sel = lambda buf, value: buf.at[leaf].set(jnp.where(do, value, buf[leaf]))
        return tree.replace(
            prior=sel(tree.prior, renormed),
            legal=sel(tree.legal, legal),
            value_evaluated=sel(tree.value_evaluated, value),
            expanded=tree.expanded.at[leaf].set(tree.expanded[leaf] | do),
        )

    def _backup_one(self, tree: Tree, leaf, net_value):
        """Negamax backup along the parent chain (reference mcts.py:163-179)."""
        leaf_value = jnp.where(
            tree.is_terminal[leaf], tree.reward[leaf], -net_value
        )

        def body(carry):
            node, value, visits, value_sum = carry
            visits = visits.at[node].add(1)
            value_sum = value_sum.at[node].add(value)
            return tree.parent[node], -value, visits, value_sum

        node, _, visits, value_sum = jax.lax.while_loop(
            lambda c: c[0] > 0,  # stop at the root (no incoming edge)
            body,
            (leaf, leaf_value, tree.visits, tree.value_sum),
        )
        return tree.replace(visits=visits, value_sum=value_sum)

    def _root_noisy_prior(self, tree: Tree, rng):
        """Per-simulation Dirichlet mix at the root (reference mcts.py:70-85)."""
        cfg = self.cfg
        prior = tree.prior[0]
        if not cfg.use_dirichlet:
            return prior
        legal = tree.legal[0]
        gamma = jax.random.gamma(rng, cfg.dirichlet_alpha, prior.shape)
        gamma = jnp.where(legal, gamma, 0.0)
        noise = gamma / jnp.maximum(jnp.sum(gamma), 1e-30)
        mixed = (1.0 - cfg.dirichlet_fraction) * prior + cfg.dirichlet_fraction * noise
        return jnp.where(legal, mixed, 0.0)

    # -- batched search ----------------------------------------------------

    def search(self, root_states, evaluate_fn: EvaluateFn, rng, simulations: int) -> Tree:
        """Run `simulations` PUCT simulations for a batch of root states.

        root_states: env-state pytree with leading batch dim (B, ...).
        evaluate_fn: (B, *obs_shape) -> (softmax probs (B, A), value (B,)),
            the batched network forward (or solver oracle / uniform for tests).

        Not jitted here: callers jit the enclosing program so `evaluate_fn`
        can close over (dynamic) network parameters without retracing.
        """
        num_nodes = self.cfg.max_nodes or simulations + 1
        batch = jax.tree.leaves(root_states)[0].shape[0]
        tree = jax.vmap(lambda s: self.init_tree(s, num_nodes))(root_states)

        def sim_body(i, carry):
            tree, rng = carry
            rng, knoise = jax.random.split(rng)
            noise_keys = jax.random.split(knoise, batch)
            root_prior = jax.vmap(self._root_noisy_prior)(tree, noise_keys)
            node, action, code = jax.vmap(self._select_one)(tree, root_prior)
            tree, leaf = jax.vmap(self._maybe_create_child)(tree, node, action, code)
            leaf_states = jax.vmap(
                lambda t, l: jax.tree.map(lambda s: s[l], t.states)
            )(tree, leaf)
            obs = jax.vmap(self.env.observe)(leaf_states)
            probs, values = evaluate_fn(obs)
            tree = jax.vmap(self._expand_one)(tree, leaf, probs, values)
            # Backup walks the parent chain and stops at the root, so the
            # simulation that evaluates the root itself (leaf == 0) performs
            # no backup — the reference's empty-path-cache first iteration.
            tree = jax.vmap(self._backup_one)(tree, leaf, values)
            return tree, rng

        tree, _ = jax.lax.fori_loop(0, simulations, sim_body, (tree, rng))
        return tree

    # -- outputs -----------------------------------------------------------

    def root_child_visits(self, tree: Tree) -> jnp.ndarray:
        """(B, A) visit counts of the root's children (pi numerator,
        reference mcts.py:190-197)."""

        def one(t: Tree):
            idx = t.children[0]
            safe = jnp.maximum(idx, 0)
            return jnp.where(idx >= 0, t.visits[safe], 0)

        return jax.vmap(one)(tree)

    def root_q_values(self, tree: Tree) -> jnp.ndarray:
        """(B, A) mean action values at the root (diagnostics)."""

        def one(t: Tree):
            idx = t.children[0]
            safe = jnp.maximum(idx, 0)
            nv = jnp.where(idx >= 0, t.visits[safe], 0)
            w = jnp.where(idx >= 0, t.value_sum[safe], 0.0)
            return jnp.where(nv > 0, w / jnp.maximum(nv, 1), 0.0)

        return jax.vmap(one)(tree)
