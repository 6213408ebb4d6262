"""Array-tree PUCT Monte-Carlo tree search.

Re-designs the reference's sequential object-tree MCTS
(/root/reference/custom_alphazero/mcts/mcts.py) as fixed-width arrays with
select / expand / backup as batched array ops under ``lax.while_loop`` /
``fori_loop`` over a batch of games. Leaf evaluation is one batched
policy-value forward per simulation wave — the on-device replacement for the
reference's HTTP micro-batching inference service
(serving/inference_batch.py:35-54).

Search semantics reproduce the reference exactly:

- Statistics live on *edges* (visit counts and summed action values per
  (node, action)), exactly the reference's UCTEdge (mcts.py:22-55).
- PUCT scores: Q = W/N (0 when unvisited) and
  U = c_puct * P * sqrt(sum sibling edge visits) / (1 + N)  (mcts.py:39-55).
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

TPU performance design (shaped by trace analysis on a v5e chip):

- **No per-node state storage.** The environment state is carried through
  the select descent with a cheap ``env.step_lite`` per level, so the tree
  holds no (batch, nodes, board...) buffer — the naive layout tiles tiny
  board minor dims to (8, 128), a 24x-padded half-GB buffer that XLA
  layout-copies every wave.
- **Dense one-hot addressing** (small action spaces, e.g. Connect-N): all
  row reads are one-hot einsums and all writes are masked full-array
  updates over (B, N*A) — zero gather/scatter ops, which on TPU otherwise
  lower to slow scalar-unit loops (a vmapped ``lax.dynamic_slice`` was
  measured at ~1 microsecond *per game per step*).
- **Gather addressing** (large action spaces, e.g. chess's 1968 actions):
  index-vector gathers ``x[node*A + iota]`` and masked scatters — dense
  full-array traffic would cost hundreds of MB per simulation there.
  The path is chosen by ``num_actions * num_nodes`` vs
  ``MCTS.dense_threshold``.

Child states are materialized lazily (one new node per simulation) instead
of all-at-once at expansion — identical search behavior, and O(simulations)
instead of O(simulations * actions) tree growth.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

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

    All fields carry a leading batch axis (B, ...) in normal use; per game:

    root_state: env-state pytree — the root position (node 0). Other nodes'
        states are reconstructed on the fly during select.
    parent: (N,) parent node index (NO_PARENT for the root).
    parent_action: (N,) action taken from the parent to reach the node.
    children: (N*A,) child node index or UNVISITED, indexed n*A + a.
    visits: (N*A,) edge visit counts (reference UCTEdge.visit_count).
    value_sum: (N*A,) summed backed-up edge values, from the perspective of
        the player taking the edge action (UCTEdge.total_action_value).
    prior: (N*A,) legal-masked renormalized priors; exactly 0 on illegal
        actions and >= a denormal floor on legal ones, so ``prior > 0``
        doubles as the legal mask during selection (UCTEdge.prior).
    expanded: (N,) priors valid (reference: node has edges).
    is_terminal: (N,) game over at this node.
    reward: (N,) step reward for the mover who created the node (+1 win/0) —
        the value a terminal leaf backs up (reference get_result, mcts.py:179).
    value_evaluated: (N,) raw network value at expansion (for visualization,
        reference UCTNode.evaluated_value).
    node_count: () number of allocated nodes.
    """

    root_state: Any
    parent: jnp.ndarray
    parent_action: jnp.ndarray
    children: jnp.ndarray
    visits: jnp.ndarray
    value_sum: jnp.ndarray
    prior: jnp.ndarray
    expanded: jnp.ndarray
    is_terminal: jnp.ndarray
    reward: jnp.ndarray
    value_evaluated: jnp.ndarray
    node_count: jnp.ndarray


def _onehot(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    return jax.nn.one_hot(idx, size, dtype=jnp.float32)


class MCTS:
    """Batched array-tree PUCT search over an :class:`Env`."""

    #: Use the dense one-hot path when num_actions * num_nodes is at most
    #: this (Connect-4 at 250 sims: 7 * 251 = 1757; chess at 800 sims:
    #: 1968 * 801 ≈ 1.6M — gathers win there).
    dense_threshold: int = 65536

    def __init__(self, env: Env, cfg: MCTSConfig = MCTSConfig(),
                 dense: Optional[bool] = None):
        self.env = env
        self.cfg = cfg
        self._dense_override = dense

    def _use_dense(self, num_nodes: int) -> bool:
        if self._dense_override is not None:
            return self._dense_override
        return self.env.num_actions * num_nodes <= self.dense_threshold

    # -- tree construction -------------------------------------------------

    def init_tree(self, root_state, num_nodes: int) -> Tree:
        """Allocate a single-game tree with the root at node 0 (vmap me)."""
        env, n, a = self.env, num_nodes, self.env.num_actions
        return Tree(
            root_state=root_state,
            parent=jnp.full((n,), NO_PARENT, jnp.int32),
            parent_action=jnp.zeros((n,), jnp.int32),
            children=jnp.full((n * a,), UNVISITED, jnp.int32),
            visits=jnp.zeros((n * a,), jnp.int32),
            value_sum=jnp.zeros((n * a,), jnp.float32),
            prior=jnp.zeros((n * a,), jnp.float32),
            expanded=jnp.zeros((n,), jnp.bool_),
            is_terminal=jnp.zeros((n,), jnp.bool_)
            .at[0]
            .set(env.is_terminal(root_state)),
            reward=jnp.zeros((n,), jnp.float32).at[0].set(
                # Root "reward" = value for the player who moved into the
                # root; only consulted if the root itself is terminal.
                -env.terminal_value(root_state)
            ),
            value_evaluated=jnp.zeros((n,), jnp.float32),
            node_count=jnp.int32(1),
        )

    # -- shared pieces -----------------------------------------------------

    def _ucb_action(self, prior, nv, w):
        """(B, A) PUCT argmax with reference scoring and tie-breaks."""
        cfg = self.cfg
        neg_inf = jnp.finfo(jnp.float32).min
        nv_f = nv.astype(jnp.float32)
        q = jnp.where(nv > 0, w / jnp.maximum(nv_f, 1.0), 0.0)
        u = (
            cfg.c_puct
            * prior
            * jnp.sqrt(jnp.sum(nv_f, axis=-1, keepdims=True))
            / (1.0 + nv_f)
        )
        score = jnp.where(prior > 0, q + u, neg_inf)
        return jnp.argmax(score, axis=-1).astype(jnp.int32)

    def _renormalize(self, probs, legal):
        """Legal-masked renormalized priors with the uniform fallback
        (mcts.py:148-150, mcts/utils.py:4-16) and a denormal floor so that
        `prior > 0` is exactly the legal mask."""
        masked = jnp.where(legal, probs, 0.0)
        total = jnp.sum(masked, axis=-1, keepdims=True)
        num_legal = jnp.maximum(
            jnp.sum(legal, axis=-1, keepdims=True), 1
        )
        renormed = jnp.where(
            total > 0.0, masked / jnp.maximum(total, 1e-30), legal / num_legal
        )
        return jnp.where(legal, jnp.maximum(renormed, 1e-35), 0.0)

    def _root_noisy_prior(self, root_prior, rng, batch):
        """Per-simulation Dirichlet mix at the root (reference mcts.py:70-85)."""
        cfg = self.cfg
        if not cfg.use_dirichlet:
            return root_prior
        legal = root_prior > 0
        gamma = jax.random.gamma(rng, cfg.dirichlet_alpha, root_prior.shape)
        gamma = jnp.where(legal, gamma, 0.0)
        noise = gamma / jnp.maximum(
            jnp.sum(gamma, axis=-1, keepdims=True), 1e-30
        )
        mixed = (
            (1.0 - cfg.dirichlet_fraction) * root_prior
            + cfg.dirichlet_fraction * noise
        )
        # Keep the legal floor: noise can underflow to zero.
        return jnp.where(legal, jnp.maximum(mixed, 1e-35), 0.0)

    # -- batched search ----------------------------------------------------

    def search(self, root_states, evaluate_fn: EvaluateFn, rng,
               simulations: int) -> Tree:
        """Run `simulations` PUCT simulations for a batch of root states.

        root_states: env-state pytree with leading batch dim (B, ...).
        evaluate_fn: (B, *obs_shape) -> (softmax probs (B, A), value (B,)),
            the batched network forward (or solver oracle / uniform for
            tests).

        Not jitted here: callers jit the enclosing program so `evaluate_fn`
        can close over (dynamic) network parameters without retracing.
        """
        num_nodes = self.cfg.max_nodes or simulations + 1
        batch = jax.tree.leaves(root_states)[0].shape[0]
        env, a_count = self.env, self.env.num_actions
        dense = self._use_dense(num_nodes)
        tree = jax.vmap(lambda s: self.init_tree(s, num_nodes))(root_states)

        n, a = num_nodes, a_count

        # ---- batch-level row access helpers --------------------------------
        if dense:
            def read_rows(tree, node):
                """(prior, children, nv, w) rows of `node` — one-hot einsums,
                no gathers."""
                oh = _onehot(node, n)  # (B, N)
                def pick(flat, dtype=None):
                    mat = flat.reshape(batch, n, a)
                    out = jnp.einsum(
                        "bn,bna->ba", oh, mat.astype(jnp.float32)
                    )
                    return out
                prior = pick(tree.prior)
                children = pick(tree.children).astype(jnp.int32)
                nv = pick(tree.visits).astype(jnp.int32)
                w = pick(tree.value_sum)
                return prior, children, nv, w

            def read_node(arr, node):
                """(B,) entry of a per-node (B, N) array."""
                return jnp.einsum(
                    "bn,bn->b", _onehot(node, n), arr.astype(jnp.float32)
                )

            def write_edge(flat, node, action, value, mask):
                """flat[b, node*A+action] = value where mask (full-array)."""
                sel = (_onehot(node, n)[:, :, None]
                       * _onehot(action, a)[:, None, :]).reshape(batch, -1)
                sel = (sel > 0) & mask[:, None]
                return jnp.where(sel, value[:, None], flat)

            def add_edge(flat, node, action, delta, mask):
                sel = (_onehot(node, n)[:, :, None]
                       * _onehot(action, a)[:, None, :]).reshape(batch, -1)
                active = jnp.where(mask[:, None], sel, 0.0)
                return flat + (active * delta[:, None]).astype(flat.dtype)

            def write_prior_row(flat, node, row_values, mask):
                sel = jnp.repeat(_onehot(node, n), a, axis=-1) > 0
                sel = sel & mask[:, None]
                tiled = jnp.tile(row_values, (1, n))
                return jnp.where(sel, tiled, flat)
        else:
            # Contiguous per-node rows: vmapped dynamic slices, NOT
            # take/put_along_axis — arbitrary-index gathers/scatters lower
            # to scalar loops on TPU (measured 35 ms vs 4.8 ms for one
            # (B=1024, A=1968) row read).
            def _slice_row(flat, node):
                return jax.vmap(
                    lambda row, k: jax.lax.dynamic_slice(row, (k * a,), (a,))
                )(flat, node)

            def _update_row(flat, node, values):
                return jax.vmap(
                    lambda row, k, v: jax.lax.dynamic_update_slice(
                        row, v, (k * a,)
                    )
                )(flat, node, values.astype(flat.dtype))

            def read_rows(tree, node):
                return (_slice_row(tree.prior, node),
                        _slice_row(tree.children, node),
                        _slice_row(tree.visits, node),
                        _slice_row(tree.value_sum, node))

            def read_node(arr, node):
                return jax.vmap(
                    lambda row, k: jax.lax.dynamic_slice(row, (k,), (1,))
                )(arr.astype(jnp.float32), node)[:, 0]

            def write_edge(flat, node, action, value, mask):
                idx = node * a + action
                cur = jax.vmap(
                    lambda row, k: jax.lax.dynamic_slice(row, (k,), (1,))
                )(flat, idx)
                val = jnp.where(mask[:, None], value[:, None], cur)
                return jax.vmap(
                    lambda row, k, v: jax.lax.dynamic_update_slice(
                        row, v, (k,)
                    )
                )(flat, idx, val.astype(flat.dtype))

            def add_edge(flat, node, action, delta, mask):
                idx = node * a + action
                cur = jax.vmap(
                    lambda row, k: jax.lax.dynamic_slice(row, (k,), (1,))
                )(flat, idx)
                val = cur + jnp.where(
                    mask[:, None], delta[:, None], 0
                ).astype(flat.dtype)
                return jax.vmap(
                    lambda row, k, v: jax.lax.dynamic_update_slice(
                        row, v, (k,)
                    )
                )(flat, idx, val)

            def write_prior_row(flat, node, row_values, mask):
                cur = _slice_row(flat, node)
                val = jnp.where(mask[:, None], row_values, cur)
                return _update_row(flat, node, val)

        def write_node(arr, node, value, mask):
            """arr[b, node[b]] = value[b] where mask — masked full write for
            the dense path, put_along_axis otherwise; per-node arrays are
            (B, N) either way (tiny)."""
            if dense:
                sel = (_onehot(node, n) > 0) & mask[:, None]
                return jnp.where(sel, value[:, None].astype(arr.dtype), arr)
            cur = jax.vmap(
                lambda row, k: jax.lax.dynamic_slice(row, (k,), (1,))
            )(arr, node)
            val = jnp.where(mask[:, None], value[:, None].astype(arr.dtype), cur)
            return jax.vmap(
                lambda row, k, v: jax.lax.dynamic_update_slice(row, v, (k,))
            )(arr, node, val)

        # ---- the simulation wave -------------------------------------------
        def sim_body(i, carry):
            tree, rng = carry
            rng, knoise = jax.random.split(rng)
            root_prior = self._root_noisy_prior(
                tree.prior[:, :a], knoise, batch
            )

            # SELECT: descend carrying the env state.
            def cond(c):
                return jnp.any(c[2] == _CONTINUE)

            def body(c):
                node, action, code, state = c
                prior, children, nv, w = read_rows(tree, node)
                prior = jnp.where((node == 0)[:, None], root_prior, prior)
                best = self._ucb_action(prior, nv, w)
                # One-hot dot picks children[best] (carries through -1).
                child = jnp.sum(
                    jnp.where(
                        jax.nn.one_hot(best, a, dtype=jnp.int32) > 0,
                        children, 0,
                    ),
                    axis=-1,
                )
                node_terminal = read_node(tree.is_terminal, node) > 0
                node_expanded = read_node(tree.expanded, node) > 0
                new_code = jnp.where(
                    code != _CONTINUE,
                    code,
                    jnp.where(
                        node_terminal,
                        _TERMINAL,
                        jnp.where(
                            ~node_expanded,
                            _UNEXPANDED,
                            jnp.where(child == UNVISITED, _NEW, _CONTINUE),
                        ),
                    ),
                ).astype(jnp.int32)
                action = jnp.where(code == _CONTINUE, best, action)
                descend = new_code == _CONTINUE
                stepped = jax.vmap(env.step_lite)(state, action)
                state = jax.tree.map(
                    lambda cur, nxt: jnp.where(
                        descend.reshape((-1,) + (1,) * (nxt.ndim - 1)),
                        nxt, cur,
                    ),
                    state, stepped,
                )
                node = jnp.where(descend, child, node)
                return node, action, new_code, state

            init = (
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros((batch,), jnp.int32),
                jnp.full((batch,), _CONTINUE, jnp.int32),
                tree.root_state,
            )
            node, action, code, state = jax.lax.while_loop(cond, body, init)

            # CREATE the selected child + EVALUATE the wave's leaves.
            new = (code == _NEW) & (tree.node_count < n)
            slot = tree.node_count  # (B,)
            child_state, reward = jax.vmap(env.step)(state, action)
            leaf = jnp.where(new, slot, node)
            expand_mask = lambda x, ref: x.reshape(
                (-1,) + (1,) * (ref.ndim - 1)
            )
            leaf_state = jax.tree.map(
                lambda cs, s: jnp.where(expand_mask(new, cs), cs, s),
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
                parent=write_node(tree.parent, slot, node, new),
                parent_action=write_node(tree.parent_action, slot, action, new),
                children=write_edge(tree.children, node, action,
                                    slot, new),
                is_terminal=write_node(
                    tree.is_terminal, slot, child_terminal, new
                ),
                reward=write_node(tree.reward, slot, reward, new),
                node_count=tree.node_count + new.astype(jnp.int32),
            )

            # EXPAND the leaf (skip terminal / already-expanded leaves).
            leaf_expanded = read_node(tree.expanded, leaf) > 0
            do = ~leaf_expanded & ~leaf_terminal
            legal = jax.vmap(env.legal_mask)(leaf_state)
            renormed = self._renormalize(probs, legal)
            tree = tree.replace(
                prior=write_prior_row(tree.prior, leaf, renormed, do),
                value_evaluated=write_node(
                    tree.value_evaluated, leaf, values, do
                ),
                expanded=write_node(
                    tree.expanded, leaf, jnp.ones((batch,), jnp.bool_), do
                ),
            )

            # BACKUP along the parent chain; edge stats keyed by
            # (parent-of-x, action-into-x). A root leaf loops zero times —
            # the reference's no-backup first simulation.
            leaf_value = jnp.where(leaf_terminal, leaf_reward, -values)

            def bcond(c):
                return jnp.any(c[0] > 0)

            def bbody(c):
                bnode, bvalue, visits, value_sum = c
                active = bnode > 0
                parent = read_node(tree.parent, bnode).astype(jnp.int32)
                paction = read_node(tree.parent_action, bnode).astype(jnp.int32)
                visits = add_edge(
                    visits, parent, paction, jnp.ones((batch,)), active
                )
                value_sum = add_edge(
                    value_sum, parent, paction, bvalue, active
                )
                bnode = jnp.where(active, parent, bnode)
                return bnode, -bvalue, visits, value_sum

            _, _, visits, value_sum = jax.lax.while_loop(
                bcond, bbody,
                (leaf, leaf_value, tree.visits, tree.value_sum),
            )
            tree = tree.replace(visits=visits, value_sum=value_sum)
            return tree, rng

        tree, _ = jax.lax.fori_loop(0, simulations, sim_body, (tree, rng))
        return tree

    # -- outputs -----------------------------------------------------------

    def root_child_visits(self, tree: Tree) -> jnp.ndarray:
        """(B, A) edge visit counts at the root (pi numerator,
        reference mcts.py:190-197)."""
        return tree.visits[:, : self.env.num_actions]

    def root_q_values(self, tree: Tree) -> jnp.ndarray:
        """(B, A) mean action values at the root (diagnostics)."""
        a = self.env.num_actions
        nv = tree.visits[:, :a]
        w = tree.value_sum[:, :a]
        return jnp.where(nv > 0, w / jnp.maximum(nv, 1), 0.0)
