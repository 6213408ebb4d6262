"""Fused Pallas TPU kernel for Connect-N PUCT search.

The general array-tree search (search/mcts.py) keeps its tree in HBM: every
descent level re-reads the whole (B, nodes*actions) edge arrays to extract one
row per game, so a 64-simulation search moves ~60 MB of tree state per wave
several times over — measured at ~1.0 ms/wave at B=8192 on a v5e chip, 2/3 of
total search time, all bandwidth.

This module fuses one full simulation (the reference's select →
evaluate_and_expand → backup cycle, mcts/mcts.py:111-180) into a single Pallas
kernel whose per-block tree state lives in VMEM for the whole simulation:
HBM sees each tree buffer once per wave instead of once per tree level.
The policy-value network stays outside in XLA (it is MXU-bound and XLA
compiles it well), so the kernel is *software-pipelined* across waves:

    kernel(wave=w):  expand+backup leaf of wave w-1   (uses net outputs w-1)
                     select+create leaf of wave w     (emits its board)
    XLA:             obs = observe(leaf board); probs, value = net(obs)

Exactness: every floating-point decision that could differ between compilers
is computed ONCE in XLA and fed to the kernel — leaf-prior renormalization
(MCTS._renormalize) and root Dirichlet mixing (MCTS._root_noisy_prior).
Inside the kernel all arithmetic on search statistics is elementwise IEEE
(visit sums are exact small integers in float32), so the fused search is
bit-identical to MCTS.search: same trees, same visit counts, same values.
tests/test_fused_mcts.py asserts exact equality of visits / value sums /
children / priors against the XLA path.

Scope: gravity Connect-N with board at most 8x8 (one VPU tile per game).
Chess-sized action spaces keep the general gather path in search/mcts.py.

Reference semantics preserved (same citations as search/mcts.py): PUCT
scoring and lowest-index tie-breaks (mcts/mcts.py:39-68), per-simulation
root Dirichlet (mcts.py:70-85), negamax backup with terminal-leaf rewards
(mcts.py:163-179), no-backup first simulation (mcts.py:170-180).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from custom_alphazero_tpu.config import MCTSConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.search.mcts import MCTS

# Select-loop stop codes (identical to search/mcts.py).
_CONTINUE = 0
_NEW = 1
_UNEXPANDED = 2
_TERMINAL = 3

_PH = 8  # padded board height (sublanes of one VPU tile)
_PW = 8  # padded board width (lanes)


class _Carry(NamedTuple):
    """Per-game tree buffers threaded through the wave loop (all float32;
    node indices and visit counts are small integers, exact in f32)."""

    prior: jnp.ndarray        # (B, N*A) legal-masked renormalized priors
    children: jnp.ndarray     # (B, N*A) child node id, -1 unvisited
    visits: jnp.ndarray       # (B, N*A) edge visit counts
    value_sum: jnp.ndarray    # (B, N*A) summed backed-up edge values
    parent: jnp.ndarray       # (B, N)
    parent_action: jnp.ndarray  # (B, N)
    expanded: jnp.ndarray     # (B, N) 0/1
    is_terminal: jnp.ndarray  # (B, N) 0/1
    reward: jnp.ndarray       # (B, N) mover reward at node creation
    node_count: jnp.ndarray   # (B, 1)
    leaf: jnp.ndarray         # (B, 1) leaf of the latest select
    leaf_terminal: jnp.ndarray  # (B, 1) 0/1


def _wave_kernel(
    # scalar-prefetch
    wave_ref,                     # (1,) int32 in SMEM
    # inputs
    mixed_ref,                    # (G, A) root prior after Dirichlet mix
    renormed_ref,                 # (G, A) renormalized leaf priors (wave-1)
    value_ref,                    # (G, 1) net value of leaf (wave-1)
    root_board_ref,               # (G, PH, PW) root boards, mover = +1
    # carry (aliased in/out)
    prior_ref, children_ref, visits_ref, value_sum_ref,
    parent_ref, parent_action_ref, expanded_ref, is_terminal_ref, reward_ref,
    node_count_ref, leaf_ref, leaf_terminal_ref,
    # outputs
    o_prior, o_children, o_visits, o_value_sum,
    o_parent, o_parent_action, o_expanded, o_is_terminal, o_reward,
    o_node_count, o_leaf, o_leaf_terminal,
    leaf_board_ref,               # (G, PH, PW)
    *,
    num_nodes: int,
    num_actions: int,
    height: int,
    width: int,
    n_in_row: int,
    c_puct: float,
    simulations: int,
):
    n, a = num_nodes, num_actions
    na = n * a
    g = mixed_ref.shape[0]
    wave = wave_ref[0]

    def fiota(shape, dim):
        # Mosaic iota is integer-only; search indices are small ints, exact
        # in float32.
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
            jnp.float32
        )

    iota_na = fiota((g, na), 1)
    iota_n = fiota((g, n), 1)
    row_of_edge = jnp.floor(iota_na / a)  # exact: small ints
    col_of_edge = iota_na - row_of_edge * a
    # Constant fold matrix F[k, j] = 1 iff k % a == j: one MXU matmul turns a
    # row-masked (G, N*A) array into its compact (G, A) row.
    edge_k = fiota((na, a), 0)
    fold = (edge_k - jnp.floor(edge_k / a) * a == fiota((na, a), 1)).astype(
        jnp.float32
    )

    def read_node(ref, node):
        """(G, 1) entry `node` of a (G, N) per-node buffer."""
        return jnp.sum(
            jnp.where(iota_n == node, ref[...], 0.0), axis=1, keepdims=True
        )

    def edge_onehot(node, action):
        return (iota_na == node * a + action).astype(jnp.float32)

    # ---- phase A: expand + backup the previous wave's leaf -----------------
    @pl.when(wave > 0)
    def _phase_a():
        leaf = leaf_ref[...]                     # (G, 1) f32
        leaf_term = leaf_terminal_ref[...] > 0.0  # (G, 1) bool
        leaf_expanded = read_node(expanded_ref, leaf) > 0.0
        do = jnp.logical_and(
            jnp.logical_not(leaf_expanded), jnp.logical_not(leaf_term)
        )  # (G, 1)

        # Write the renormalized prior row and mark expanded.
        row_sel = jnp.logical_and(row_of_edge == leaf, do)
        tiled = jnp.dot(
            renormed_ref[...], fold.T, preferred_element_type=jnp.float32
        )  # (G, N*A): value at edge k is renormed[:, k % a]
        prior_ref[...] = jnp.where(row_sel, tiled, prior_ref[...])
        expanded_ref[...] = jnp.where(
            jnp.logical_and(iota_n == leaf, do), 1.0, expanded_ref[...]
        )

        # Negamax backup along the parent chain (mcts.py:163-179).
        leaf_reward = read_node(reward_ref, leaf)
        value = jnp.where(leaf_term, leaf_reward, -value_ref[...])  # (G, 1)

        # Hard iteration bound: parents are strictly older than children,
        # so a chain is at most num_nodes long — the bound turns any
        # would-be corruption into bounded work instead of a TPU hang.
        def bcond(c):
            bnode, _, it = c
            return jnp.logical_and(jnp.any(bnode > 0.0), it < num_nodes)

        def bbody(c):
            bnode, bvalue, it = c
            active = bnode > 0.0
            parent = read_node(parent_ref, bnode)
            paction = read_node(parent_action_ref, bnode)
            sel = jnp.where(active, edge_onehot(parent, paction), 0.0)
            visits_ref[...] = visits_ref[...] + sel
            value_sum_ref[...] = value_sum_ref[...] + sel * bvalue
            return jnp.where(active, parent, bnode), -bvalue, it + 1

        jax.lax.while_loop(bcond, bbody, (leaf, value, jnp.int32(0)))

    # ---- phase B: select + create this wave's leaf -------------------------
    @pl.when(wave < simulations)
    def _phase_b():
        board0 = root_board_ref[...]  # (G, PH, PW)
        heights0 = jnp.sum(jnp.abs(board0), axis=1)  # (G, PW) stones/col
        full0 = jnp.sum(heights0, axis=1, keepdims=True)  # (G, 1) plies

        iota_r = fiota((g, _PH, _PW), 1)
        iota_c = fiota((g, _PH, _PW), 2)
        iota_w = fiota((g, _PW), 1)

        def place(board, heights, action):
            """Drop the mover's stone in column `action`; returns the
            un-mirrored board (mover = +1) — caller negates to mirror."""
            col = action  # (G, 1)
            h_col = jnp.sum(
                jnp.where(iota_w == col, heights, 0.0), axis=1, keepdims=True
            )
            row = (height - 1.0) - h_col
            row = jnp.clip(row, 0.0, height - 1.0)
            cell = jnp.logical_and(
                iota_r == row[:, :, None], iota_c == col[:, :, None]
            )
            placed = board + cell.astype(jnp.float32)
            new_heights = heights + jnp.where(iota_w == col, 1.0, 0.0)
            return placed, new_heights

        # Root prior row with the Dirichlet mix spread over edge lanes 0..A-1
        # (one matmul per wave, hoisted out of the descent loop).
        mixed_tiled = jnp.dot(
            mixed_ref[...], fold.T, preferred_element_type=jnp.float32
        )

        def ucb_best(node):
            """Lowest-index PUCT argmax, computed over all N*A edge lanes of
            the masked row — pure VPU, no per-level compaction matmuls. All
            row-local values are identical to the (G, A) formulation and the
            visit sums are exact integers, so selection is bit-identical to
            MCTS._ucb_action (mcts.py:39-68)."""
            rowmask = row_of_edge == node
            prior = jnp.where(node == 0.0, mixed_tiled, prior_ref[...])
            nv = visits_ref[...]
            w = value_sum_ref[...]
            # Unvisited edges have w == 0 exactly, so w / max(nv, 1) == 0
            # there — same values as the reference's explicit nv > 0 guard.
            q = w / jnp.maximum(nv, 1.0)
            sum_nv = jnp.sum(
                jnp.where(rowmask, nv, 0.0), axis=-1, keepdims=True
            )
            u = c_puct * prior * jnp.sqrt(sum_nv) / (1.0 + nv)
            neg_inf = jnp.float32(jnp.finfo(jnp.float32).min)
            score = jnp.where(
                jnp.logical_and(rowmask, prior > 0.0), q + u, neg_inf
            )
            # First-max argmax = lowest-index tie-break (mcts.py:64-68).
            best_edge = jnp.argmax(score, axis=-1, keepdims=True).astype(
                jnp.float32
            )
            # All-illegal row (never for expanded nodes): argmax over -inf
            # gives lane 0 → clamp to action 0 like the general path.
            return jnp.maximum(best_edge - node * a, 0.0), best_edge

        # Bounded like the backup walk: children are strictly newer than
        # parents, so a descent is at most num_nodes levels.
        def scond(c):
            _, _, code, _, _, _, it = c
            return jnp.logical_and(
                jnp.any(code == _CONTINUE), it < num_nodes
            )

        def sbody(c):
            node, action, code, board, heights, full, it = c
            best, best_edge = ucb_best(node)
            child = jnp.sum(
                jnp.where(iota_na == best_edge, children_ref[...], 0.0),
                axis=-1,
                keepdims=True,
            )
            node_term = read_node(is_terminal_ref, node) > 0.0
            node_exp = read_node(expanded_ref, node) > 0.0
            cont = code == _CONTINUE
            new_code = jnp.where(
                jnp.logical_not(cont),
                code,
                jnp.where(
                    node_term,
                    jnp.float32(_TERMINAL),
                    jnp.where(
                        jnp.logical_not(node_exp),
                        jnp.float32(_UNEXPANDED),
                        jnp.where(
                            child == -1.0,
                            jnp.float32(_NEW),
                            jnp.float32(_CONTINUE),
                        ),
                    ),
                ),
            )
            action = jnp.where(cont, best, action)
            descend = new_code == _CONTINUE
            placed, new_heights = place(board, heights, action)
            mirrored = -placed
            d3 = descend[:, :, None]
            board = jnp.where(d3, mirrored, board)
            heights = jnp.where(descend, new_heights, heights)
            full = jnp.where(descend, full + 1.0, full)
            node = jnp.where(descend, child, node)
            return node, action, new_code, board, heights, full, it + 1

        zero = jnp.zeros((g, 1), jnp.float32)
        node, action, code, board, heights, full, _ = jax.lax.while_loop(
            scond,
            sbody,
            (zero, zero, zero, board0, heights0, full0, jnp.int32(0)),
        )

        # CREATE the selected child (code == _NEW).
        new = jnp.logical_and(
            code == _NEW, node_count_ref[...] < jnp.float32(n)
        )  # (G, 1)
        slot = node_count_ref[...]
        placed, _ = place(board, heights, action)
        mover = (placed == 1.0).astype(jnp.float32) * (iota_c < width) * (
            iota_r < height
        )

        # n-in-a-row over the mover's stones, via static window sums. All
        # reductions stay >= 2-D (Mosaic layouts want 2-D vectors).
        k = n_in_row

        def peak(sums3d):
            return jnp.max(jnp.max(sums3d, axis=2), axis=1, keepdims=True)

        h_sum = sum(mover[:, :, i : _PW - k + 1 + i] for i in range(k))
        v_sum = sum(mover[:, i : _PH - k + 1 + i, :] for i in range(k))
        d_sum = sum(
            mover[:, i : _PH - k + 1 + i, i : _PW - k + 1 + i] for i in range(k)
        )
        a_sum = sum(
            mover[:, i : _PH - k + 1 + i, k - 1 - i : _PW - i] for i in range(k)
        )
        best_line = jnp.maximum(
            jnp.maximum(peak(h_sum), peak(v_sum)),
            jnp.maximum(peak(d_sum), peak(a_sum)),
        )
        win = best_line > k - 0.5  # (G, 1)

        filled = full + 1.0 >= jnp.float32(height * width)
        child_term = jnp.logical_or(win, filled)
        child_reward = jnp.where(win, 1.0, 0.0)
        child_board = -placed

        newf = new.astype(jnp.float32)
        parent_ref[...] = jnp.where(
            jnp.logical_and(iota_n == slot, new), node, parent_ref[...]
        )
        parent_action_ref[...] = jnp.where(
            jnp.logical_and(iota_n == slot, new), action, parent_action_ref[...]
        )
        children_ref[...] = jnp.where(
            jnp.logical_and(row_of_edge == node, jnp.logical_and(
                col_of_edge == action, new)),
            slot,
            children_ref[...],
        )
        is_terminal_ref[...] = jnp.where(
            jnp.logical_and(iota_n == slot, new),
            child_term.astype(jnp.float32),
            is_terminal_ref[...],
        )
        reward_ref[...] = jnp.where(
            jnp.logical_and(iota_n == slot, new), child_reward, reward_ref[...]
        )
        node_count_ref[...] = node_count_ref[...] + newf

        node_term = read_node(is_terminal_ref, node) > 0.0
        leaf_ref[...] = jnp.where(new, slot, node)
        leaf_terminal_ref[...] = jnp.where(
            new, child_term.astype(jnp.float32), node_term.astype(jnp.float32)
        )
        leaf_board_ref[...] = jnp.where(new[:, :, None], child_board, board)

    @pl.when(jnp.logical_not(wave < simulations))
    def _no_select():
        leaf_board_ref[...] = jnp.zeros_like(leaf_board_ref)

    # Copy carries to the aliased outputs (no-op moves, same buffers).
    o_prior[...] = prior_ref[...]
    o_children[...] = children_ref[...]
    o_visits[...] = visits_ref[...]
    o_value_sum[...] = value_sum_ref[...]
    o_parent[...] = parent_ref[...]
    o_parent_action[...] = parent_action_ref[...]
    o_expanded[...] = expanded_ref[...]
    o_is_terminal[...] = is_terminal_ref[...]
    o_reward[...] = reward_ref[...]
    o_node_count[...] = node_count_ref[...]
    o_leaf[...] = leaf_ref[...]
    o_leaf_terminal[...] = leaf_terminal_ref[...]


def supports(env, cfg: MCTSConfig) -> bool:
    """True if the fused kernel can run this (env, search config)."""
    return (
        isinstance(env, ConnectN)
        and env.cfg.gravity
        and env.cfg.height <= _PH
        and env.cfg.width <= _PW
        and not cfg.max_nodes
    )


class FusedConnectNSearch:
    """Drop-in fast path for ``MCTS.search`` on gravity Connect-N.

    ``search_root_stats`` returns the root edge statistics — everything
    self-play needs (pi from visits, reference mcts.py:190-197) — without
    materializing the general Tree. Bit-identical to the XLA path.
    """

    def __init__(
        self,
        env: ConnectN,
        cfg: MCTSConfig = MCTSConfig(),
        block_games: int = 256,
        interpret: Optional[bool] = None,
    ):
        if not env.cfg.gravity:
            raise ValueError("fused search supports gravity Connect-N only")
        if env.cfg.height > _PH or env.cfg.width > _PW:
            raise ValueError("fused search supports boards up to 8x8")
        if cfg.max_nodes:
            raise ValueError("fused search uses fresh trees (max_nodes=0)")
        self.env = env
        self.cfg = cfg
        self.block_games = block_games
        # In/out blocks double-buffer in VMEM; the default 16 MB scoped
        # limit is a hair too small at 256 games/block.
        self._vmem_limit = 48 * 1024 * 1024
        self._mcts = MCTS(env, cfg)  # reuse _renormalize/_root_noisy_prior
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def _kernel_call(self, num_nodes: int, batch: int, simulations: int):
        env, cfg = self.env, self.cfg
        n, a = num_nodes, env.num_actions
        g = batch
        if batch > self.block_games:
            # Largest divisor of the batch within the block budget (batches
            # are powers of two in practice, so this finds block_games).
            g = max(
                d for d in range(1, self.block_games + 1) if batch % d == 0
            )
        grid = (batch // g,)

        kernel = functools.partial(
            _wave_kernel,
            num_nodes=n,
            num_actions=a,
            height=env.cfg.height,
            width=env.cfg.width,
            n_in_row=env.cfg.n,
            c_puct=cfg.c_puct,
            simulations=simulations,
        )

        def spec(*shape):
            # Index maps receive (*grid_ids, *scalar_prefetch_refs).
            return pl.BlockSpec(
                (g,) + shape,
                lambda i, *_: (i,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        edge = spec(n * a)
        node = spec(n)
        one = spec(1)
        board = spec(_PH, _PW)
        carry_specs = [edge] * 4 + [node] * 5 + [one] * 3

        def shape(*s):
            return jax.ShapeDtypeStruct((batch,) + s, jnp.float32)

        carry_shapes = (
            [shape(n * a)] * 4 + [shape(n)] * 5 + [shape(1)] * 3
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec(a), spec(a), one, board] + carry_specs,
            out_specs=carry_specs + [board],
        )
        # Operand i (0-based, after the scalar-prefetch arg) aliases output
        # o: carries start at input 4 and at output 0.
        aliases = {1 + 4 + i: i for i in range(12)}
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=carry_shapes + [shape(_PH, _PW)],
            input_output_aliases=aliases,
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                # In/out blocks double-buffer in VMEM; the default 16 MB
                # scoped limit is a hair too small at 256 games/block.
                vmem_limit_bytes=self._vmem_limit,
            ),
        )

    def search_root_stats(
        self, root_states, evaluate_fn, rng, simulations: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run `simulations` PUCT sims; returns (root_visits int32 (B, A),
        root_value_sum float32 (B, A)) — identical to
        ``MCTS.search`` + ``root_child_visits`` on the same inputs."""
        env, cfg = self.env, self.cfg
        h, w = env.cfg.height, env.cfg.width
        a = env.num_actions
        batch = jax.tree.leaves(root_states)[0].shape[0]
        num_nodes = simulations + 1
        call = self._kernel_call(num_nodes, batch, simulations)

        # Root boards, padded into one (8, 8) VPU tile per game.
        root_board = jnp.zeros((batch, _PH, _PW), jnp.float32)
        root_board = root_board.at[:, :h, :w].set(
            root_states.board.astype(jnp.float32)
        )
        root_terminal = jax.vmap(env.is_terminal)(root_states)
        root_value = jax.vmap(env.terminal_value)(root_states)

        n = num_nodes
        carry = _Carry(
            prior=jnp.zeros((batch, n * a), jnp.float32),
            children=jnp.full((batch, n * a), -1.0, jnp.float32),
            visits=jnp.zeros((batch, n * a), jnp.float32),
            value_sum=jnp.zeros((batch, n * a), jnp.float32),
            parent=jnp.zeros((batch, n), jnp.float32)
            .at[:, 0]
            .set(-1.0),
            parent_action=jnp.zeros((batch, n), jnp.float32),
            expanded=jnp.zeros((batch, n), jnp.float32),
            is_terminal=jnp.zeros((batch, n), jnp.float32)
            .at[:, 0]
            .set(root_terminal.astype(jnp.float32)),
            reward=jnp.zeros((batch, n), jnp.float32)
            .at[:, 0]
            .set(-root_value),
            node_count=jnp.ones((batch, 1), jnp.float32),
            leaf=jnp.zeros((batch, 1), jnp.float32),
            leaf_terminal=root_terminal.astype(jnp.float32)[:, None],
        )
        root_live = ~root_terminal  # (B,)

        def observe_board(b):
            """env.observe on the padded leaf board (connect_n.py:169-179)."""
            core = b[:, :h, :w]
            return jnp.stack(
                [
                    (core == 0).astype(jnp.float32),
                    (core == 1).astype(jnp.float32),
                    (core == -1).astype(jnp.float32),
                    jnp.ones_like(core),
                ],
                axis=-1,
            )

        # Root Dirichlet noise, SAME RNG stream as the general path
        # (search/mcts.py::search): one split for the plan key before the
        # loop, one (unused-result) split per wave, per-wave fold_in
        # draws (noise_plan/wave_noise — jax.random.gamma and (S, B, A)
        # presample blocks both kernel-fault the TPU at chess scale).
        # Fused wave wv's select corresponds to general sim i=wv, so the
        # draw is folded on wv (the extra pipeline-drain wave S clamps to
        # S-1; its select result is discarded).
        rng, k_noise_plan = jax.random.split(rng)
        noise_plan = self._mcts.noise_plan(k_noise_plan)

        def wave(wv, state):
            carry, leaf_board, probs, value, rng, root_prior = state
            rng, knoise = jax.random.split(rng)
            # Leaf prior renormalization in XLA — same op as the general path.
            legal = (leaf_board[:, 0, :w] == 0) & (
                carry.leaf_terminal[:, :1] == 0
            )
            renormed = self._mcts._renormalize(probs, legal)
            # Track the root's stored prior row (written at wave 1).
            root_prior = jnp.where(
                ((wv == 1) & root_live)[:, None], renormed, root_prior
            )
            wave_gamma = self._mcts.wave_noise(
                noise_plan, jnp.minimum(wv, simulations - 1), batch
            )
            mixed = self._mcts._root_noisy_prior(
                root_prior, knoise, gamma=wave_gamma
            )
            outs = call(
                jnp.full((1,), wv, jnp.int32),
                mixed,
                renormed,
                value[:, None],
                root_board,
                *carry,
            )
            carry = _Carry(*outs[:12])
            leaf_board = outs[12]
            obs = observe_board(leaf_board)
            probs, value = evaluate_fn(obs)
            return carry, leaf_board, probs, value, rng, root_prior

        init = (
            carry,
            jnp.zeros((batch, _PH, _PW), jnp.float32),
            jnp.zeros((batch, a), jnp.float32),
            jnp.zeros((batch,), jnp.float32),
            rng,
            jnp.zeros((batch, a), jnp.float32),
        )
        final = jax.lax.fori_loop(0, simulations + 1, wave, init)
        carry = final[0]
        root_visits = carry.visits[:, :a].astype(jnp.int32)
        root_value_sum = carry.value_sum[:, :a]
        return root_visits, root_value_sum
