"""MCTS tree visualization.

Parity with the reference's ``MctsVisualizer``
(/root/reference/custom_alphazero/visualize_mcts.py): breadth-first walk of
the tree, nodes rendered as monospace board diagrams, edges annotated with
UCT / Q (exploitation) / U (exploration) / P (prior) / N (visits) and the
visit share among siblings; the played edge is red, greedily-played edges
are bold; unvisited branches are pruned. Works offline from the array tree
a search returns (a dump of the N/W/P node arrays — SURVEY.md §5), emitting
DOT text with no hard dependency; rendering to PDF uses the `graphviz`
package when available.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from custom_alphazero_tpu.search.mcts import Tree, UNVISITED


def _board_label(board: np.ndarray) -> str:
    """ASCII board like the reference repr_graphviz (connect_n/board.py:55-67)
    — also works for the chess int8 array."""
    symbols = {0: " . ", 1: " X ", -1: " O "}
    chess = {1: " P ", 2: " N ", 3: " B ", 4: " R ", 5: " Q ", 6: " K ",
             -1: " p ", -2: " n ", -3: " b ", -4: " r ", -5: " q ", -6: " k ",
             0: " . "}
    table = symbols if set(np.unique(board)) <= {-1, 0, 1} else chess
    rows = ["".join(table[int(v)] for v in row) for row in board]
    return "\\n".join(rows)


def _replay_boards(env, t: Tree) -> np.ndarray:
    """Reconstruct each node's board by replaying parent-action chains from
    the root (nodes are created parent-first, so one ascending pass
    suffices); the tree stores no per-node states by design. Unlinked slots
    (parent == NO_PARENT; simulations that ended on an existing terminal
    node) get a placeholder and are never rendered."""
    import jax.numpy as jnp

    step = jax.jit(env.step)
    states = [jax.tree.map(jnp.asarray, t.root_state)]
    boards = [np.asarray(t.root_state.board)]
    for i in range(1, t.parent.shape[0]):
        parent = int(t.parent[i])
        if parent < 0:
            states.append(states[0])
            boards.append(boards[0])
            continue
        child, _ = step(states[parent], jnp.int32(t.parent_action[i]))
        states.append(child)
        boards.append(np.asarray(child.board))
    return np.stack(boards)


def _children_table(t: Tree, a_count: int) -> np.ndarray:
    """(N, A) child-index table (UNVISITED where absent), rebuilt from the
    parent/parent_action vectors — the tree stores no children array."""
    n = t.parent.shape[0]
    children = np.full((n, a_count), UNVISITED, np.int64)
    for c in range(1, n):
        p = int(t.parent[c])
        if p >= 0:
            children[p, int(t.parent_action[c])] = c
    return children


def tree_to_dot(
    tree: Tree,
    env,
    game_index: int = 0,
    c_puct: float = 1.5,
    min_visits: int = 1,
    played_action: Optional[int] = None,
    greedy: bool = False,
    max_nodes: int = 400,
) -> str:
    """Render one game's search tree to DOT text.

    min_visits: prune edges with fewer visits (the reference's 'light' mode
    keeps only played edges; min_visits with played_action marking subsumes
    both renders, visualize_mcts.py:107-117).
    """
    t = jax.tree.map(lambda leaf: np.asarray(leaf[game_index]), tree)
    n_alloc = t.parent.shape[0]
    boards = _replay_boards(env, t)
    a_count = env.num_actions

    lines = [
        "digraph MCTS {",
        '  node [shape=box, fontname="Courier"];',
        '  edge [fontname="Helvetica", fontsize=9];',
    ]
    emitted = set()

    def emit_node(i):
        if i in emitted:
            return
        emitted.add(i)
        label = _board_label(boards[i])
        extra = f"\\nv={t.value_evaluated[i]:+.2f}" if t.expanded[i] else ""
        lines.append(f'  n{i} [label="{label}{extra}"];')

    # BFS from the root (reference _breadth_first_edges, :37-48).
    children_flat = _children_table(t, a_count)
    if t.prior.shape[-1] != a_count:
        # Top-K compressed tree (search/mcts.py): scatter the per-node
        # (K,) value/action rows back to full width; the root keeps its
        # full row in root_prior.
        priors_flat = np.zeros((n_alloc, a_count), np.float32)
        np.put_along_axis(
            priors_flat, np.asarray(t.prior_acts), np.asarray(t.prior), -1
        )
        priors_flat[0] = np.asarray(t.root_prior)
    else:
        priors_flat = t.prior.reshape(-1, a_count)
    queue = [0]
    visited = {0}
    while queue and len(emitted) < max_nodes:
        node = queue.pop(0)
        if not t.expanded[node]:
            continue
        children = children_flat[node]
        child_visits = np.where(
            children >= 0, t.visits[np.maximum(children, 0)], 0
        )
        total = child_visits.sum()
        sqrt_total = np.sqrt(total)
        for action, child in enumerate(children):
            if child == UNVISITED or child >= n_alloc:
                continue
            nv = int(t.visits[child])
            is_played = node == 0 and played_action == action
            if nv < min_visits and not is_played:
                continue
            q = float(t.value_sum[child]) / nv if nv else 0.0
            p = float(priors_flat[node, action])
            u = c_puct * p * sqrt_total / (1 + nv)
            share = nv / total if total else 0.0
            emit_node(node)
            emit_node(child)
            attrs = [
                f'label="a={action} UCT={q + u:.2f}\\nQ={q:+.2f} U={u:.2f}'
                f'\\nP={p:.2f} N={nv} {share:.0%}"'
            ]
            if is_played:
                attrs.append("color=red")
                if greedy:
                    attrs.append("penwidth=3")
            lines.append(f"  n{node} -> n{child} [{', '.join(attrs)}];")
            if child not in visited:
                visited.add(child)
                queue.append(child)
    lines.append("}")
    return "\n".join(lines)


def save_tree(
    tree: Tree,
    env,
    path: str,
    game_index: int = 0,
    render_pdf: bool = True,
    **kwargs,
) -> str:
    """Write `<path>.dot` (and `<path>.pdf` when graphviz is available,
    mirroring save_as_pdf, visualize_mcts.py:130-137). Returns the DOT path."""
    dot = tree_to_dot(tree, env, game_index, **kwargs)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    dot_path = path + ".dot"
    with open(dot_path, "w") as fp:
        fp.write(dot)
    if render_pdf:
        try:
            import graphviz

            graphviz.Source(dot).render(path, format="pdf", cleanup=True)
        except Exception:  # noqa: BLE001 — rendering is best-effort
            pass
    return dot_path
