"""Configuration tree.

Replaces the reference's eight static config classes
(/root/reference/custom_alphazero/config.py:7-125) with a frozen-dataclass
tree supporting CLI dotted-key overrides and per-run JSON snapshots.  Default
values reproduce the reference training regime (see BASELINE.md): Connect-4
7x6 n=4 gravity, 250 sims/move, c_puct 1.5, depth-4 / 128-filter resnet,
SGD momentum 0.9 with step-ranged LR schedule, batch 256, replay cap 10k with
2.5k warmup, arena of 150 games gated at 0.55 every 50 iterations.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple


@dataclass(frozen=True)
class ConnectNConfig:
    """Board geometry for Connect-N (reference config.py:38-47)."""

    width: int = 7
    height: int = 6
    n: int = 4
    gravity: bool = True

    def __post_init__(self):
        assert 2 <= self.n <= min(self.width, self.height)

    @property
    def num_actions(self) -> int:
        # With gravity the action space is one action per column; without it,
        # one per cell ordered (x, y) column-major like the reference's
        # product(range(width), range(height)) (connect_n/board.py:130-146).
        return self.width if self.gravity else self.width * self.height


@dataclass(frozen=True)
class ChessConfig:
    """Chess engine knobs (reference config.py:26-35, chess/board.py:36-39)."""

    history_length: int = 8  # plies of board history stacked into the obs


@dataclass(frozen=True)
class MCTSConfig:
    """PUCT search (reference config.py:50-56)."""

    simulations: int = 250
    c_puct: float = 1.5
    dirichlet_alpha: float = 0.03
    dirichlet_fraction: float = 0.25
    use_dirichlet: bool = False
    # Sample moves ∝ visit counts before this fullmove number, argmax after
    # (reference self_play.py:62, config.py:55).
    greedy_from_move: int = 8
    use_solver: bool = False
    # Tree node capacity per search; the effective capacity is
    # max(max_nodes, simulations) — one slot per simulation wave is the
    # floor (search/mcts.py static slots), extra slots cost memory but
    # change nothing. 0 = exactly one slot per simulation.
    max_nodes: int = 0
    # Self-play subtree reuse between moves (the reference re-roots the tree
    # at the played child and keeps its statistics, mcts.py:207). The kept
    # subtree is compacted into a tree of capacity max(max_nodes,
    # 2*simulations); when it doesn't fit, nodes are dropped by ascending
    # edge-visit rank (search/mcts.py advance_root). Off by default: fresh
    # trees take the faster static-slot / fused-Pallas path. Arena
    # evaluation always uses fresh trees, like the reference
    # (evaluation/evaluate.py:63-84 rebuilds the tree each move).
    reuse_tree: bool = False
    # Per-node stored prior width for large action spaces: 0 = auto
    # (min(simulations, A), clamped to 256 when the action space is large
    # — see search/mcts.py MCTS.AUTO_TOPK_CLAMP), -1 = full width,
    # > 0 = explicit top-K.
    topk_actions: int = 0
    # Gumbel sequential-halving root search (search/gumbel.py) — a
    # beyond-the-reference mode for small simulation budgets: root actions
    # follow a static halving schedule over the top-m Gumbel-perturbed
    # candidates, the policy target is the improved policy (not visit
    # counts), and exploration comes from the Gumbel draw (Dirichlet noise
    # and greedy_from_move are ignored).
    use_gumbel: bool = False
    gumbel_max_considered: int = 16  # m: root candidate actions
    gumbel_c_visit: float = 50.0
    gumbel_c_scale: float = 1.0
    # Incremental edge statistics for the compressed (top-K) layout
    # (round 5, VERDICT r4 #3): maintain a (N, K) child-index table at
    # CREATE and read per-edge stats by gather from the per-child
    # visits/value_sum, instead of reconstructing (B, N, K) stats with an
    # O(C*N*K) einsum + an O(C*N) child-match every wave — the dominant
    # cost of large-tree searches (chess at 800 sims: N = 800 makes the
    # reconstruction ~170 GFLOP/wave). Bit-exact (tests/test_topk_search
    # runs both settings). Default OFF: the gathers lower pathologically
    # inside the generation ply scan on the TPU backend (the round-4
    # crasher class) — standalone searches (bench, arena) are safe.
    fast_edge_stats: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Policy-value resnet + optimizer (reference config.py:59-71)."""

    depth: int = 4
    filters: int = 128
    policy_filters: int = 2
    value_filters: int = 1
    value_hidden: int = 256
    l2: float = 1e-4
    momentum: float = 0.9
    # Piecewise-constant LR by cumulative optimizer steps: 1e-2 until 150k,
    # 1e-3 until 300k, then 1e-4 (reference config.py:64-69,
    # model/tensorflow/train.py:34-43).
    lr_boundaries: Tuple[int, ...] = (150_000, 300_000)
    lr_values: Tuple[float, ...] = (1e-2, 1e-3, 1e-4)
    batch_size: int = 256
    # Global-norm gradient clipping (0 = off, the reference behavior).
    # Needed when strong auxiliary targets (loop.solver_policy_weight)
    # train from a random init at the full initial LR: the combined
    # policy gradient can diverge within a handful of SGD steps.
    grad_clip_norm: float = 0.0
    # bfloat16 activations on the MXU; fp32 params and losses.
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class SelfPlayConfig:
    """Self-play generation (reference config.py:19-23)."""

    # Games stepped in lockstep per generation — the batch axis that replaces
    # the reference's one-game-per-process joblib fan-out (self_play.py:98-110).
    games_per_generation: int = 256
    discount: float = 1.0
    exclude_draws: bool = True
    # Continuous (auto-reset) generation: a finished game's slot restarts
    # immediately instead of idling until the lockstep batch's longest game
    # ends (in a large batch the max game length approaches the board size,
    # so absorbed slots otherwise waste ~40-60% of all search waves on
    # Connect-4). Samples are assembled per completed segment with the
    # reference's exact z construction; the trailing incomplete game is
    # dropped. Off by default: the plain mode reproduces the reference's
    # one-batch-of-games-per-iteration shape (self_play.py:85-119).
    continuous: bool = False
    # Lockstep generation scan length (the per-game ply cap): 0 = the
    # game's natural bound (W*H for Connect-N; 512 for chess, truncated
    # games scoring as draws / dropped segments — runtime/loop.py
    # max_game_plies). Chess production runs may set a shorter cap: the
    # cap sizes every per-ply generation buffer (T*B rows).
    max_plies: int = 0


@dataclass(frozen=True)
class ReplayConfig:
    """Replay buffer (reference config.py:83-84, train.py:16-38)."""

    capacity: int = 10_000
    min_size: int = 2_500
    # Bit-pack binary observation planes in the device ring (replay/codec.py,
    # exact roundtrip, ~32x less HBM — keeps chess-scale rings on device).
    compress_obs: bool = True
    # > 0: store policy targets as sparse top-K rows (replay/codec.py
    # TopKPolicyCodec). Exact whenever K >= visited root children per
    # position (<= min(simulations, legal moves)); the tail is renormalized
    # away otherwise. 0 = dense rows (reference semantics; fine for
    # Connect-4's 7 actions, ~8x HBM saving at chess's 1968).
    policy_topk: int = 0


@dataclass(frozen=True)
class ArenaConfig:
    """Candidate-vs-best evaluation gate (reference config.py:87-93)."""

    games: int = 150
    promote_threshold: float = 0.55
    evaluation_frequency: int = 50
    checkpoint_frequency: int = 50
    evaluate_with_mcts: bool = False
    evaluate_with_solver: bool = False
    deterministic: bool = False
    # Draw-heavy-arena gate (round 5; the reference gate's blind spot at
    # chess scale, VERDICT r4 weak #2): score = wins/decisives judges a
    # 2-decisive series as confidently as a 100-decisive one, so with
    # 52-62 draws of 64 games a 0.55 gate never fires and self-play data
    # comes from the random-init incumbent forever (TRAINING.md chess-r4
    # leg 1). With min_decisives > 0, a series with fewer decisive games
    # is INCONCLUSIVE: promote_when_inconclusive decides it (True =
    # AlphaZero-2017 continuous-improvement default for the fresher net,
    # False = keep the incumbent). 0 preserves reference semantics
    # (evaluate.py:106-131) exactly.
    min_decisives: int = 0
    promote_when_inconclusive: bool = False
    # Oracle veto on the head-to-head gate (round 5 c4-r5 finding: the
    # searched arena promoted a net that beats its predecessor 0.552 over
    # 248 decisives yet leaks MORE games to the perfect solver — 11 vs
    # 7-9 non-lost-opening losses on identical seed-0 openings. Relative
    # strength and oracle-optimality decouple: candidates learn lines
    # that punish nets like themselves, not lines that minimize regret
    # vs perfect play). With solver_score_veto=true (requires
    # evaluate_with_solver), a candidate that wins the arena is still
    # BLOCKED if its oracle-scored move quality is more than
    # solver_score_veto_margin below the score the incumbent posted when
    # it was promoted. The running best score lives on the coordinator
    # host; the veto is broadcast so SPMD hosts agree. Not persisted
    # across resume (first post-resume promotion re-seeds it).
    solver_score_veto: bool = False
    solver_score_veto_margin: float = 0.02


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh topology: games/batch sharded over `data`, optional tensor
    parallelism over `model` (replaces the HTTP/joblib topology knobs,
    reference config.py:11-16)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # 0 = use all local devices on the data axis.
    data_parallelism: int = 0
    model_parallelism: int = 1


@dataclass(frozen=True)
class LoopConfig:
    """Actor-learner loop cadence. The reference runs self-play and training
    as free-running processes (self_play.py:136, train.py:41); the SPMD loop
    couples them with an explicit train/generate ratio."""

    generations: int = 0  # 0 = run forever
    train_iterations_per_generation: int = 8
    checkpoint_replay: bool = True
    # Save the generation's (states, policies, values) like the reference's
    # per-iteration samples.npz (self_play.py:170-178); 0 disables.
    samples_checkpoint_frequency: int = 1
    # Every N generations, render one MCTS search tree (DOT/PDF) like the
    # reference's visualize_mcts_iteration (utils.py:136-162); 0 disables.
    visualize_frequency: int = 0
    # Solver-distilled auxiliary value target (beyond-the-reference; the
    # reference's solver is an MCTS prior/eval oracle only,
    # c4_exact_solver.py:51-85): path to an .npz of exact-solver-labeled
    # positions (tools/distill --labels_out format: obs (N,H,W,C), z (N,))
    # whose EXACT game-theoretic values are mixed into every train step as
    # an extra value-head MSE term. Motivation: with z in {-1,0,1} outcome
    # targets the value head's optimum is E[z|s], fractionally compressed
    # under sampling-noisy self-play; the same architecture reaches 0.682
    # held-out value accuracy on exact labels vs 0.247 from outcomes
    # (TRAINING.md, results/logs/distill_value.log round 3). Empty = off.
    solver_labels_path: str = ""
    solver_value_weight: float = 0.25
    # Auxiliary labeled-POLICY cross-entropy weight (round 5): when > 0
    # and the solver_labels_path npz carries a ``pi`` array (one-hot
    # oracle/engine-labeled moves — e.g. mating moves from
    # tools/chess_tactics --generate, or the Connect-4 oracle best move
    # from tools/distill), the same per-step label subset also trains
    # the policy head. The chess prior-starvation antidote that doesn't
    # need co-evolution to discover tactics first. 0 = off.
    solver_policy_weight: float = 0.0
    # Sample-reuse guardrail (round 5, VERDICT r4 weak #4): the loop
    # emits train/sample_reuse = trained samples / fresh samples per
    # generation and warns when it exceeds 1. With max_sample_reuse > 0,
    # the per-generation train iterations are additionally clamped so
    # reuse stays <= the bound (at least 1 iteration) — the guardrail
    # that would have caught c4-r4 leg 2's silent 0.45->0.36 regression
    # (32 iters/gen against ~5.8k fresh samples). 0 = warn only.
    max_sample_reuse: float = 0.0
    solver_value_batch: int = 256


@dataclass(frozen=True)
class RunConfig:
    """Run identity and output layout (reference paths.py, config.py:96-125)."""

    results_dir: str = "results"
    run_id: str = ""  # empty = timestamp at startup
    seed: int = 0
    # Stall watchdog: if no generation completes for this many minutes the
    # process exits with status 42 so a supervisor can restart it (training
    # checkpoint-resumes, io/checkpoint.py). Guards against wedged device
    # tunnels/host hangs — a failure mode the reference has no answer to
    # (SURVEY.md §5 failure detection). 0 disables.
    watchdog_minutes: float = 0.0
    # Supervisor-liveness compile grace: for up to this many minutes after
    # loop entry a daemon thread keeps the supervisor's heartbeat file
    # fresh, covering generation-0 trace+compile (minutes at chess scale —
    # PARITY.md documents >7-14 min compiles) and the first arena compile.
    # Without it a supervisor with liveness_timeout_minutes=4 would kill a
    # healthy chess-scale child mid-compile, restart, recompile, and kill
    # again until the restart budget exhausts (ADVICE r2). The thread
    # stops as soon as the first generation completes (steady-state wedge
    # detection is then the in-process watchdog's job) or when the grace
    # budget runs out — so a genuine pre-steady-state wedge is still
    # caught, just later. 0 disables (pre-round-3 behavior).
    compile_grace_minutes: float = 30.0


@dataclass(frozen=True)
class Config:
    game: str = "connect_n"  # "connect_n" | "chess"
    connect_n: ConnectNConfig = field(default_factory=ConnectNConfig)
    chess: ChessConfig = field(default_factory=ChessConfig)
    mcts: MCTSConfig = field(default_factory=MCTSConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    self_play: SelfPlayConfig = field(default_factory=SelfPlayConfig)
    replay: ReplayConfig = field(default_factory=ReplayConfig)
    arena: ArenaConfig = field(default_factory=ArenaConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    run: RunConfig = field(default_factory=RunConfig)


# ---------------------------------------------------------------------------
# Overrides & serialization
# ---------------------------------------------------------------------------

def _coerce(value: str, target: Any) -> Any:
    """Coerce a CLI string to the type of the field it replaces."""
    if isinstance(target, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(target, int):
        return int(value)
    if isinstance(target, float):
        return float(value)
    if isinstance(target, tuple):
        parts = [p for p in value.strip("()[] ").split(",") if p]
        elem = target[0] if target else 0
        return tuple(_coerce(p.strip(), elem) for p in parts)
    return value


def validate(config: Config) -> Config:
    """Reject foot-gun configs at parse time rather than letting programs
    silently adjust (returns the config for chaining)."""
    m = config.model
    if len(m.lr_values) != len(m.lr_boundaries) + 1:
        raise ValueError(
            f"model.lr_values needs exactly len(lr_boundaries)+1 entries: "
            f"got {len(m.lr_values)} values for {len(m.lr_boundaries)} "
            "boundaries"
        )
    if any(b2 <= b1 for b1, b2 in zip(m.lr_boundaries, m.lr_boundaries[1:])):
        raise ValueError(
            f"model.lr_boundaries must be strictly increasing: {m.lr_boundaries}"
        )
    if config.arena.solver_score_veto and not (
        config.arena.evaluate_with_solver and config.game == "connect_n"
    ):
        raise ValueError(
            "arena.solver_score_veto needs arena.evaluate_with_solver=true "
            "on connect_n (the oracle scores arena moves there)"
        )
    s = config.mcts
    if s.max_nodes and s.max_nodes < s.simulations:
        # Non-reuse search would silently take max(max_nodes, simulations)
        # (search/mcts.py static slots); make the conflict explicit.
        raise ValueError(
            f"mcts.max_nodes={s.max_nodes} < mcts.simulations="
            f"{s.simulations}: the tree needs one slot per simulation "
            "(set max_nodes=0 for auto)"
        )
    if s.topk_actions < -1:
        raise ValueError(
            f"mcts.topk_actions={s.topk_actions}: use 0 (auto), -1 (full "
            "width) or an explicit positive top-K prior width"
        )
    if s.simulations < 1:
        raise ValueError(f"mcts.simulations={s.simulations} must be >= 1")
    return config


def apply_overrides(config: Config, overrides: dict[str, str]) -> Config:
    """Apply {"mcts.simulations": "64", ...} dotted-key overrides."""
    for dotted, raw in overrides.items():
        keys = dotted.split(".")
        # Walk down to the leaf dataclass, then rebuild the spine.
        objs = [config]
        for key in keys[:-1]:
            objs.append(getattr(objs[-1], key))
        leaf_owner = objs[-1]
        current = getattr(leaf_owner, keys[-1])
        value = _coerce(raw, current) if isinstance(raw, str) else raw
        updated = dataclasses.replace(leaf_owner, **{keys[-1]: value})
        for obj, key in zip(reversed(objs[:-1]), reversed(keys[:-1])):
            updated = dataclasses.replace(obj, **{key: updated})
        config = updated
    return validate(config)


def parse_cli_overrides(argv: list[str]) -> dict[str, str]:
    """Parse ["--mcts.simulations=64", ...] style args."""
    overrides = {}
    for arg in argv:
        if not arg.startswith("--") or "=" not in arg:
            raise ValueError(f"Expected --dotted.key=value, got {arg!r}")
        key, _, value = arg[2:].partition("=")
        overrides[key] = value
    return overrides


def to_dict(config) -> dict:
    return dataclasses.asdict(config)


def to_json(config: Config) -> str:
    return json.dumps(to_dict(config), indent=2, sort_keys=True)


def from_dict(data: dict, cls=Config):
    """Rebuild a (nested) config dataclass from a plain dict."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        value = data[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(value, dict):
            kwargs[f.name] = from_dict(value, f.type)
        elif isinstance(value, list):
            kwargs[f.name] = tuple(value)
        else:
            kwargs[f.name] = value
    return cls(**kwargs)


# Resolve dataclass field types that are strings (from __future__ annotations).
_FIELD_TYPES = {
    "connect_n": ConnectNConfig, "chess": ChessConfig, "mcts": MCTSConfig,
    "model": ModelConfig, "self_play": SelfPlayConfig, "replay": ReplayConfig,
    "arena": ArenaConfig, "mesh": MeshConfig, "loop": LoopConfig,
    "run": RunConfig,
}


def from_json(text: str) -> Config:
    data = json.loads(text)
    kwargs: dict[str, Any] = {}
    for f in dataclasses.fields(Config):
        if f.name not in data:
            continue
        value = data[f.name]
        sub = _FIELD_TYPES.get(f.name)
        if sub is not None and isinstance(value, dict):
            sub_kwargs = {
                sf.name: (tuple(value[sf.name])
                          if isinstance(value.get(sf.name), list)
                          else value[sf.name])
                for sf in dataclasses.fields(sub) if sf.name in value
            }
            kwargs[f.name] = sub(**sub_kwargs)
        else:
            kwargs[f.name] = value
    return Config(**kwargs)
