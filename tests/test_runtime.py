"""Runtime: self-play sample semantics, replay FIFO, train step, arena
gating, checkpoint integrity, metrics files."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.config import (
    ArenaConfig,
    ConnectNConfig,
    MCTSConfig,
    ModelConfig,
    SelfPlayConfig,
)
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.replay.buffer import replay_add, replay_init, replay_sample
from custom_alphazero_tpu.runtime.arena import make_arena_fn
from custom_alphazero_tpu.runtime.selfplay import SelfPlayBatch, make_selfplay_fn
from custom_alphazero_tpu.runtime.train import (
    init_train_state,
    make_evaluate_fn,
    make_train_step,
)

ENV = ConnectN(ConnectNConfig())
A = ENV.num_actions
SMALL_MODEL = ModelConfig(depth=1, filters=8, value_hidden=16)


def uniform_eval(obs):
    b = obs.shape[0]
    return jnp.ones((b, A)) / A, jnp.zeros((b,))


@pytest.fixture(scope="module")
def selfplay_out():
    sp = make_selfplay_fn(
        ENV, MCTSConfig(simulations=12), SelfPlayConfig(exclude_draws=False),
        max_plies=42,
    )
    fn = jax.jit(lambda k: sp(uniform_eval, k, 8))
    return jax.device_get(fn(jax.random.PRNGKey(0)))


def test_selfplay_sample_semantics(selfplay_out):
    batch, stats = selfplay_out
    T, B = 42, 8
    valid = batch.valid.reshape(T, B)
    z = batch.value.reshape(T, B)
    pi = batch.policy.reshape(T, B, A)
    lengths = valid.sum(0)
    assert int(stats.games) == B
    assert (lengths > 6).all() and (lengths <= 42).all()
    for g in range(B):
        L = int(lengths[g])
        # Liveness mask is a prefix.
        assert valid[:L, g].all() and not valid[L:, g].any()
        # z alternates sign from the end: z_{L-1} = result, z_{L-2} = -result.
        result = z[L - 1, g]
        assert result in (0.0, 1.0)
        for t in range(L):
            d = L - 1 - t
            assert z[t, g] == result * (-1) ** d
        # Policies on live plies are distributions over legal columns.
        np.testing.assert_allclose(pi[:L, g].sum(-1), 1.0, atol=1e-5)
    # Stats bookkeeping.
    won = (np.abs(z).max(axis=0) > 0) & (lengths > 0)
    assert int(stats.draws) == int((~won).sum())
    assert int(stats.wins_first_mover) == int((won & (lengths % 2 == 1)).sum())


def test_selfplay_discount():
    sp = make_selfplay_fn(
        ENV, MCTSConfig(simulations=8),
        SelfPlayConfig(discount=0.9, exclude_draws=True), max_plies=42,
    )
    batch, _ = jax.device_get(jax.jit(lambda k: sp(uniform_eval, k, 4))(
        jax.random.PRNGKey(1)))
    valid = batch.valid.reshape(42, 4)
    z = batch.value.reshape(42, 4)
    for g in range(4):
        L = int(valid[:, g].sum())
        if L == 0:
            continue  # draw excluded
        result = z[L - 1, g]
        assert result == 1.0  # draws excluded -> only wins remain
        for t in range(L):
            d = L - 1 - t
            np.testing.assert_allclose(
                z[t, g], result * (-1) ** d * 0.9 ** d, rtol=1e-5
            )


def test_replay_fifo_and_sampling():
    rb = replay_init(16, ENV.obs_shape, A)
    n = 10
    mk = lambda start, count, valid_mask: SelfPlayBatch(
        obs=jnp.ones((count,) + ENV.obs_shape) * jnp.arange(start, start + count)[:, None, None, None],
        policy=jnp.ones((count, A)) / A,
        value=jnp.arange(start, start + count, dtype=jnp.float32),
        valid=jnp.asarray(valid_mask),
    )
    rb = replay_add(rb, mk(0, n, [True] * n))
    assert int(rb.size) == 10 and int(rb.head) == 10
    # Invalid rows must be dropped.
    rb = replay_add(rb, mk(100, 4, [True, False, True, False]))
    assert int(rb.size) == 12
    vals = set(np.asarray(rb.value[:12]).tolist())
    assert 100.0 in vals and 102.0 in vals and 101.0 not in vals
    # Overflow wraps FIFO: oldest overwritten.
    rb = replay_add(rb, mk(200, 8, [True] * 8))
    assert int(rb.size) == 16
    all_vals = np.asarray(rb.value)
    assert 0.0 not in all_vals  # oldest gone
    assert {200.0, 207.0} <= set(all_vals.tolist())
    # Sampling without replacement from the filled region.
    obs, pi, z = jax.device_get(replay_sample(rb, jax.random.PRNGKey(0), 8))
    assert len(set(z.tolist())) == 8  # distinct entries


def test_train_step_reduces_loss():
    net = PolicyValueNet(A, SMALL_MODEL)
    ts = init_train_state(net, SMALL_MODEL, jax.random.PRNGKey(0), ENV.obs_shape)
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.random((32,) + ENV.obs_shape), jnp.float32)
    pi = jax.nn.softmax(jnp.asarray(rng.random((32, A)), jnp.float32), -1)
    z = jnp.asarray(rng.choice([-1.0, 1.0], 32), jnp.float32)
    step = jax.jit(make_train_step(net, SMALL_MODEL))
    ts, m0 = step(ts, obs, pi, z)
    for _ in range(30):
        ts, m = step(ts, obs, pi, z)
    assert float(m.loss) < float(m0.loss)
    assert int(m.steps) == 31
    assert float(m.learning_rate) == pytest.approx(1e-2)


def test_lr_schedule_boundaries():
    from custom_alphazero_tpu.models.losses import learning_rate_schedule

    sched = learning_rate_schedule(ModelConfig())
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(149_999)) == pytest.approx(1e-2)
    assert float(sched(150_000)) == pytest.approx(1e-3)
    assert float(sched(300_000)) == pytest.approx(1e-4)
    assert float(sched(10_000_000)) == pytest.approx(1e-4)


def test_arena_raw_policy_gating():
    """A 'winning' evaluator (prefers centre + sees wins) must beat a uniform
    one and trigger promotion."""
    arena = make_arena_fn(
        ENV, ArenaConfig(promote_threshold=0.55), MCTSConfig(simulations=8),
        max_plies=42,
    )

    def strong_eval(obs):
        # Prefer the centre column strongly (a good Connect-4 heuristic).
        b = obs.shape[0]
        probs = jnp.full((b, A), 0.02)
        probs = probs.at[:, 3].set(0.88)
        return probs, jnp.zeros((b,))

    result = jax.jit(lambda k: arena(strong_eval, uniform_eval, k, 64))(
        jax.random.PRNGKey(0)
    )
    score = float(result.score)
    assert int(result.wins) + int(result.losses) + int(result.draws) == 64
    assert score > 0.5  # centre preference wins more often than not
    # Self-play arena of identical models hovers near 0.5.
    result_self = jax.jit(lambda k: arena(uniform_eval, uniform_eval, k, 128))(
        jax.random.PRNGKey(1)
    )
    assert 0.3 < float(result_self.score) < 0.7


def test_arena_half_split_routes_each_model_to_its_half():
    """The half-batch evaluator (one forward per model per ply instead of
    both models on the full batch) must route each game's move to the acting
    model: tag each model with a distinct fixed move and check the played
    action always matches the movers log."""
    arena = make_arena_fn(
        ENV, ArenaConfig(evaluate_with_mcts=False, deterministic=True),
        MCTSConfig(), max_plies=12,
    )

    def tagged(col):
        def ev(obs):
            b = obs.shape[0]
            probs = jnp.full((b, A), 1e-6).at[:, col].set(1.0)
            return probs, jnp.zeros((b,))
        return ev

    result = jax.jit(lambda k: arena(tagged(1), tagged(5), k, 16))(
        jax.random.PRNGKey(3)
    )
    log = jax.device_get(result.log)
    live = log.active.astype(bool)
    want = np.where(log.movers == 0, 1, 5)
    assert (log.actions[live] == want[live]).all()


def test_arena_log_consistency():
    arena = make_arena_fn(ENV, ArenaConfig(), MCTSConfig(), max_plies=42)
    result = jax.jit(lambda k: arena(uniform_eval, uniform_eval, k, 16))(
        jax.random.PRNGKey(2)
    )
    log = jax.device_get(result.log)
    # Candidate starts the first half of games (contiguous-half starter
    # assignment so each model forwards one half-batch per ply); movers
    # alternate per ply.
    assert (log.movers[0, :8] == 0).all() and (log.movers[0, 8:] == 1).all()
    assert (log.movers[1] == 1 - log.movers[0]).all()
    # Active masks are prefixes.
    act = log.active
    assert ((act[1:] <= act[:-1]).all())


def test_checkpoint_roundtrip(tmp_path):
    from custom_alphazero_tpu.io.checkpoint import (
        checkpoint_exists,
        load_checkpoint,
        save_checkpoint,
    )

    net = PolicyValueNet(A, SMALL_MODEL)
    ts = init_train_state(net, SMALL_MODEL, jax.random.PRNGKey(0), ENV.obs_shape)
    path = str(tmp_path / "ckpt")
    meta = save_checkpoint(path, ts, learning_rate=1e-2)
    assert checkpoint_exists(path)
    assert meta["steps"] == 0 and meta["learning_rate"] == 1e-2
    restored, meta2 = load_checkpoint(path, ts)
    assert meta2["hash"] == meta["hash"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts.params, restored.params,
    )
    # Corrupt the payload: hash check must fail.
    model_file = os.path.join(path, "train_state.msgpack")
    with open(model_file, "r+b") as fp:
        fp.seek(10)
        fp.write(b"\xff\xff")
    with pytest.raises(ValueError, match="hash mismatch"):
        load_checkpoint(path, ts)
    # Missing sentinel: refuse to load.
    os.remove(os.path.join(path, "MODEL_SAVED_SUCCESSFULLY"))
    with pytest.raises(FileNotFoundError):
        load_checkpoint(path, ts)


def test_metrics_writer(tmp_path):
    from custom_alphazero_tpu.io.metrics import MetricsWriter, crc32c

    # CRC32C known-answer vectors (RFC 3720).
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    logdir = str(tmp_path / "tb")
    with MetricsWriter(logdir) as w:
        w.scalar("train/loss", 1.25, step=1)
        w.scalar("train/loss", 0.75, step=2)
        w.scalars({"a": 1.0, "b": 2.0}, step=3)
    # JSONL mirror.
    lines = [json.loads(l) for l in open(os.path.join(logdir, "metrics.jsonl"))]
    assert lines[0] == {**lines[0], "tag": "train/loss", "value": 1.25, "step": 1}
    # Event file loads in stock TensorBoard.
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(logdir)
    acc.Reload()
    scalars = acc.Scalars("train/loss")
    assert [(s.step, s.value) for s in scalars] == [(1, 1.25), (2, 0.75)]
    assert acc.Scalars("b")[0].value == 2.0


def test_replay_add_overflow_keeps_newest():
    """A single add larger than capacity must keep exactly the NEWEST
    `capacity` samples (wrapped slots would otherwise scatter duplicates
    whose winner XLA leaves unspecified)."""
    import jax.numpy as jnp

    from custom_alphazero_tpu.replay.buffer import replay_add, replay_init
    from custom_alphazero_tpu.runtime.selfplay import SelfPlayBatch

    cap, n = 8, 20
    replay = replay_init(cap, (1,), 3)
    batch = SelfPlayBatch(
        obs=jnp.arange(n, dtype=jnp.float32).reshape(n, 1),
        policy=jnp.zeros((n, 3)),
        value=jnp.arange(n, dtype=jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    replay = replay_add(replay, batch)
    assert int(replay.size) == cap
    got = sorted(np.asarray(replay.value).tolist())
    assert got == list(range(n - cap, n))  # newest 8 survive


def test_arena_min_decisives_gate_draw_heavy():
    """Draw-heavy arena gate (round 5, ArenaConfig.min_decisives): on a
    6-ply-truncated Connect-4 series no game can be won (a win needs 7
    plies), so every game draws. With min_decisives the series is
    inconclusive and promote_when_inconclusive decides; with the default
    (0) the reference semantics hold (draws-only => score 0.5, the 0.55
    gate blocks)."""

    def ev(obs):
        b = obs.shape[0]
        return jnp.full((b, A), 1.0 / A), jnp.zeros((b,))

    def run_one(cfg):
        arena = make_arena_fn(ENV, cfg, MCTSConfig(simulations=4),
                              max_plies=6)
        return jax.jit(lambda k: arena(ev, ev, k, 8))(jax.random.PRNGKey(0))

    ref = run_one(ArenaConfig())
    assert int(ref.draws) == 8 and float(ref.score) == 0.5
    assert not bool(ref.promote)

    fresh = run_one(ArenaConfig(min_decisives=4,
                                promote_when_inconclusive=True))
    assert int(fresh.draws) == 8 and bool(fresh.promote)

    keep = run_one(ArenaConfig(min_decisives=4,
                               promote_when_inconclusive=False))
    assert not bool(keep.promote)


def test_arena_min_decisives_gate_conclusive_series():
    """With enough decisive games the min_decisives gate defers to the
    threshold: a strong candidate still promotes, a weak one is blocked."""
    arena = make_arena_fn(
        ENV,
        ArenaConfig(promote_threshold=0.55, min_decisives=4,
                    promote_when_inconclusive=False),
        MCTSConfig(simulations=8), max_plies=42,
    )

    def strong_eval(obs):
        b = obs.shape[0]
        probs = jnp.full((b, A), 0.02).at[:, 3].set(0.88)
        return probs, jnp.zeros((b,))

    win = jax.jit(lambda k: arena(strong_eval, uniform_eval, k, 64))(
        jax.random.PRNGKey(0)
    )
    lose = jax.jit(lambda k: arena(uniform_eval, strong_eval, k, 64))(
        jax.random.PRNGKey(0)
    )
    assert int(win.wins) + int(win.losses) >= 4  # conclusive series
    assert bool(win.promote) and not bool(lose.promote)
