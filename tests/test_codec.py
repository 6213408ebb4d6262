"""Bit-packed replay observation storage (replay/codec.py): exact
roundtrip for both games' real observations, compression factor, and the
codec-aware replay ring end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_alphazero_tpu.config import ConnectNConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.replay.buffer import (
    replay_add,
    replay_init,
    replay_sample,
)
from custom_alphazero_tpu.replay.codec import codec_for_env
from custom_alphazero_tpu.runtime.selfplay import SelfPlayBatch

ENV = ConnectN(ConnectNConfig())


def _random_c4_obs(n, seed=0):
    """Real observations from random playouts (not synthetic tensors)."""
    rng = jax.random.PRNGKey(seed)
    states = jax.vmap(lambda _: ENV.init())(jnp.arange(n))

    def ply(states, k):
        legal = jax.vmap(ENV.legal_mask)(states)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        actions = jax.random.categorical(k, logits)
        return jax.vmap(ENV.step)(states, actions)[0], None

    states, _ = jax.lax.scan(ply, states, jax.random.split(rng, 6))
    return jax.vmap(ENV.observe)(states)


def test_connect_n_roundtrip_exact():
    codec = codec_for_env(ENV)
    obs = _random_c4_obs(64)
    packed = jax.jit(codec.encode)(obs)
    out = jax.jit(codec.decode)(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(obs))
    # 6*7*4 = 168 bits -> 6 words; no scalar channels.
    assert packed.words.shape == (64, 6)
    assert packed.scalars.shape == (64, 0)
    # 672 B float32 -> 24 B packed: 28x smaller.
    raw = int(np.prod(ENV.obs_shape)) * 4
    stored = packed.words.shape[-1] * 4
    assert raw / stored >= 28


def test_chess_roundtrip_exact():
    from custom_alphazero_tpu.envs.chess.engine import Chess

    env = Chess()
    codec = codec_for_env(env)
    # Play a few random legal moves so history/castling/clock planes are
    # non-trivial, then check exact roundtrip.
    state = env.init()
    rng = jax.random.PRNGKey(1)
    obs_list = []
    for i in range(6):
        legal = env.legal_mask(state)
        rng, k = jax.random.split(rng)
        action = jax.random.categorical(
            k, jnp.where(legal, 0.0, -jnp.inf)
        )
        state, _ = env.step(state, action)
        obs_list.append(env.observe(state))
    obs = jnp.stack(obs_list)
    packed = jax.jit(codec.encode)(obs)
    out = jax.jit(codec.decode)(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(obs))
    # The clock planes (halfmove can exceed 1) survive via scalar channels.
    assert packed.scalars.shape == (6, 2)
    raw = int(np.prod(env.obs_shape)) * 4
    stored = packed.words.shape[-1] * 4 + packed.scalars.shape[-1] * 4
    assert raw / stored >= 30


def test_replay_ring_with_codec_matches_plain():
    """The codec-aware ring returns the same sampled rows as the float ring
    under a shared seed (bit-exact decode; same slot/sample choices)."""
    codec = codec_for_env(ENV)
    n = 48
    obs = _random_c4_obs(n, seed=2)
    batch = SelfPlayBatch(
        obs=obs,
        policy=jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(3), (n, ENV.num_actions))
        ),
        value=jnp.ones((n,)),
        valid=jnp.arange(n) % 5 != 0,  # some invalid rows
    )
    plain = replay_init(64, ENV.obs_shape, ENV.num_actions)
    packed = replay_init(64, ENV.obs_shape, ENV.num_actions, codec)
    plain = replay_add(plain, batch)
    packed = replay_add(packed, batch, codec)
    assert int(plain.size) == int(packed.size) == int(batch.valid.sum())

    k = jax.random.PRNGKey(4)
    o1, p1, v1 = replay_sample(plain, k, 16)
    o2, p2, v2 = replay_sample(packed, k, 16, codec)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_topk_policy_codec_exact_when_k_covers_support():
    from custom_alphazero_tpu.replay.codec import TopKPolicyCodec

    A, K = 1968, 128
    codec = TopKPolicyCodec(A, K)
    rng = np.random.default_rng(5)
    # Sparse rows like search policy targets: <= K nonzero visit fractions.
    dense = np.zeros((32, A), np.float32)
    for i in range(32):
        support = rng.choice(A, size=rng.integers(1, K + 1), replace=False)
        w = rng.random(len(support)).astype(np.float32)
        dense[i, support] = w / w.sum()
    out = jax.jit(lambda p: codec.decode(codec.encode(p)))(jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(out), dense, rtol=1e-6, atol=1e-7)

    # Over-full rows are truncated to the K largest and renormalized.
    wide = jnp.asarray(rng.random((4, A)), jnp.float32)
    wide = wide / wide.sum(-1, keepdims=True)
    dec = jax.jit(lambda p: codec.decode(codec.encode(p)))(wide)
    assert int((np.asarray(dec) > 0).sum(-1).max()) <= K
    np.testing.assert_allclose(np.asarray(dec).sum(-1), 1.0, rtol=1e-5)


def test_chess_scale_replay_fits_device_memory():
    """VERDICT r1 #7: a chess-scale ring (400k rows, 8x8x118 obs, 1968
    actions) must fit device-resident. With both codecs the ring is ~0.6 GB
    vs ~15 GB raw — well under a v5e chip's 16 GB HBM."""
    from custom_alphazero_tpu.envs.chess.engine import Chess
    from custom_alphazero_tpu.replay.codec import TopKPolicyCodec

    env = Chess()
    codec = codec_for_env(env)
    pc = TopKPolicyCodec(env.num_actions, 128)
    rows = 400_000
    packed_bytes = (
        rows * codec.n_words * 4          # obs words
        + rows * codec.n_scalars * 4      # obs scalars
        + rows * pc.k * 8                 # policy values + indices
        + rows * 4                        # value
    )
    raw_bytes = rows * (
        int(np.prod(env.obs_shape)) * 4 + env.num_actions * 4 + 4
    )
    assert packed_bytes < 1.0 * 2**30, packed_bytes / 2**30
    assert raw_bytes > 12 * 2**30
    # And the allocation path actually builds at this scale cheaply: the
    # fields are created but we only materialize a small ring here (CPU).
    small = replay_init(1024, env.obs_shape, env.num_actions, codec, pc)
    assert small.obs.words.shape == (1024, codec.n_words)
    assert small.policy.values.shape == (1024, 128)


def test_packed_generation_equals_raw_after_decode():
    # Round-3 chess-scale memory fix: obs bit-packed INSIDE the generation
    # scan (selfplay obs_codec). Packed-then-decoded samples must be
    # bit-identical to the raw path under a shared seed, and replay_add
    # must accept the pre-packed batch directly.
    import jax
    import jax.numpy as jnp

    from custom_alphazero_tpu.config import (
        ChessConfig,
        MCTSConfig,
        SelfPlayConfig,
    )
    from custom_alphazero_tpu.envs.chess.engine import Chess
    from custom_alphazero_tpu.replay.buffer import replay_add, replay_init
    from custom_alphazero_tpu.replay.codec import codec_for_env
    from custom_alphazero_tpu.runtime.selfplay import make_selfplay_fn

    env = Chess(ChessConfig())
    codec = codec_for_env(env)
    mcts_cfg = MCTSConfig(simulations=8)
    sp_cfg = SelfPlayConfig(continuous=True, exclude_draws=False)
    uniform = lambda obs: (
        jnp.ones((obs.shape[0], env.num_actions)) / env.num_actions,
        jnp.zeros((obs.shape[0],)),
    )
    raw_fn = make_selfplay_fn(env, mcts_cfg, sp_cfg, max_plies=6,
                              fused=False)
    packed_fn = make_selfplay_fn(env, mcts_cfg, sp_cfg, max_plies=6,
                                 fused=False, obs_codec=codec)
    rng = jax.random.PRNGKey(7)
    raw_batch, raw_stats = jax.jit(
        lambda k: raw_fn(uniform, k, 4))(rng)
    packed_batch, packed_stats = jax.jit(
        lambda k: packed_fn(uniform, k, 4))(rng)
    np.testing.assert_array_equal(
        np.asarray(raw_batch.valid), np.asarray(packed_batch.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(raw_batch.policy), np.asarray(packed_batch.policy)
    )
    decoded = np.asarray(codec.decode(packed_batch.obs))
    np.testing.assert_array_equal(decoded, np.asarray(raw_batch.obs))
    # replay_add accepts the pre-packed batch; samples decode identically.
    ring = replay_init(64, env.obs_shape, env.num_actions, codec=codec)
    ring_packed = replay_add(ring, packed_batch, codec=codec)
    ring_raw = replay_add(ring, raw_batch, codec=codec)
    np.testing.assert_array_equal(
        np.asarray(ring_packed.obs.words), np.asarray(ring_raw.obs.words)
    )
    assert int(ring_packed.size) == int(ring_raw.size)
