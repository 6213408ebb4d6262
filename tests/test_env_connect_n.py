"""Connect-N engine: exact-trajectory replay against the NumPy twin
(SURVEY.md §4 strategy (a)) plus targeted win/draw cases."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.config import ConnectNConfig
from custom_alphazero_tpu.envs.connect_n import ConnectN
from tests.reference_numpy import RefConnectN


_HARNESS = {}


def harness(cfg: ConnectNConfig):
    """Memoized (env, jitted step, jitted inspect) per board geometry so
    parametrized cases share compilations."""
    if cfg not in _HARNESS:
        env = ConnectN(cfg)

        def inspect(state):
            return (env.legal_mask(state), env.observe(state),
                    env.terminal_value(state))

        _HARNESS[cfg] = (env, jax.jit(env.step), jax.jit(inspect))
    return _HARNESS[cfg]


def random_rollout_check(cfg: ConnectNConfig, seed: int):
    env, step, inspect = harness(cfg)
    ref = RefConnectN(cfg.width, cfg.height, cfg.n, cfg.gravity)
    state = env.init()
    rng = np.random.default_rng(seed)
    for ply in range(cfg.width * cfg.height + 2):
        mask_jax, obs_jax, tval = jax.device_get(inspect(state))
        mask_ref = ref.legal_mask()
        np.testing.assert_array_equal(mask_jax, mask_ref)
        np.testing.assert_array_equal(np.asarray(state.board), ref.board)
        np.testing.assert_array_equal(obs_jax, ref.observe())
        assert bool(state.terminal) == ref.terminal
        if ref.terminal:
            expect = -1.0 if ref.won else 0.0
            assert float(tval) == expect
            # Absorbing: stepping a finished game is a no-op.
            state2, r2 = step(state, jnp.int32(0))
            assert float(r2) == 0.0
            np.testing.assert_array_equal(
                np.asarray(state2.board), np.asarray(state.board)
            )
            break
        action = int(rng.choice(np.nonzero(mask_ref)[0]))
        state, reward = step(state, jnp.int32(action))
        reward_ref = ref.play(action)
        assert float(reward) == reward_ref
        assert int(state.fullmove) == ref.fullmove


@pytest.mark.parametrize("seed", range(8))
def test_trajectory_replay_default(seed):
    random_rollout_check(ConnectNConfig(), seed)


@pytest.mark.parametrize("seed", range(4))
def test_trajectory_replay_variant_board(seed):
    random_rollout_check(ConnectNConfig(width=9, height=7, n=5), seed)


@pytest.mark.parametrize("seed", range(4))
def test_trajectory_replay_no_gravity(seed):
    random_rollout_check(ConnectNConfig(width=4, height=4, n=3, gravity=False), seed)


def test_vertical_win_and_reward():
    env, step, inspect = harness(ConnectNConfig())
    state = env.init()
    # Mover stacks column 0; opponent fills column 6. Mover wins on ply 7.
    rewards = []
    for action in [0, 6, 0, 6, 0, 6, 0]:
        state, r = step(state, jnp.int32(action))
        rewards.append(float(r))
    assert rewards == [0, 0, 0, 0, 0, 0, 1.0]
    assert bool(state.terminal) and bool(state.won)
    assert float(env.terminal_value(state)) == -1.0  # side to move lost
    assert not np.asarray(env.legal_mask(state)).any()


def test_horizontal_and_diagonal_win():
    env, step, inspect = harness(ConnectNConfig())
    # Horizontal: mover plays 0,1,2,3 on the bottom row.
    state = env.init()
    for action in [0, 0, 1, 1, 2, 2]:
        state, r = step(state, jnp.int32(action))
        assert float(r) == 0.0
    state, r = step(state, jnp.int32(3))
    assert float(r) == 1.0
    # Diagonal /: classic staircase.
    state = env.init()
    for action in [0, 1, 1, 2, 2, 3, 2, 3, 3, 0]:
        state, r = step(state, jnp.int32(action))
        assert float(r) == 0.0
    state, r = step(state, jnp.int32(3))
    assert float(r) == 1.0


def test_draw_full_board():
    # 4x4 n=4 no-gravity filled in a colour pattern with no 4-line.
    env, step, inspect = harness(ConnectNConfig(width=4, height=4, n=4, gravity=False))
    ref = RefConnectN(4, 4, 4, gravity=False)
    state = env.init()
    rng = np.random.default_rng(3)
    while not ref.terminal:
        action = int(rng.choice(np.nonzero(ref.legal_mask())[0]))
        state, r = step(state, jnp.int32(action))
        rr = ref.play(action)
        assert float(r) == rr
    assert bool(state.terminal) == ref.terminal
    assert bool(state.won) == ref.won


def test_vmapped_batch_steps():
    env = ConnectN(ConnectNConfig())
    batch = 32
    init = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    step = jax.jit(jax.vmap(env.step))
    actions = jnp.zeros((batch,), jnp.int32)
    state, rewards = step(init, actions)
    assert state.board.shape == (batch, 6, 7)
    np.testing.assert_array_equal(np.asarray(rewards), np.zeros(batch))
    # Column heights advanced everywhere.
    np.testing.assert_array_equal(np.asarray(state.heights[:, 0]), np.ones(batch))


def test_config_num_actions():
    assert ConnectNConfig().num_actions == 7
    assert ConnectNConfig(gravity=False).num_actions == 42
    with pytest.raises(AssertionError):
        ConnectNConfig(width=3, height=3, n=4)


def test_config_overrides_roundtrip():
    from custom_alphazero_tpu import config as cfg_mod

    cfg = cfg_mod.Config()
    cfg2 = cfg_mod.apply_overrides(
        cfg, {"mcts.simulations": "64", "connect_n.width": "9", "game": "chess"}
    )
    assert cfg2.mcts.simulations == 64
    assert cfg2.connect_n.width == 9
    assert cfg2.game == "chess"
    assert cfg.mcts.simulations == 250  # original untouched
    cfg3 = cfg_mod.from_json(cfg_mod.to_json(cfg2))
    assert cfg3 == cfg2
    assert dataclasses.asdict(cfg3) == dataclasses.asdict(cfg2)


def test_config_validation_rejects_foot_guns():
    """Parse-time validation (VERDICT r1 #10): lr schedule shape and a tree
    capacity below the per-simulation slot floor raise instead of being
    silently adjusted downstream."""
    from custom_alphazero_tpu import config as cfg_mod

    cfg = cfg_mod.Config()
    with pytest.raises(ValueError, match="lr_values"):
        cfg_mod.apply_overrides(cfg, {"model.lr_values": "(0.01,0.001)"})
    with pytest.raises(ValueError, match="increasing"):
        cfg_mod.apply_overrides(
            cfg, {"model.lr_boundaries": "(1000,1000)"}
        )
    with pytest.raises(ValueError, match="max_nodes"):
        cfg_mod.apply_overrides(
            cfg, {"mcts.simulations": "100", "mcts.max_nodes": "50"}
        )
    # max_nodes=0 stays the auto mode; >= simulations is fine.
    ok = cfg_mod.apply_overrides(
        cfg, {"mcts.simulations": "100", "mcts.max_nodes": "200"}
    )
    assert ok.mcts.max_nodes == 200
