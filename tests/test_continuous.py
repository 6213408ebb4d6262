"""Continuous (auto-reset) self-play generation.

In lockstep batches a finished game's slot otherwise burns full search
waves until the longest game ends; continuous mode resets finished slots
immediately and assembles (s, pi, z) per completed segment, dropping the
trailing incomplete game. Sample semantics within each segment are the
reference's exactly (z sign-flip + discount from the segment end,
self_play.py:69-78; draw exclusion self_play.py:155-162) — asserted here
by prefix-equivalence with the non-continuous path under the same seed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.config import (
    ConnectNConfig,
    MCTSConfig,
    SelfPlayConfig,
)
from custom_alphazero_tpu.envs.connect_n import ConnectN
from custom_alphazero_tpu.runtime.selfplay import make_selfplay_fn

CFG = ConnectNConfig(width=5, height=4, n=3)
ENV = ConnectN(CFG)
A = CFG.num_actions
T = CFG.width * CFG.height  # scan horizon
B = 8


def uniform_eval(obs):
    return jnp.ones((obs.shape[0], A)) / A, jnp.zeros((obs.shape[0],))


def run(continuous, exclude_draws=False, reuse=False, seed=0):
    sp = make_selfplay_fn(
        ENV,
        MCTSConfig(simulations=8, greedy_from_move=6, reuse_tree=reuse),
        SelfPlayConfig(exclude_draws=exclude_draws, continuous=continuous),
        T,
    )
    batch, stats = jax.jit(lambda k: sp(uniform_eval, k, B))(
        jax.random.PRNGKey(seed)
    )
    reshape = lambda x: np.asarray(x).reshape((T, B) + x.shape[1:])
    return (
        reshape(batch.obs), reshape(batch.policy), reshape(batch.value),
        reshape(batch.valid), stats,
    )


@pytest.mark.parametrize("reuse", [False, True], ids=["fresh", "reuse"])
def test_continuous_first_games_match_noncontinuous(reuse):
    """Under the same seed the per-ply RNG stream is identical, so each
    slot's FIRST game must be sample-for-sample identical between modes —
    which cross-checks the reverse-scan z assembly against the prefix
    (lengths-based) construction."""
    obs_n, pi_n, z_n, valid_n, stats_n = run(False, reuse=reuse)
    obs_c, pi_c, z_c, valid_c, stats_c = run(True, reuse=reuse)
    lengths = valid_n.sum(axis=0)
    assert int(stats_c.games) >= int(stats_n.games) == B
    for g in range(B):
        L = int(lengths[g])
        assert valid_c[:L, g].all()
        np.testing.assert_array_equal(obs_c[:L, g], obs_n[:L, g])
        np.testing.assert_array_equal(pi_c[:L, g], pi_n[:L, g])
        np.testing.assert_allclose(z_c[:L, g], z_n[:L, g], atol=1e-6)


def test_continuous_packs_more_games_and_segments_are_complete():
    obs, pi, z, valid, stats = run(True, seed=3)
    # More completed games than slots once the horizon exceeds game length.
    assert int(stats.games) > B
    assert int(stats.plies) == T * B  # every slot live every ply
    # Every valid sample's z is a signed discounted result; winners' |z|=1.
    zv = z[valid]
    assert set(np.unique(np.round(np.abs(zv), 6))) <= {0.0, 1.0}
    # Policies normalized on valid samples.
    np.testing.assert_allclose(pi[valid].sum(-1), 1.0, atol=1e-5)
    # The trailing incomplete game is dropped: in every slot the samples
    # after the last valid ply are invalid (valid is a union of complete
    # segments anchored at dones, so the tail after the last done ply of a
    # slot must be invalid).
    for g in range(B):
        nz = np.nonzero(valid[:, g])[0]
        if len(nz) and nz[-1] + 1 < T:
            assert not valid[nz[-1] + 1:, g].any()


def test_continuous_draw_exclusion():
    _, _, z_all, valid_all, stats_all = run(True, exclude_draws=False,
                                            seed=1)
    _, _, z_ex, valid_ex, stats_ex = run(True, exclude_draws=True, seed=1)
    # Same play stream, only the validity mask changes.
    assert int(stats_all.games) == int(stats_ex.games)
    assert (np.abs(z_ex[valid_ex]) > 0).all()  # no draw segments kept
    dropped = int(valid_all.sum()) - int(valid_ex.sum())
    assert dropped >= 0
    if int(stats_all.draws) > 0:
        assert dropped > 0


def test_continuous_mean_game_length_sane():
    *_, stats = run(True, seed=2)
    mean_len = float(stats.mean_game_length)
    assert 2 * CFG.n - 1 <= mean_len <= T
    total = int(stats.wins_first_mover) + int(stats.wins_second_mover) + int(
        stats.draws
    )
    assert total == int(stats.games)
