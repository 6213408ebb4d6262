"""ops/rng.py safe_gamma: a bounded-iteration Gamma sampler (the TPU-safe
replacement for jax.random.gamma's rejection while_loop inside big
programs — search/mcts.py presample_noise). Checks exactness-in-
distribution against the analytic Gamma moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_alphazero_tpu.ops.rng import safe_gamma


@pytest.mark.parametrize("alpha", [0.03, 0.3, 1.0, 1.5, 4.0])
def test_safe_gamma_moments(alpha):
    n = 200_000
    g = np.asarray(safe_gamma(jax.random.PRNGKey(0), alpha, (n,)))
    assert np.all(np.isfinite(g)) and np.all(g >= 0)
    # Gamma(alpha): mean = alpha, var = alpha.  Tolerances ~5 sigma of the
    # empirical estimators.
    se_mean = np.sqrt(alpha / n)
    assert abs(g.mean() - alpha) < 6 * se_mean + 1e-3
    rel_var_err = abs(g.var() - alpha) / alpha
    assert rel_var_err < 0.05


def test_safe_gamma_dirichlet_normalization():
    # Normalized draws form a Dirichlet over the legal set: mean 1/k.
    g = np.asarray(safe_gamma(jax.random.PRNGKey(1), 0.3, (4096, 7)))
    d = g / g.sum(-1, keepdims=True)
    assert np.allclose(d.sum(-1), 1.0, atol=1e-5)
    assert abs(d.mean() - 1.0 / 7.0) < 0.01


def test_safe_gamma_jits_inside_scan():
    # The whole point: safe inside a scan body (no rejection while_loop).
    def body(carry, k):
        return carry + safe_gamma(k, 0.3, (8,)).sum(), None

    keys = jax.random.split(jax.random.PRNGKey(2), 16)
    total, _ = jax.jit(lambda ks: jax.lax.scan(body, 0.0, ks))(keys)
    assert np.isfinite(float(total))
