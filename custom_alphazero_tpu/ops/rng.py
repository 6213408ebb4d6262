"""TPU-safe bounded-iteration gamma sampling for in-program Dirichlet noise.

``jax.random.gamma``'s rejection sampler carries a data-dependent
``while_loop``; embedded inside a large compiled program (the lockstep
self-play generation scan) it kernel-faults the TPU worker on this
toolchain at chess scale — round 3 hit it per-wave at B >= 128
(search/mcts.py presample_noise docstring), and the round-3 "hoist it
before the loop" fix still faulted at every batch size once the presample
itself sat inside the ply scan (round-4 probe: B=64 PUCT+noise faults at
HEAD while the identical program with noise off runs at 174k sims/s).

This module replaces the rejection loop with a FIXED-iteration
Marsaglia-Tsang sampler (no ``while_loop``, pure vector math — exactly
what the MXU/VPU toolchain compiles well):

- alpha >= 1: d = alpha - 1/3, c = 1/sqrt(9 d); draw K candidate
  (normal, uniform) pairs, v = (1 + c x)^3, accept when v > 0 and
  log u < x^2/2 + d - d v + d log v; take the FIRST accepted candidate.
  Acceptance is >= 95% per draw for alpha >= 1, so K attempts leave a
  residual miss probability <= 0.05^K (K=8: ~4e-11); misses fall back to
  d = alpha - 1/3 (near the Gamma mode, not the mean alpha) —
  statistically invisible, and noise-grade anyway.
- alpha < 1 (the chess regime, 0.03-0.3): boost via Gamma(alpha+1) and
  the power transform G * U^(1/alpha) (Marsaglia-Tsang boosting lemma).

The sampler is exact-in-distribution (up to the ~1e-10 fallback), but its
RNG stream differs from ``jax.random.gamma``; all search paths (general
XLA, fused kernels) consume the same presampled block, so fused/general
bit-parity is preserved by construction (tests/test_fused_mcts.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ATTEMPTS = 8


def safe_gamma(rng, alpha: float, shape) -> jnp.ndarray:
    """Gamma(alpha) draws of ``shape`` with no data-dependent control flow.

    ``alpha`` is a static python float (the Dirichlet concentration from
    config). alpha == 1 short-circuits to the exact exponential
    (-log U) — the Connect-4 production regime (dirichlet_alpha=1.0).
    """
    alpha = float(alpha)
    assert alpha > 0.0
    if alpha == 1.0:
        # Gamma(1) = Exponential(1), exactly; no rejection at all.
        u = jax.random.uniform(
            rng, shape, minval=jnp.finfo(jnp.float32).tiny, maxval=1.0
        )
        return -jnp.log(u)

    boost = alpha < 1.0
    a = alpha + 1.0 if boost else alpha
    k_mt, k_boost = jax.random.split(rng)

    import math

    d = a - 1.0 / 3.0
    c = 1.0 / math.sqrt(9.0 * d)
    shape = tuple(shape)
    tiny = float(jnp.finfo(jnp.float32).tiny)
    # First-accepted selection WITHOUT gathers: walk the unrolled attempts
    # in reverse, each earlier accepted draw overwriting later ones — pure
    # jnp.where chains (take_along_axis/argmax selection lowers to a
    # gather, which inside the generation ply scan kernel-faults the TPU
    # worker on this toolchain; round-4 probe).
    g = jnp.full(shape, d, jnp.float32)  # near-mode fallback, P ~ 0.05^K
    for j in range(ATTEMPTS - 1, -1, -1):
        kj = jax.random.fold_in(k_mt, j)
        x = jax.random.normal(kj, shape)
        u = jax.random.uniform(
            jax.random.fold_in(kj, 1), shape, minval=tiny, maxval=1.0
        )
        t = 1.0 + c * x
        v = t * t * t
        vsafe = jnp.maximum(v, tiny)
        ok = (v > 0.0) & (
            jnp.log(u) < 0.5 * x * x + d - d * v + d * jnp.log(vsafe)
        )
        g = jnp.where(ok, d * v, g)

    if boost:
        # Gamma(alpha) = Gamma(alpha+1) * U^(1/alpha) for alpha < 1
        # (exp/log instead of a pow lowering).
        ub = jax.random.uniform(k_boost, shape, minval=tiny, maxval=1.0)
        g = g * jnp.exp(jnp.log(ub) / alpha)
    return g
