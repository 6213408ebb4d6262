"""Bit-packed observation storage for the device-resident replay.

The observation tensors both games feed the net are almost entirely binary
planes: Connect-N is 3 one-hot board planes + a constant turn plane
(envs/connect_n.py observe), chess is 112 one-hot/repetition history planes
+ 4 castling planes + 2 constant clock planes (envs/chess/engine.py
observe, reference full_state chess/board.py:58-73). Storing them as
float32 rows wastes 32x the HBM the information needs — at chess scale
(8x8x118 x a 400k-row ring) the float32 ring alone is ~12 GB and cannot
live device-resident (VERDICT r1 weak #4 / next #7).

``BitplaneCodec`` packs the binary channels into uint32 words (HBM is the
bottleneck resource; pack/unpack is a handful of VPU shift/mask ops fused
around the replay scatter/gather) and keeps constant-valued channels as one
scalar each:

    connect-4 row:   672 B float32 ->  24 B   (28x)
    chess row:     30208 B float32 -> 936 B   (32x)

Encode/decode are exact (binary planes reproduce bit-for-bit; scalar
channels are stored as the float32 they came from), jit-pure, and batched:
the replay applies them at add/sample time on device.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

WORD = 32


class PackedObs(NamedTuple):
    """One replay row's packed observation (leading batch axes broadcast)."""

    words: jnp.ndarray    # (..., n_words) uint32 — packed binary channels
    scalars: jnp.ndarray  # (..., n_scalars) float32 — constant channels


class BitplaneCodec:
    """Packs (H, W, C) float observations whose channels are each either
    binary (values in {0, 1}) or constant over the spatial grid.

    binary_channels / scalar_channels partition range(C). The scalar
    channels' value is read at spatial position (0, 0).
    """

    def __init__(
        self,
        obs_shape: Tuple[int, int, int],
        binary_channels: Sequence[int],
        scalar_channels: Sequence[int] = (),
    ):
        h, w, c = obs_shape
        binary = tuple(binary_channels)
        scalars = tuple(scalar_channels)
        assert sorted(binary + scalars) == list(range(c)), (
            "channels must partition the observation"
        )
        self.obs_shape = obs_shape
        self.binary_channels = binary
        self.scalar_channels = scalars
        # Static permutation restoring [binary..., scalar...] -> 0..C-1.
        order = binary + scalars
        self.inv_perm = tuple(order.index(i) for i in range(c))
        self.n_bits = h * w * len(binary)
        self.n_words = -(-self.n_bits // WORD)
        self.n_scalars = len(scalars)

    def packed_zeros(self, leading: Tuple[int, ...]) -> PackedObs:
        """Allocate the packed storage for `leading` rows."""
        return PackedObs(
            words=jnp.zeros(leading + (self.n_words,), jnp.uint32),
            scalars=jnp.zeros(leading + (self.n_scalars,), jnp.float32),
        )

    def encode(self, obs: jnp.ndarray) -> PackedObs:
        """(..., H, W, C) float32 -> PackedObs. Batched over leading axes."""
        lead = obs.shape[:-3]
        bin_planes = jnp.moveaxis(
            obs[..., jnp.asarray(self.binary_channels)], -1, -3
        )  # (..., C_bin, H, W): channel-major so each plane's bits stay
        # contiguous within words (decode mirrors this layout).
        bits = (bin_planes > 0.5).reshape(lead + (-1,))
        pad = self.n_words * WORD - self.n_bits
        if pad:
            bits = jnp.concatenate(
                [bits, jnp.zeros(lead + (pad,), bits.dtype)], axis=-1
            )
        grouped = bits.reshape(lead + (self.n_words, WORD)).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(WORD, dtype=jnp.uint32))
        words = (grouped * weights).sum(-1, dtype=jnp.uint32)
        if self.n_scalars:
            scalars = obs[..., 0, 0, jnp.asarray(self.scalar_channels)]
        else:
            scalars = jnp.zeros(lead + (0,), jnp.float32)
        return PackedObs(words=words, scalars=scalars)

    def decode(self, packed: PackedObs) -> jnp.ndarray:
        """PackedObs -> (..., H, W, C) float32, exact inverse of encode for
        binary planes; scalar channels broadcast back to constant planes."""
        h, w, _ = self.obs_shape
        lead = packed.words.shape[:-1]
        shifts = jnp.arange(WORD, dtype=jnp.uint32)
        bits = (packed.words[..., None] >> shifts) & jnp.uint32(1)
        bits = bits.reshape(lead + (-1,))[..., : self.n_bits]
        planes = bits.reshape(
            lead + (len(self.binary_channels), h, w)
        ).astype(jnp.float32)
        planes = jnp.moveaxis(planes, -3, -1)  # (..., H, W, C_bin)
        if self.n_scalars:
            const = jnp.broadcast_to(
                packed.scalars[..., None, None, :],
                lead + (h, w, self.n_scalars),
            )
            planes = jnp.concatenate([planes, const], axis=-1)
        # Restore the original channel order with a static permutation.
        return planes[..., jnp.asarray(self.inv_perm)]


def codec_for_env(env) -> BitplaneCodec:
    """Build the codec an env declares via `obs_scalar_channels` (channels
    constant over the board; everything else must be binary). Envs without
    the attribute are all-binary."""
    c = env.obs_shape[-1]
    scalar = tuple(getattr(env, "obs_scalar_channels", ()))
    binary = tuple(i for i in range(c) if i not in scalar)
    return BitplaneCodec(env.obs_shape, binary, scalar)


class TopKPolicy(NamedTuple):
    """Sparse policy row: top-K (renormalized) probabilities + indices."""

    values: jnp.ndarray   # (..., K) float32
    indices: jnp.ndarray  # (..., K) int32


class TopKPolicyCodec:
    """Sparse storage for large-action-space policy targets.

    A chess policy row is (1968,) float32 = 7.9 KB — after obs bit-packing
    it dominates replay HBM. A search policy target has at most
    min(simulations, legal moves) non-zeros (root visit counts normalized,
    runtime/selfplay.py), so top-K with K >= that bound is exact; smaller K
    truncates the tail and renormalizes (documented lossy mode). K=128 at
    1 KB/row is exact for every position with <= 128 visited root children.
    """

    def __init__(self, num_actions: int, k: int):
        assert 0 < k <= num_actions
        self.num_actions = num_actions
        self.k = k

    def packed_zeros(self, leading: Tuple[int, ...]) -> TopKPolicy:
        return TopKPolicy(
            values=jnp.zeros(leading + (self.k,), jnp.float32),
            indices=jnp.zeros(leading + (self.k,), jnp.int32),
        )

    def encode(self, policy: jnp.ndarray) -> TopKPolicy:
        values, indices = jax.lax.top_k(policy, self.k)
        total = jnp.maximum(values.sum(-1, keepdims=True), 1e-30)
        return TopKPolicy(
            values=(values / total).astype(jnp.float32),
            indices=indices.astype(jnp.int32),
        )

    def decode(self, packed: TopKPolicy) -> jnp.ndarray:
        lead = packed.values.shape[:-1]
        flat_idx = packed.indices.reshape((-1, self.k))
        flat_val = packed.values.reshape((-1, self.k))

        def row(idx, val):
            # .add: zero-valued padding rows may repeat an index harmlessly.
            return jnp.zeros((self.num_actions,), jnp.float32).at[idx].add(val)

        dense = jax.vmap(row)(flat_idx, flat_val)
        return dense.reshape(lead + (self.num_actions,))
