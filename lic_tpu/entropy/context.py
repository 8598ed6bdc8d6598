"""Spatial context model: causal patch sampling + per-position (μ, σ) head.

Re-design of ``BlockSample``/``NeighborSample``/``PredictionModel_Context``
(``model/net.py:219-319``).

The reference extracts per-position 4x4 causal context patches with a fixed
one-hot conv of C·16 7x7 filters (``model/net.py:224-238``) — a huge
degenerate conv.  On TPU the same tensor is 16 shifted *slices* of the
padded input stacked on new axes: pure data movement that XLA turns into
cheap fused copies, no FLOPs.

Patch geometry (matching the reference filter construction exactly):
``patch[i, j](p, q) = x_pad[p + i, q + j + 1]`` for i, j ∈ [0, 4) with
pad=3 on every side — i.e. rows −3..0 and cols −2..+1 relative to (p, q).
``masked=True`` zeroes positions (3, 2) and (3, 3): the current pixel and
its right neighbour — the causal mask used for the content stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv2d


def block_sample(x: jax.Array, masked: bool = True) -> jax.Array:
    """(B, H, W, C) → (B·H·W, 4, 4, C) causal context patches."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    rows = []
    for i in range(4):
        cols = []
        for j in range(4):
            sl = xp[:, i : i + h, j + 1 : j + 1 + w, :]
            if masked and i == 3 and j >= 2:
                sl = jnp.zeros_like(sl)
            cols.append(sl)
        rows.append(jnp.stack(cols, axis=3))  # (B,H,W,4,C)
    t = jnp.stack(rows, axis=3)  # (B,H,W,4,4,C)
    return t.reshape(b * h * w, 4, 4, c)


def neighbor_sample(x: jax.Array) -> jax.Array:
    """(B, H, W, C) → (B·H·W, 5, 5, C) unmasked 5x5 neighbourhoods
    (``model/net.py:245-263``; defined-but-unused in the reference)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    rows = []
    for i in range(5):
        cols = [xp[:, i : i + h, j : j + w, :] for j in range(5)]
        rows.append(jnp.stack(cols, axis=3))
    t = jnp.stack(rows, axis=3)
    return t.reshape(b * h * w, 5, 5, c)


class PredictionModelContext(nn.Module):
    """Per-position MLP head over concatenated (y, h) context patches.

    Reference ``PredictionModel_Context`` (``model/net.py:289-319``):
    conv3 s1 → LReLU(0.2) → conv3 s2 → LReLU → conv3 s1 → LReLU → flatten →
    FC → split (μ, log σ → exp).  Patches are NHWC here; the FC input
    ordering therefore differs from torch's channel-major flatten — a pure
    permutation absorbed by the FC weights (training from scratch).
    """

    dim: int
    outdim: int

    def __call__(
        self, y_rounded: jax.Array, h_tilde: jax.Array, masked: bool = True
    ):
        b, h, w, cy = y_rounded.shape
        c = self.outdim // 2
        y_pat = block_sample(y_rounded, masked=masked)
        h_pat = block_sample(h_tilde, masked=False)
        merged = jnp.concatenate([y_pat, h_pat], axis=-1)  # (BHW, 4, 4, *)
        mu, sigma = self.head(merged)
        return (
            mu.reshape(b, h, w, c),
            sigma.reshape(b, h, w, c),
        )

    @nn.compact
    def head(self, merged: jax.Array):
        """Per-position MLP on prebuilt (P, 4, 4, cy+ch) patches →
        (μ, σ) each (P, outdim/2).  Shared by the full-image forward and
        the wavefront bitstream decode (``models/compress.py``), which
        gathers its own patches incrementally."""
        c = self.outdim // 2
        t = Conv2d(self.dim, kernel_size=3, stride=1, padding=1, name="c0")(merged)
        t = nn.leaky_relu(t, 0.2)
        t = Conv2d(self.dim, kernel_size=3, stride=2, padding=1, name="c1")(t)
        t = nn.leaky_relu(t, 0.2)
        t = Conv2d(self.dim, kernel_size=3, stride=1, padding=1, name="c2")(t)
        t = nn.leaky_relu(t, 0.2)
        t = t.reshape(t.shape[0], -1)  # (P, 2·2·dim)
        out = nn.Dense(self.outdim, name="fc")(t)
        return out[:, :c], jnp.exp(out[:, c:])
