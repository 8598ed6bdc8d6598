"""Haar wavelet transform (forward/inverse DWT).

The reference imports ``define_G`` from a missing ``model/Haar.py`` in ten
files (e.g. ``model/net.py:26``) and never calls it (the ``self.netG``
hookup is commented out, ``model/net.py:455``) — the name and commented
usage point at a Haar-based image rescaling front-end.  This module
provides the underlying capability as exact orthonormal Haar analysis /
synthesis, NHWC, pure reshapes + adds (VPU-only, fully fused by XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def haar_dwt2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) → (B, H/2, W/2, 4C): [LL ∥ LH ∥ HL ∥ HH] (orthonormal)."""
    a = x[:, 0::2, 0::2, :]
    b = x[:, 0::2, 1::2, :]
    c = x[:, 1::2, 0::2, :]
    d = x[:, 1::2, 1::2, :]
    ll = (a + b + c + d) * 0.5
    lh = (a - b + c - d) * 0.5
    hl = (a + b - c - d) * 0.5
    hh = (a - b - c + d) * 0.5
    return jnp.concatenate([ll, lh, hl, hh], axis=-1)


def haar_idwt2(y: jax.Array) -> jax.Array:
    """Inverse of :func:`haar_dwt2` (exact)."""
    c4 = y.shape[-1] // 4
    ll, lh, hl, hh = (
        y[..., :c4], y[..., c4 : 2 * c4], y[..., 2 * c4 : 3 * c4],
        y[..., 3 * c4 :],
    )
    a = (ll + lh + hl + hh) * 0.5
    b = (ll - lh + hl - hh) * 0.5
    c = (ll + lh - hl - hh) * 0.5
    d = (ll - lh - hl + hh) * 0.5
    bsz, h2, w2, ch = a.shape
    out = jnp.zeros((bsz, h2 * 2, w2 * 2, ch), y.dtype)
    out = out.at[:, 0::2, 0::2, :].set(a)
    out = out.at[:, 0::2, 1::2, :].set(b)
    out = out.at[:, 1::2, 0::2, :].set(c)
    out = out.at[:, 1::2, 1::2, :].set(d)
    return out


def haar_pyramid(x: jax.Array, levels: int = 2):
    """Multi-level Haar decomposition; returns the list of per-level
    subband tensors (the rescaling front-end ``define_G`` implies)."""
    out = []
    cur = x
    for _ in range(levels):
        cur = haar_dwt2(cur)
        out.append(cur)
        cur = cur[..., : cur.shape[-1] // 4]  # recurse on LL
    return out
