"""Padding utilities for arbitrary image sizes.

The reference pads eval images up to the next multiple of 64 *with ones* and
then normalizes bpp/PSNR over inconsistent pixel counts
(``eval_net.py:68-81``; defect §8.9).  Here:

* ``pad_to_multiple`` supports 'replicate' (default — the intended
  semantics, cf. the unused ``img_pad`` helper at ``model/util.py:160-172``),
  'ones' (strict reference parity) and 'zeros'.
* metrics are always computed on the *unpadded* region via ``unpad``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def padded_size(h: int, w: int, multiple: int = 64) -> Tuple[int, int]:
    ph = (h + multiple - 1) // multiple * multiple
    pw = (w + multiple - 1) // multiple * multiple
    return ph, pw


def pad_to_multiple(
    x: jax.Array, multiple: int = 64, mode: str = "replicate"
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Pad (B, H, W, C) on the bottom/right to multiples of ``multiple``.

    Returns (padded, (orig_h, orig_w)).
    """
    b, h, w, c = x.shape
    ph, pw = padded_size(h, w, multiple)
    if (ph, pw) == (h, w):
        return x, (h, w)
    pads = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
    if mode == "replicate":
        out = jnp.pad(x, pads, mode="edge")
    elif mode == "ones":
        out = jnp.pad(x, pads, constant_values=1.0)
    elif mode == "zeros":
        out = jnp.pad(x, pads)
    else:
        raise ValueError(mode)
    return out, (h, w)


def unpad(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    h, w = size
    return x[:, :h, :w, :]
