"""Image metrics in the reference's rounded 0..255 domain
(``model/net.py:864-869``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_255(x_pm1: jax.Array) -> jax.Array:
    """[−1, 1] → rounded/clamped 0..255 floats."""
    return jnp.round(jnp.clip((x_pm1 + 1.0) * 127.5, 0.0, 255.0))


def mse_255(x_pm1: jax.Array, y_pm1: jax.Array) -> jax.Array:
    """Per-image MSE after 0..255 rounding; gt is rounded, recon clamped —
    exactly the reference's accounting (``model/net.py:864-868``)."""
    gt = jnp.round((x_pm1 + 1.0) * 127.5)
    xh = to_255(y_pm1)
    return jnp.mean((xh - gt) ** 2, axis=(1, 2, 3))


def psnr_255(v_mse: jax.Array) -> jax.Array:
    return jnp.mean(20.0 * jnp.log10(255.0 / jnp.sqrt(v_mse)))
