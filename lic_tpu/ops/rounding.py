"""Straight-through rounding / additive-noise quantizers.

* ``ste_round`` — forward ``round``, backward identity.  The reference spells
  this ``round(x) - x.detach() + x`` (``ops/ops.py:20-34`` and per-file dupes,
  e.g. ``model/net_unet_ha_hs.py:636-642``).
* ``bypass_round`` — an autograd.Function with the same semantics
  (``model/net.py:416-426``).  Kept as a separate name for API parity.
* ``noise_quant`` — train: ``x + U(-1/2, 1/2)``; eval: ``floor(x + 0.5)``;
  clamped to ``[-table_range, table_range - 1]``
  (``model/Net_unet.py:295-308``).  DORMANT parity op: every reference
  ChARM net *constructs* ``NoiseQuant(table_range=128)`` (e.g.
  ``model/source_net.py:695``) but no forward ever calls it — quantization
  goes through bypass_round / the entropy models' own noise instead.  The
  clamp is therefore intentionally absent from the model paths here too;
  the op is kept (and tested) for component parity only.
* ``quantize_ste_offset`` — ``ste_round(x - offset) + offset``, the
  medians-offset quantization used with the factorized entropy model
  (``model/net_unet_ha_hs.py:885-889``).

Rounding note: ``torch.round`` and ``jnp.round`` both round half-to-even,
so forward values agree bit-exactly in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ste_round(x: jax.Array) -> jax.Array:
    """Round with identity (straight-through) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


# Same forward/backward semantics; distinct name mirrors the reference API.
bypass_round = ste_round


def noise_quant(
    x: jax.Array,
    *,
    key: jax.Array | None = None,
    training: bool = False,
    table_range: int = 128,
) -> jax.Array:
    """Additive-uniform-noise (train) / half-up-floor (eval) quantizer."""
    if training:
        if key is None:
            raise ValueError("noise_quant(training=True) requires a PRNG key")
        noise = jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
        x_quant = x + noise
    else:
        x_quant = jnp.floor(x + 0.5)
    return jnp.clip(x_quant, -table_range, table_range - 1)


def quantize_ste_offset(x: jax.Array, offset: jax.Array) -> jax.Array:
    """``ste_round(x - offset) + offset`` (medians-offset STE quantization)."""
    return ste_round(x - offset) + offset


def additive_noise(key: jax.Array, x: jax.Array) -> jax.Array:
    """``x + U(-1/2, 1/2)`` — the train-mode relaxation used throughout the
    reference (e.g. ``model/net.py:672-674``)."""
    return x + jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
