"""Conditional Gaussian entropy models.

* ``GaussianModel`` — the reference's own CDF-difference likelihood
  (``model/net.py:266-286``): ``Φ((x-μ+½)/σ) − Φ((x-μ-½)/σ)`` clamped from
  below (1e-8 in ``net.py:284``, 1e-12 in ``net_unet_ha_hs.py:466``).
* ``GaussianConditional`` — CompressAI semantics as used by the ChARM nets
  (``model/net_unet_ha_hs.py:669,937``): scale lower-bounded at 0.11 through
  the STE ``lower_bound``, erfc-based standardized cumulative, additive-noise
  quantization at train time / mean-offset rounding at eval, likelihood
  lower-bounded at 1e-9 through ``lower_bound``.

Both are pure functions of (inputs, scales, means) — no parameters — so they
live outside flax modules and jit/fuse freely.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.bounds import lower_bound


_SQRT2 = math.sqrt(2.0)


def _normal_cdf(x: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jax.lax.erf(x / _SQRT2))


def _standardized_cumulative(x: jax.Array) -> jax.Array:
    # CompressAI form: 0.5 * erfc(-x / sqrt(2)) — identical value, better
    # tail behaviour than 0.5*(1+erf).
    return 0.5 * jax.lax.erfc(-x / _SQRT2)


class GaussianModel:
    """Reference ``GaussianModel``: likelihood of the unit-bin integral."""

    def __init__(self, likelihood_bound: float = 1e-8):
        self.likelihood_bound = likelihood_bound

    def __call__(
        self, inputs: jax.Array, sigma: jax.Array, mu: jax.Array
    ) -> jax.Array:
        upper = _normal_cdf((inputs - mu + 0.5) / sigma)
        lower = _normal_cdf((inputs - mu - 0.5) / sigma)
        likelihood = upper - lower
        return jnp.clip(likelihood, min=self.likelihood_bound)


class GaussianConditional:
    """CompressAI-semantics conditional Gaussian.

    ``__call__(inputs, scales, means, training, key)`` returns
    ``(outputs, likelihood)`` like the torch module: outputs are
    noise-quantized at train time and mean-offset-rounded at eval.
    """

    def __init__(
        self,
        scale_bound: float = 0.11,
        likelihood_bound: float = 1e-9,
        tail_mass: float = 1e-9,
    ):
        self.scale_bound = scale_bound
        self.likelihood_bound = likelihood_bound
        self.tail_mass = tail_mass

    def quantize(
        self,
        inputs: jax.Array,
        mode: str,
        means: jax.Array | None = None,
        key: jax.Array | None = None,
    ) -> jax.Array:
        if mode == "noise":
            assert key is not None, "noise quantization needs a PRNG key"
            noise = jax.random.uniform(key, inputs.shape, inputs.dtype, -0.5, 0.5)
            return inputs + noise
        outputs = inputs if means is None else inputs - means
        outputs = jnp.round(outputs)
        if mode == "dequantize":
            return outputs if means is None else outputs + means
        assert mode == "symbols"
        return outputs.astype(jnp.int32)

    def likelihood(
        self, inputs: jax.Array, scales: jax.Array, means: jax.Array | None = None
    ) -> jax.Array:
        values = inputs if means is None else inputs - means
        scales = lower_bound(scales, jnp.asarray(self.scale_bound, scales.dtype))
        values = jnp.abs(values)
        upper = _standardized_cumulative((0.5 - values) / scales)
        lower = _standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def __call__(
        self,
        inputs: jax.Array,
        scales: jax.Array,
        means: jax.Array | None = None,
        *,
        training: bool = True,
        key: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        outputs = self.quantize(
            inputs, "noise" if training else "dequantize", means, key
        )
        likelihood = self.likelihood(outputs, scales, means)
        likelihood = lower_bound(
            likelihood, jnp.asarray(self.likelihood_bound, likelihood.dtype)
        )
        return outputs, likelihood
