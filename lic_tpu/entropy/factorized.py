"""Fully-factorized learned entropy model (EntropyBottleneck).

Re-implements the CompressAI ``EntropyBottleneck`` semantics the reference
depends on (``model/net_unet_ha_hs.py:745,882-889``; import at
``model/Net_unet.py:3``): a per-channel univariate density modeled by a
small monotone MLP (softplus matrices, tanh factors), with

* ``__call__`` → (outputs, likelihood): noise quantization at train time,
  medians-offset rounding at eval, likelihood = CDF(x+½) − CDF(x−½)
  lower-bounded at 1e-9 through the STE ``lower_bound``;
* ``medians`` — the learned per-channel mode offsets used by the models'
  ``z_hat = ste_round(z − median) + median`` path;
* ``aux_loss`` — drives the ``quantiles`` parameter to the tail-mass
  quantiles (needed for finite CDF support when building code tables).

Layout note: channels-last (NHWC) throughout; the per-channel MLP is a
stack of (C, f_out, f_in) einsums — tiny matmuls that XLA batches over C.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.bounds import lower_bound


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        filters = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        c = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            mat_init = float(np.log(np.expm1(1.0 / scale / filters[i + 1])))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda key, shape, v=mat_init: jnp.full(shape, v, jnp.float32),
                    (c, filters[i + 1], filters[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda key, shape: jax.random.uniform(
                        key, shape, jnp.float32, -0.5, 0.5
                    ),
                    (c, filters[i + 1], 1),
                )
            )
            if i < len(self.filters):
                factors.append(
                    self.param(
                        f"factor_{i}",
                        lambda key, shape: jnp.zeros(shape, jnp.float32),
                        (c, filters[i + 1], 1),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        init_q = jnp.tile(
            jnp.asarray([-self.init_scale, 0.0, self.init_scale], jnp.float32),
            (c, 1, 1),
        )
        self.quantiles = self.param("quantiles", lambda key: init_q)  # (C,1,3)

    def _logits_cumulative(self, inputs: jax.Array, stop_gradient: bool) -> jax.Array:
        """inputs: (C, 1, N) → logits (C, 1, N)."""
        logits = inputs
        k = len(self.filters) + 1
        for i in range(k):
            matrix = jax.nn.softplus(self._matrices[i])
            bias = self._biases[i]
            if stop_gradient:
                matrix = jax.lax.stop_gradient(matrix)
                bias = jax.lax.stop_gradient(bias)
            logits = jnp.einsum("cij,cjn->cin", matrix, logits) + bias
            if i < k - 1:
                factor = jnp.tanh(self._factors[i])
                if stop_gradient:
                    factor = jax.lax.stop_gradient(factor)
                logits = logits + factor * jnp.tanh(logits)
        return logits

    @property
    def medians(self) -> jax.Array:
        """Per-channel median offsets, shape (C,)."""
        return self.quantiles[:, 0, 1]

    def _likelihood(self, inputs: jax.Array) -> jax.Array:
        """inputs: (C, 1, N) in channel-major layout."""
        v0 = self._logits_cumulative(inputs - 0.5, stop_gradient=False)
        v1 = self._logits_cumulative(inputs + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(v0 + v1))
        return jnp.abs(
            jax.nn.sigmoid(sign * v1) - jax.nn.sigmoid(sign * v0)
        )

    def __call__(
        self,
        x: jax.Array,
        *,
        training: bool = True,
        key: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """x: (..., C) NHWC.  Returns (outputs, likelihood), both (..., C)."""
        c = self.channels
        assert x.shape[-1] == c
        shape = x.shape
        # channel-major flatten: (C, 1, N)
        perm = x.reshape(-1, c).T[:, None, :]

        medians = jax.lax.stop_gradient(self.quantiles[:, :, 1:2])  # (C,1,1)
        if training:
            assert key is not None, "training=True requires a PRNG key"
            noise = jax.random.uniform(key, perm.shape, perm.dtype, -0.5, 0.5)
            outputs = perm + noise
        else:
            outputs = jnp.round(perm - medians) + medians

        likelihood = self._likelihood(outputs)
        likelihood = lower_bound(
            likelihood, jnp.asarray(self.likelihood_bound, likelihood.dtype)
        )

        out = outputs[:, 0, :].T.reshape(shape)
        lik = likelihood[:, 0, :].T.reshape(shape)
        return out, lik

    def aux_loss(self) -> jax.Array:
        """|logits(quantiles) − target| — trains the tail quantiles only."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        target = float(np.log(2.0 / self.tail_mass - 1.0))
        targets = jnp.asarray([-target, 0.0, target], jnp.float32)
        return jnp.sum(jnp.abs(logits - targets))

    def pmf_table(
        self, min_sym: int, max_sym: int
    ) -> jax.Array:
        """Per-channel PMF over integer symbols ``[min_sym, max_sym]``
        relative to the channel median — feeds the rANS CDF builder."""
        symbols = jnp.arange(min_sym, max_sym + 1, dtype=jnp.float32)
        medians = self.quantiles[:, :, 1:2]  # (C,1,1)
        samples = symbols[None, None, :] + medians  # (C,1,S)
        v0 = self._logits_cumulative(samples - 0.5, stop_gradient=True)
        v1 = self._logits_cumulative(samples + 0.5, stop_gradient=True)
        sign = -jnp.sign(v0 + v1)
        pmf = jnp.abs(jax.nn.sigmoid(sign * v1) - jax.nn.sigmoid(sign * v0))
        return pmf[:, 0, :]  # (C, S)
