"""GDN / IGDN — generalized divisive normalization, NHWC channel-matmul form.

The reference computes the norm pool with a 1x1 conv over channels
(``F.conv2d(x**2, gamma.view(C, C, 1, 1), beta)``, ``model/gdn.py:85``).
In NHWC that 1x1 conv *is* a channel matmul — a single MXU op:

    ``norm[..., o] = sum_i gamma[o, i] * x[..., i]**2 + beta[o]``

Two inverse semantics exist in the reference tree and both are kept:

* ``GDN``  — ``y = x / sqrt(norm)``            (``model/gdn.py:86-89``)
* ``IGDN`` — ``y = x * sqrt(norm)``            (``model/gdn.py:150-154``;
  same as CompressAI ``GDN(inverse=True)`` used by ``ResidualBlockUpsample``)
* ``GDN1`` — abs variant ``y = x / norm`` with ``norm = Γ|x| + β``
  (``layers/gdn.py:86-104``; available but unused by the reference models)

Parameters are stored in NonNegativeParametrizer space exactly like the
reference (beta init ``sqrt(1 + ped)``, gamma init ``sqrt(0.1·I + ped)``)
so gradients through ``lower_bound`` are bit-exact in fp32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.bounds import NonNegativeParametrizer, lower_bound

# Global switch for the fused Pallas kernel (see layers/pallas_gdn.py).
# Toggle with `set_pallas_gdn(True)` — e.g. for TPU inference/bench runs.
_PALLAS_GDN = False


def set_pallas_gdn(enabled: bool) -> None:
    global _PALLAS_GDN
    _PALLAS_GDN = bool(enabled)


def pallas_gdn_enabled() -> bool:
    return _PALLAS_GDN


def _reparam_beta_gamma(module, ch, beta_min, gamma_init, reparam_offset):
    """beta/gamma stored via NonNegativeParametrizer (ops/bounds.py) — the
    single source for the lower_bound(x)**2 - pedestal reparameterization
    (it was previously restated inline here and in GDN1; same math, same
    param names/values)."""
    beta_rp = NonNegativeParametrizer(
        minimum=beta_min, reparam_offset=reparam_offset
    )
    gamma_rp = NonNegativeParametrizer(reparam_offset=reparam_offset)
    beta_p = module.param(
        "beta", lambda key: beta_rp.init(jnp.ones((ch,), jnp.float32))
    )
    gamma_p = module.param(
        "gamma",
        lambda key: gamma_rp.init(gamma_init * jnp.eye(ch, dtype=jnp.float32)),
    )
    return beta_rp(beta_p), gamma_rp(gamma_p)


class GDN(nn.Module):
    """Generalized divisive normalization: ``y = x / sqrt(beta + Γ x²)``."""

    num_features: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.num_features
        assert x.shape[-1] == ch, f"GDN expects {ch} channels, got {x.shape[-1]}"
        dtype = self.dtype or x.dtype
        beta, gamma = _reparam_beta_gamma(
            self, ch, self.beta_min, self.gamma_init, self.reparam_offset
        )

        xc = x.astype(dtype)
        if _PALLAS_GDN:
            from .pallas_gdn import gdn_fused

            return gdn_fused(
                xc, gamma.astype(dtype), beta.astype(dtype), self.inverse
            )
        # gamma[o, i]: output channel o pools squared input channel i —
        # identical orientation to the reference's conv weight view(C, C, 1, 1).
        norm = (
            jnp.einsum(
                "...i,oi->...o", xc * xc, gamma.astype(dtype),
                preferred_element_type=dtype,
            )
            + beta.astype(dtype)
        )
        if self.inverse:
            return xc * jnp.sqrt(norm)
        return xc / jnp.sqrt(norm)


def IGDN(num_features: int, **kw) -> GDN:
    """Reference IGDN: multiply by ``sqrt(norm)`` (``model/gdn.py:154``)."""
    return GDN(num_features=num_features, inverse=True, **kw)


class GDN1(nn.Module):
    """Simplified GDN (abs variant): ``y = x / (beta + Γ|x|)``.

    Reference: ``layers/gdn.py:86-104`` (available, unused by the models).
    """

    num_features: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.num_features
        beta, gamma = _reparam_beta_gamma(
            self, ch, self.beta_min, self.gamma_init, self.reparam_offset
        )
        norm = jnp.einsum("...i,oi->...o", jnp.abs(x), gamma) + beta
        if self.inverse:
            return x * norm
        return x / norm
