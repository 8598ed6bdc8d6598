"""Straight-through bound operators and the non-negative parametrizer.

Gradient semantics match the reference exactly (fp32 bit-exact target):

* ``lower_bound`` — forward ``max(x, bound)``; backward passes the incoming
  gradient iff ``x >= bound`` OR ``grad < 0`` (i.e. the step would move ``x``
  back toward the feasible region).  Reference: ``ops/bound_ops.py:21-27``
  and the in-model duplicates at ``model/gdn.py:11-28``, ``model/ops.py:58-74``.
* ``upper_bound`` — the mirror image (not used by the reference models but part
  of the CompressAI op family the reference vendored from).
* ``NonNegativeParametrizer`` — ``init: sqrt(max(x + pedestal, pedestal))``,
  ``apply: lower_bound(x)**2 - pedestal`` with ``pedestal = reparam_offset**2``.
  Reference: ``ops/parametrizers.py:23-49``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x: jax.Array, bound) -> jax.Array:
    """``max(x, bound)`` with the straight-through gradient described above."""
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    gx = jnp.where(pass_through, g, jnp.zeros_like(g))
    # bound is a non-trainable constant in the reference (returns None grad);
    # JAX requires a cotangent, so emit zeros of the right shape.
    gb = jnp.zeros_like(jnp.asarray(bound, dtype=g.dtype))
    return gx, gb


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x: jax.Array, bound) -> jax.Array:
    """``min(x, bound)`` with the mirrored straight-through gradient."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    gx = jnp.where(pass_through, g, jnp.zeros_like(g))
    gb = jnp.zeros_like(jnp.asarray(bound, dtype=g.dtype))
    return gx, gb


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


class NonNegativeParametrizer:
    """Stateless reparametrization keeping a parameter non-negative.

    Used by GDN/IGDN beta/gamma and the factorized entropy model.  This is a
    plain namespace of pure functions (no flax state) — the *stored* parameter
    lives in whatever module uses it; ``init`` maps an initial target value to
    storage space and ``__call__`` maps storage space back to the effective
    value.  Reference: ``ops/parametrizers.py:23-49``.
    """

    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2 ** -18):
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset ** 2
        self.bound = (self.minimum + self.reparam_offset ** 2) ** 0.5

    def init(self, x: jax.Array) -> jax.Array:
        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, x: jax.Array) -> jax.Array:
        out = lower_bound(x, jnp.asarray(self.bound, dtype=x.dtype))
        return out ** 2 - self.pedestal
