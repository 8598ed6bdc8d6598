"""Mixed precision.

The reference imports CUDA AMP autocast but only in dead code
(``model/Net_unet.py:84``; SURVEY §2.7).  The TPU equivalent: parameters
live in fp32; for bf16 execution the params and inputs are cast once and
flax's dtype inference runs the whole network in bf16 (MXU-native), with
the entropy likelihood math upcast where it matters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating-point leaves of a pytree to ``dtype``."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def bf16_params(params: Any) -> Any:
    return cast_floating(params, jnp.bfloat16)
