"""Weight-init schemes applied over a flax params pytree.

The reference's init family (``model/util.py:175-283``) is a set of
``model.apply(fn)`` tree-walkers: ``xavier_uniform_init`` /
``xavier_normal_init`` / ``kaiming_normal_init`` / ``vit2_init`` visit every
``Conv*``/``Linear`` module, re-initialize its weight, zero its bias, and
set norm layers to ones/zeros; ``_no_grad_trunc_normal_`` is the
erfinv-based bounded truncated normal they use for ViT linears.

The TPU-native equivalent operates on the *params pytree* (flax modules are
stateless): :func:`apply_init_scheme` walks ``params`` with paths, rewrites
every ``kernel`` leaf of rank ≥ 2 (conv HWIO / dense in-out) per the chosen
scheme with a per-leaf PRNG stream, zeroes ``bias`` leaves, and leaves
everything else (GDN beta/gamma reparameterizations, entropy-model CDF
params, relative-position tables) untouched — the same coverage as the
reference's isinstance checks.

Scheme note: the models *default* to LeCun init (see
``layers/conv.py::default_kernel_init`` — xavier leaves the latent dead at
init through the 3→192 stack; PARITY.md).  ``apply_init_scheme`` exists to
(a) reproduce the reference's literal ``weight_init`` behavior on demand
(``scripts/train_real.py --init_scheme xavier_uniform``) and (b) measure
that departure instead of only documenting it.
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform
xavier_normal = nn.initializers.xavier_normal
kaiming_normal = nn.initializers.kaiming_normal


def trunc_normal_array(
    key: jax.Array,
    shape: Tuple[int, ...],
    mean: float = 0.0,
    std: float = 1.0,
    a: float = -2.0,
    b: float = 2.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Bounded truncated normal, exact semantics of the reference's
    ``_no_grad_trunc_normal_`` (``model/util.py:229-257``): sample the
    truncated *standard* normal on [a, b] via uniform → erfinv, then scale
    by ``std`` and shift by ``mean`` (the bounds are in pre-scale units),
    then clamp to [a, b]."""
    lo = (1.0 + jax.scipy.special.erf(a / np.sqrt(2.0))) / 2.0
    hi = (1.0 + jax.scipy.special.erf(b / np.sqrt(2.0))) / 2.0
    u = jax.random.uniform(
        key, shape, dtype=jnp.float32, minval=2 * lo - 1, maxval=2 * hi - 1
    )
    x = jax.scipy.special.erfinv(u) * np.sqrt(2.0) * std + mean
    return jnp.clip(x, a, b).astype(dtype)


def trunc_normal(std: float = 0.02):
    """timm-style truncated normal as a flax initializer
    (``_no_grad_trunc_normal_(std=.02)``)."""

    def init(key, shape, dtype=jnp.float32):
        return trunc_normal_array(key, tuple(shape), std=std, dtype=dtype)

    return init


def _fans(shape: Tuple[int, ...]) -> Tuple[int, int]:
    """fan_in/fan_out for dense (I, O) and conv HWIO (kh, kw, I, O)."""
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive, shape[-1] * receptive


def _draw(key, scheme: str, shape, dtype):
    fan_in, fan_out = _fans(shape)
    if scheme == "xavier_uniform":
        limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(
            key, shape, dtype=dtype, minval=-limit, maxval=limit
        )
    if scheme == "xavier_normal":
        std = float(np.sqrt(2.0 / (fan_in + fan_out)))
        return jax.random.normal(key, shape, dtype=dtype) * std
    if scheme == "kaiming_normal":
        # torch kaiming_normal_ default: fan_in mode, leaky_relu a=0 → gain √2
        std = float(np.sqrt(2.0 / fan_in))
        return jax.random.normal(key, shape, dtype=dtype) * std
    if scheme == "lecun":
        std = float(np.sqrt(1.0 / fan_in))
        return trunc_normal_array(key, shape, std=std, dtype=dtype)
    if scheme == "vit2":
        # vit2_init: trunc_normal(0.02) for linears, xavier_uniform for
        # convs (``model/util.py:258-283``)
        if len(shape) == 2:
            return trunc_normal_array(key, shape, std=0.02, dtype=dtype)
        limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(
            key, shape, dtype=dtype, minval=-limit, maxval=limit
        )
    raise ValueError(f"unknown init scheme {scheme!r}")


SCHEMES = ("xavier_uniform", "xavier_normal", "kaiming_normal", "lecun", "vit2")


def apply_init_scheme(
    rng: jax.Array, params: Any, scheme: str = "xavier_uniform"
) -> Any:
    """Re-initialize every conv/dense kernel in ``params`` per ``scheme``.

    Mirrors the reference's ``net.apply(weight_init)`` pass
    (``net_unet_ha_hs.py:646-652``): kernels of rank ≥ 2 are redrawn,
    ``bias`` leaves are zeroed, norm ``scale``s forced to ones, and every
    other leaf (GDN beta/gamma, entropy-model tables, position biases) is
    left exactly as built.  Each leaf gets an independent stream derived
    from its path, so the result is insensitive to traversal order."""
    if scheme not in SCHEMES:
        raise ValueError(f"unknown init scheme {scheme!r}; pick from {SCHEMES}")

    def visit(path, leaf):
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        full = "/".join(str(getattr(k, "key", k)) for k in path)
        digest = int.from_bytes(
            hashlib.sha256(full.encode()).digest()[:4], "little"
        )
        key = jax.random.fold_in(rng, digest)
        if name == "kernel" and getattr(leaf, "ndim", 0) >= 2:
            return _draw(key, scheme, leaf.shape, leaf.dtype)
        if name == "bias":
            return jnp.zeros_like(leaf)
        if name == "scale" and getattr(leaf, "ndim", 0) == 1:
            return jnp.ones_like(leaf)  # LayerNorm/GroupNorm weight → 1
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def vit2_init(std: float = 0.02):
    """ViT linear init used for the transformer hyper modules
    (``model/util.py`` ``vit2_init`` linear branch)."""
    return trunc_normal(std)
