"""Rate-distortion loss and (MS-)SSIM.

* R-D: ``λ·255²·MSE + bpp`` with MSE in the [−1, 1] domain — exactly the
  reference objective (``train_net_unet.py:180``); MS-SSIM alternative
  ``λ·(1 − msssim) + bpp`` (``train_net_unet.py:83-85``).
* MS-SSIM implemented natively in JAX (the reference imports
  ``pytorch_msssim``): separable 11-tap Gaussian windows (σ=1.5), standard
  5-scale weights, 2×2 average-pool between scales.  All convs are
  depthwise NHWC — VPU-bound, fused by XLA.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jax.Array, kernel_1d: jax.Array) -> jax.Array:
    """Separable depthwise Gaussian blur, valid padding. x: (B, H, W, C)."""
    c = x.shape[-1]
    kh = jnp.tile(kernel_1d[:, None, None, None], (1, 1, 1, c))  # (K,1,1,C)
    kw = jnp.tile(kernel_1d[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x


def ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 1.0,
    return_cs: bool = False,
):
    """Mean SSIM over (B, H, W, C) images."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = jnp.asarray(_gaussian_kernel())

    mu_a = _blur(a, kernel)
    mu_b = _blur(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # variances are non-negative in exact math; fp32 cancellation on flat
    # regions can drive them slightly negative and push SSIM above 1
    sigma_aa = jnp.maximum(_blur(a * a, kernel) - mu_aa, 0.0)
    sigma_bb = jnp.maximum(_blur(b * b, kernel) - mu_bb, 0.0)
    sigma_ab = _blur(a * b, kernel) - mu_ab

    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    if return_cs:
        return jnp.mean(ssim_map), jnp.mean(cs)
    return jnp.mean(ssim_map)


def _avg_pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM (5 scales, standard weights)."""
    # every scale must leave >= the 11-tap VALID blur after its halving
    # pools — below that XLA errors with an opaque negative-dim conv
    # (pytorch_msssim documents the equivalent >160 constraint).  Small
    # images drop the finest-count scales and renormalize the weights
    # instead of crashing (full 5-scale metric for min(H, W) >= 176).
    levels = len(_MSSSIM_WEIGHTS)
    min_dim = min(a.shape[1], a.shape[2])
    while levels > 1 and (min_dim >> (levels - 1)) < 11:
        levels -= 1
    w_np = np.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = jnp.asarray(w_np / w_np.sum())
    vals = []
    for i in range(levels):
        s, cs = ssim(a, b, data_range=data_range, return_cs=True)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            a = _avg_pool2(a)
            b = _avg_pool2(b)
    vals = jnp.stack(vals)
    # standard formulation: prod(cs_i^w_i) * ssim_L^w_L.  Clamp with a
    # small EPSILON, not 0: d(v^w)/dv at v=0 is 0·∞ = NaN under autodiff,
    # and an early-training negative cs would poison every gradient (the
    # NaN guard would then abort the run)
    vals = jnp.maximum(vals, 1e-6)
    return jnp.prod(vals ** weights)


def msssim_db(v: jax.Array) -> jax.Array:
    """−10·log10(1 − msssim) — the form the reference prints
    (``model/Net_unet.py:1152-1156``)."""
    return -10.0 * jnp.log10(1.0 - v)


def rate_distortion_loss(
    bpp: jax.Array,
    mse: jax.Array,
    lmbda: float,
    loss_type: str = "mse",
    msssim_val: jax.Array | None = None,
) -> jax.Array:
    if loss_type == "mse":
        return lmbda * (255.0 ** 2) * mse + bpp
    assert msssim_val is not None
    return lmbda * (1.0 - msssim_val) + bpp
