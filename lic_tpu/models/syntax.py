"""Neural-syntax machinery: syntax extractor, dynamic decoder weights,
syntax entropy predictor.

* ``SyntaxModel`` — multi-scale pooling pyramid over the first M latent
  channels → M-dim global syntax vector.  'basic' = ``model/net.py:349-375``
  (2 downs); 'wam' = ``net_unet_ha_hs.py:533-570`` (3 downs, depthwise-
  separable convs + Win_noShift gate; the reference's missing
  ``DepthwiseSeparableConv`` is reconstructed as depthwise 3x3 + pointwise
  1x1, the standard definition its call sites imply).
* ``ConvGenerator`` — MLP 16→128→256→3·M mapping the syntax vector to the
  weights of the decoder's final 1x1 conv (``model/net.py:322-343``).
* ``batch_conv`` — applies per-image generated 1x1 kernels.  The reference
  plays a groups=b grouped-conv trick (``model/net.py:527-537``); on TPU a
  1x1 per-image conv is just a batched einsum.
* ``PredictionModelSyntax`` — pooled pyramid over the hyper features → FC →
  (μ, σ=exp) for the syntax vector (``model/net.py:378-413``).  NOTE the
  reference unpacks this swapped (σ,μ := μ,σ — confirmed bug, defect §8.10);
  we return ``(mu, sigma)`` and callers use the intended semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv2d, WinNoShiftAttention


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (reconstruction of the reference's
    missing ``model/DepthwiseSeparableConv.py``, defect §8.1)."""

    features: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(
            c, (3, 3), padding=1, feature_group_count=c, name="depthwise"
        )(x)
        x = Conv2d(self.features, kernel_size=1, name="pointwise")(x)
        return x


def _gap(x):
    """Global average pool to (B, 1, 1, C) — AdaptiveAvgPool2d(1)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


class SyntaxModel(nn.Module):
    """Pyramid: pool(x) ∥ pool(stages...) → 1x1 conv → (B, 1, 1, M)."""

    in_dim: int
    out_dim: int
    variant: str = "basic"  # 'basic' | 'wam'

    @nn.compact
    def __call__(self, syntax):
        outs = [_gap(syntax)]
        if self.variant == "basic":
            ds = Conv2d(32, kernel_size=3, stride=2, padding=1, name="down0")(syntax)
            ds = nn.relu(ds)
            outs.append(_gap(ds))
            ds = Conv2d(64, kernel_size=3, stride=2, padding=1, name="down1")(ds)
            ds = nn.relu(ds)
            outs.append(_gap(ds))
        else:
            ds = DepthwiseSeparableConv(self.in_dim, name="dw0")(syntax)
            ds = Conv2d(32, kernel_size=3, stride=2, padding=1, name="down0")(ds)
            ds = nn.relu(ds)
            outs.append(_gap(ds))
            ds2 = DepthwiseSeparableConv(32, name="dw1")(ds)
            ds2 = Conv2d(64, kernel_size=3, stride=2, padding=1, name="down1")(ds2)
            ds2 = nn.relu(ds2)
            ds2 = WinNoShiftAttention(64, 8, 4, 2, name="wam")(ds2)
            outs.append(_gap(ds2))
            ds3 = DepthwiseSeparableConv(64, name="dw2")(ds2)
            ds3 = Conv2d(128, kernel_size=3, stride=2, padding=1, name="down2")(ds3)
            ds3 = nn.relu(ds3)
            outs.append(_gap(ds3))
        out = jnp.concatenate(outs, axis=-1)
        return Conv2d(self.out_dim, kernel_size=1, name="out_conv")(out)


class ConvGenerator(nn.Module):
    """Syntax vector → per-image 1x1 conv weights (B, 3, out_dim)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = x.reshape(b, -1)
        x = nn.Dense(128, name="fc0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(256, name="fc1")(x)
        x = nn.leaky_relu(x, 0.2)
        # Output head init keeps the decode tail alive and linear at step 0:
        # - small kernel scale → the generated 1x1 kernels stay small, so the
        #   downstream tanh is in its linear region (a plain xavier head
        #   saturates it and kills every decode-path gradient);
        # - nonzero bias → the generated conv is a usable random projection
        #   even when the rounded syntax vector is all zeros at init (which
        #   it typically is), so g_s always receives gradient.
        x = nn.Dense(
            self.out_dim * 3,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_avg", "truncated_normal"
            ),
            bias_init=nn.initializers.normal(stddev=0.2),
            name="fc2",
        )(x)
        return x.reshape(b, 3, self.out_dim)


def batch_conv(weights: jax.Array, inputs: jax.Array) -> jax.Array:
    """Per-image generated 1x1 conv.

    weights: (B, C_out, C_in); inputs: (B, H, W, C_in) → (B, H, W, C_out).
    Replaces the reference's groups=B grouped-conv trick with a batched
    einsum (one MXU contraction per image, fused by XLA).
    """
    return jnp.einsum("bhwc,boc->bhwo", inputs, weights)


class PredictionModelSyntax(nn.Module):
    """Hyper features → pooled pyramid → FC → (μ, σ) for the syntax vector.

    'wam' adds a Win_noShift gate on the second downsample
    (``net_unet_ha_hs.py:573-610``).  Returns the *intended* (mu, sigma).
    """

    dim: int
    outdim: int
    variant: str = "basic"  # 'basic' | 'wam'

    @nn.compact
    def __call__(self, h_tilde):
        b = h_tilde.shape[0]
        c = self.outdim // 2
        ds0 = Conv2d(self.dim, kernel_size=3, stride=2, padding=1, name="down0")(
            h_tilde
        )
        ds0 = nn.relu(ds0)
        ds1 = Conv2d(self.dim, kernel_size=3, stride=2, padding=1, name="down1")(ds0)
        ds1 = nn.relu(ds1)
        if self.variant == "wam":
            ds1 = WinNoShiftAttention(self.dim, 8, 4, 2, name="wam")(ds1)
        ctx = jnp.concatenate([_gap(h_tilde), _gap(ds0), _gap(ds1)], axis=-1)
        ctx = ctx.reshape(b, -1)
        out = nn.Dense(self.outdim, name="fc")(ctx)
        mu = out[:, :c].reshape(b, 1, 1, c)
        sigma = jnp.exp(out[:, c:]).reshape(b, 1, 1, c)
        return mu, sigma
