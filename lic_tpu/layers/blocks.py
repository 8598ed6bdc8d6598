"""Residual blocks and the conv attention gate (CompressAI-lineage).

All blocks the reference pulls from ``compressai.layers`` plus the local
variants in ``model/Block_unet.py:295-415``.  NHWC, flax.linen.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv2d, SubpelConv2d
from .gdn import GDN


# Residual-branch output layers are zero-initialized (ReZero/Fixup style):
# with variance-preserving inits every residual add doubles variance, and
# the reference's deep residual/WAM stacks compound that to overflow (the
# rich g_s reaches 1e6x at init).  Zero-init branches start each block at
# identity; gradients into the zeroed layer are nonzero, so training
# proceeds normally.
residual_out_init = nn.initializers.zeros_init()


def leaky_relu(x, slope: float = 0.01):
    return nn.leaky_relu(x, negative_slope=slope)


def gelu(x):
    # torch nn.GELU default is the exact (erf) form.
    return nn.gelu(x, approximate=False)


class ResidualUnit(nn.Module):
    """1x1 → ReLU → 3x3 → ReLU → 1x1, residual, trailing ReLU.

    The inner unit of CompressAI's ``AttentionBlock`` (used via
    ``layers/layers.py:87-103``).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        n = self.features
        out = Conv2d(n // 2, kernel_size=1)(x)
        out = nn.relu(out)
        out = Conv2d(n // 2, kernel_size=3, padding=1)(out)
        out = nn.relu(out)
        out = Conv2d(n, kernel_size=1, kernel_init=residual_out_init)(out)
        out = out + x
        return nn.relu(out)


class ResidualBlock(nn.Module):
    """conv3x3 → LeakyReLU → conv3x3 → LeakyReLU (+1x1 skip on ch change).

    CompressAI ``ResidualBlock`` — the unit of ``Win_noShift_Attention``'s
    ``conv_a``/``conv_b`` branches (``layers/layers.py:87-102``).  The
    LeakyReLUs ride the conv epilogues (in-kernel on the packed Pallas
    path, where a separate activation costs a full extra HBM pass).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv2d(
            self.features, kernel_size=3, padding=1, fused_act="leaky_relu"
        )(x)
        out = Conv2d(
            self.features, kernel_size=3, padding=1,
            kernel_init=residual_out_init, fused_act="leaky_relu",
        )(out)
        if x.shape[-1] != self.features:
            identity = Conv2d(self.features, kernel_size=1)(x)
        return out + identity


class ResidualBlockWithStride(nn.Module):
    """conv3x3(s) → LeakyReLU → conv3x3 → GDN (+strided 1x1 skip).

    CompressAI ``ResidualBlockWithStride`` — the strided stage of the rich
    analysis transforms (``model/net_unet_ha_hs.py:211,222``).
    """

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        out = Conv2d(
            self.features, kernel_size=3, stride=self.stride, padding=1,
            fused_act="leaky_relu",
        )(x)
        out = Conv2d(
            self.features, kernel_size=3, padding=1,
            kernel_init=residual_out_init,
        )(out)
        out = GDN(self.features)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv2d(self.features, kernel_size=1, stride=self.stride)(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    """subpel3x3(r) → LeakyReLU → conv3x3 → IGDN (+subpel skip).

    CompressAI ``ResidualBlockUpsample`` (used by the dormant
    ``synthesisTransformModel_RBS``, ``model/Net_unet.py:371-419``).
    """

    features: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        out = SubpelConv2d(self.features, r=self.upsample)(x)
        out = leaky_relu(out)
        out = Conv2d(
            self.features, kernel_size=3, padding=1,
            kernel_init=residual_out_init,
        )(out)
        out = GDN(self.features, inverse=True)(out)
        identity = SubpelConv2d(self.features, r=self.upsample)(x)
        return out + identity


class ResidualBottleneck(nn.Module):
    """1x1(N→N/2) → GELU → 3x3 → GELU → 1x1(→N), residual.

    Reference: ``model/Block_unet.py:401-415``.
    """

    features: int
    act: Callable = gelu

    @nn.compact
    def __call__(self, x):
        n = self.features
        out = Conv2d(n // 2, kernel_size=1)(x)
        out = self.act(out)
        out = Conv2d(n // 2, kernel_size=3, padding=1)(out)
        out = self.act(out)
        out = Conv2d(n, kernel_size=1, kernel_init=residual_out_init)(out)
        return x + out


class ResidualBlock3x3(nn.Module):
    """conv3x3 → LReLU → conv3x3 → LReLU (+1x1 skip).  ``Block_unet.py:367-398``."""

    features: int

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv2d(
            self.features, kernel_size=3, padding=1, fused_act="leaky_relu"
        )(x)
        out = Conv2d(
            self.features, kernel_size=3, padding=1,
            kernel_init=residual_out_init, fused_act="leaky_relu",
        )(out)
        if x.shape[-1] != self.features:
            identity = Conv2d(self.features, kernel_size=1)(x)
        return out + identity


class ResidualBlock3_5(nn.Module):
    """conv3x3 → LReLU → conv5x5 → LReLU → conv3x3 → LReLU (+skip).

    ``Block_unet.py:295-332``.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv2d(
            self.features, kernel_size=3, padding=1, fused_act="leaky_relu"
        )(x)
        out = Conv2d(
            self.features, kernel_size=5, padding=2, fused_act="leaky_relu"
        )(out)
        out = Conv2d(
            self.features, kernel_size=3, padding=1,
            kernel_init=residual_out_init, fused_act="leaky_relu",
        )(out)
        if x.shape[-1] != self.features:
            identity = Conv2d(self.features, kernel_size=1)(x)
        return out + identity


class ResidualBlock5x5(nn.Module):
    """conv5x5 → LReLU (+skip) — ``Block_unet.py:335-364`` (only conv2 is live)."""

    features: int

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv2d(
            self.features, kernel_size=5, padding=2,
            kernel_init=residual_out_init, fused_act="leaky_relu",
        )(x)
        if x.shape[-1] != self.features:
            identity = Conv2d(self.features, kernel_size=1)(x)
        return out + identity


class AttentionBlock(nn.Module):
    """CompressAI conv attention gate: ``a · σ(b) + x``.

    ``conv_a`` = 3×ResidualUnit; ``conv_b`` = 3×ResidualUnit + 1x1.
    ``SWAtten`` (``model/Net_unet.py:212-233``) reuses the gate with a
    *different* input on the ``b`` branch — pass it as ``b_input``.
    """

    features: int

    @nn.compact
    def __call__(self, x, b_input=None):
        n = self.features
        a = nn.Sequential(
            [ResidualUnit(n), ResidualUnit(n), ResidualUnit(n)], name="conv_a"
        )(x)
        b = nn.Sequential(
            [
                ResidualUnit(n),
                ResidualUnit(n),
                ResidualUnit(n),
                Conv2d(n, kernel_size=1),
            ],
            name="conv_b",
        )(x if b_input is None else b_input)
        return a * jax.nn.sigmoid(b) + x
