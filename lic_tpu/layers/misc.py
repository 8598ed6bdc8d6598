"""Dormant-but-inventoried reference components, NHWC / flax.

Each of these exists in the reference tree unused by the live models; they
are kept as working, tested capabilities (SURVEY.md §2.2/2.3):

* ``MaskedConv2d``  — PixelCNN A/B weight-masked conv (``model/ops.py:8-20``)
* ``GSDN``          — generalized subtractive+divisive normalization
  (``model/ops.py:139-236``)
* ``space_to_depth`` / ``depth_to_space`` — r=2 pixel (un)shuffle
  (``model/net.py:151-180``)
* ``LinearAttention`` — kernelized linear attention
  (``model/attention.py:125-141``)
* ``SpatialSelfAttention`` — full-map 1x1-conv attention
  (``model/attention.py:144-194``)
* ``BlockTrain``    — 12-block ViT over latent tokens with multi-depth
  feature fusion (``model/Block_unet.py:96-167``)
* ``UnetHaHs`` / spatial ``UnetHa``/``UnetHs`` — the SpatialTransformer
  split-U-Net hyper pair superseded by the ``_new`` variants
  (``model/Block_unet.py:585-771``)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.bounds import lower_bound
from .blocks import ResidualBottleneck
from .conv import Conv2d, ConvTranspose2d
from .spatial_transformer import SpatialTransformer


class MaskedConv2d(nn.Module):
    """PixelCNN-style masked conv.  mask 'A' excludes the center pixel,
    'B' includes it; everything after the center (raster order) is zeroed."""

    features: int
    kernel_size: int = 5
    mask_type: str = "A"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (k, k, in_ch, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        mask = np.ones((k, k, 1, 1), np.float32)
        c = k // 2
        mask[c, c + (1 if self.mask_type == "B" else 0):] = 0.0
        mask[c + 1:] = 0.0
        y = jax.lax.conv_general_dilated(
            x, kernel * jnp.asarray(mask), (1, 1),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class GSDN(nn.Module):
    """Subtract a learned channel mixture, then divisively normalize
    (inverse order for the decoder side)."""

    num_features: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18

    @nn.compact
    def __call__(self, x):
        ch = self.num_features
        ped = self.reparam_offset ** 2
        beta_bound = (self.beta_min + ped) ** 0.5
        gamma_bound = self.reparam_offset

        def mk(name, init):
            return self.param(name, lambda k: init)

        beta = mk("beta", jnp.sqrt(jnp.ones((ch,)) + ped))
        gamma = mk("gamma", jnp.sqrt(self.gamma_init * jnp.eye(ch) + ped))
        beta2 = mk("beta2", jnp.zeros((ch,)))
        gamma2 = mk("gamma2", jnp.sqrt(self.gamma_init * jnp.eye(ch) + ped))

        def reparam(p, bound):
            return lower_bound(p, jnp.float32(bound)) ** 2 - ped

        def divisive(v):
            g = reparam(gamma, gamma_bound)
            b = reparam(beta, beta_bound)
            return jnp.sqrt(jnp.einsum("...i,oi->...o", v * v, g) + b)

        def subtractive(v):
            g = reparam(gamma2, gamma_bound)
            b = reparam(beta2, beta_bound)
            return jnp.einsum("...i,oi->...o", v, g) + b

        if self.inverse:
            x = x * divisive(x)
            return x + subtractive(x)
        x = x - subtractive(x)
        return x / divisive(x)


def space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jax.Array, r: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))


class LinearAttention(nn.Module):
    """Kernelized (softmax-keys) linear attention over the full map."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        k = jax.nn.softmax(k, axis=1)  # over positions
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), name="to_out")(out)


class SpatialSelfAttention(nn.Module):
    """GroupNorm + 1x1 q/k/v + full-map attention, residual."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(y).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k) * c ** -0.5, axis=-1
        )
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(out)


class BlockTrain(nn.Module):
    """12-block ViT over (H·W) latent tokens with cls token and multi-depth
    fusion: features from blocks {0, 4, 8, 12} are projected to quarter
    width, concatenated and fused back to ``out_channels``."""

    out_channels: int
    embed_dim: int = 256
    num_heads: int = 12

    @nn.compact
    def __call__(self, x):
        from .vit import ViTBlock

        b, h, w, c = x.shape
        tok = nn.Dense(self.embed_dim, name="chans_embed")(
            x.reshape(b, h * w, c)
        )
        cls = self.param(
            "cls_token", nn.initializers.zeros_init(), (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed", nn.initializers.zeros_init(),
            (1, h * w + 1, self.embed_dim),
        )
        y = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), tok], axis=1) + pos

        taps = []
        for i in range(12):
            y = ViTBlock(self.num_heads, name=f"block{i}")(y)
            if i in (3, 7, 11):
                taps.append(y[:, 1:])
        q = self.embed_dim // 4
        fused = [nn.Dense(q, name="fusion0")(tok)]
        for j, t in enumerate(taps):
            fused.append(nn.Dense(q, name=f"fusion{j + 1}")(t))
        out = nn.Dense(self.out_channels, name="fusion")(
            jnp.concatenate(fused, axis=-1)
        )
        return out.reshape(b, h, w, self.out_channels)


class UnetHaHs(nn.Module):
    """Single-module U-Net hyper (encoder+decoder fused;
    ``Block_unet.py:585-666``) with SpatialTransformer halves."""

    in_channels: int = 192
    out_channels: int = 320
    num_heads: int = 8
    depth: int = 3

    @nn.compact
    def __call__(self, x):
        nh, dep = self.num_heads, self.depth
        half = x.shape[-1] // 2
        c1 = Conv2d(half, kernel_size=1, name="conv1")(x[..., half:])
        t1 = SpatialTransformer(half, nh, max(half // nh, 1), dep, name="st1")(
            x[..., :half]
        )
        d1 = nn.relu(
            Conv2d(256, kernel_size=3, stride=2, padding=1, name="down1")(
                jnp.concatenate([c1, t1], axis=-1)
            )
        )
        c2 = Conv2d(128, kernel_size=1, name="conv2")(d1[..., 128:])
        t2 = SpatialTransformer(128, nh, 128 // nh, dep, name="st2")(
            d1[..., :128]
        )
        d2 = nn.relu(
            Conv2d(512, kernel_size=3, stride=2, padding=1, name="down2")(
                jnp.concatenate([c2, t2], axis=-1)
            )
        )
        m = ResidualBottleneck(512, name="mid0")(d2)
        m = SpatialTransformer(512, nh, 512 // nh, dep, name="mid_st")(m)
        m = ResidualBottleneck(512, name="mid1")(m)

        c3 = ConvTranspose2d(256, 1, 1, 0, 0, name="conv3")(m[..., 256:])
        t3 = SpatialTransformer(256, nh, 256 // nh, dep, name="st3")(
            m[..., :256]
        )
        u1 = nn.relu(
            ConvTranspose2d(256, 5, 2, 2, 1, name="up1")(
                jnp.concatenate([c3, t3], axis=-1)
            )
        )
        u1 = jnp.concatenate([u1, d1], axis=-1)
        u1 = nn.relu(ConvTranspose2d(256, 1, 1, 0, 0, name="up3")(u1))
        c4 = ConvTranspose2d(128, 1, 1, 0, 0, name="conv4")(u1[..., 128:])
        t4 = SpatialTransformer(128, nh, 128 // nh, dep, name="st4")(
            u1[..., :128]
        )
        u2 = nn.relu(
            ConvTranspose2d(320, 5, 2, 2, 1, name="up2")(
                jnp.concatenate([c4, t4], axis=-1)
            )
        )
        u2 = jnp.concatenate([u2, x], axis=-1)
        return ConvTranspose2d(self.out_channels, 1, 1, 0, 0, name="up4")(u2)


class UnetHa(nn.Module):
    """Dormant split-U-Net hyper *encoder* ``Unet_ha``
    (``model/Block_unet.py:669-726``): SpatialTransformer halves + 1x1 conv
    halves, two stride-2 downsamples, RB-ST-RB middle.  Returns
    ``(z, middle, skip1, inp)`` — the decoder-side skip tensors, exactly the
    reference's 4-tuple (``Block_unet.py:723-726``)."""

    in_channels: int = 192
    num_heads: int = 8
    depth: int = 3

    @nn.compact
    def __call__(self, x):
        nh, dep = self.num_heads, self.depth
        half = self.in_channels // 2
        # reference split order: (trans, conv) — Block_unet.py:708
        t1 = SpatialTransformer(half, nh, max(96 // nh, 1), dep, name="st1")(
            x[..., :half]
        )
        c1 = Conv2d(half, kernel_size=1, name="conv1")(x[..., half:])
        d1 = nn.relu(
            Conv2d(256, kernel_size=3, stride=2, padding=1, name="down1")(
                jnp.concatenate([c1, t1], axis=-1)
            )
        )
        c2 = Conv2d(128, kernel_size=1, name="conv2")(d1[..., :128])
        t2 = SpatialTransformer(128, nh, 128 // nh, dep, name="st2")(
            d1[..., 128:]
        )
        d2 = nn.relu(
            Conv2d(512, kernel_size=3, stride=2, padding=1, name="down2")(
                jnp.concatenate([c2, t2], axis=-1)
            )
        )
        m = ResidualBottleneck(512, name="mid0")(d2)
        m = SpatialTransformer(512, nh, 512 // nh, dep, name="mid_st")(m)
        m = ResidualBottleneck(512, name="mid1")(m)
        return m, m, d1, x


class UnetHs(nn.Module):
    """Dormant split-U-Net hyper *decoder* ``Unet_hs``
    (``model/Block_unet.py:729-770``): consumes the ``UnetHa`` 4-tuple,
    two deconv5-s2 upsamples with skip concatenations."""

    out_channels: int = 320
    num_heads: int = 8
    depth: int = 3

    @nn.compact
    def __call__(self, z, middle, skip1, inp):
        nh, dep = self.num_heads, self.depth
        # split order (trans, conv) — Block_unet.py:757
        t3 = SpatialTransformer(256, nh, 256 // nh, dep, name="st3")(
            middle[..., :256]
        )
        c3 = ConvTranspose2d(256, 1, 1, 0, 0, name="conv3")(middle[..., 256:])
        u1 = nn.relu(
            ConvTranspose2d(256, 5, 2, 2, 1, name="up1")(
                jnp.concatenate([c3, t3], axis=-1)
            )
        )
        u1 = jnp.concatenate([u1, skip1], axis=-1)
        u1 = nn.relu(ConvTranspose2d(256, 1, 1, 0, 0, name="up3")(u1))
        # split order (conv, trans) — Block_unet.py:764
        c4 = ConvTranspose2d(128, 1, 1, 0, 0, name="conv4")(u1[..., :128])
        t4 = SpatialTransformer(128, nh, 128 // nh, dep, name="st4")(
            u1[..., 128:]
        )
        u2 = nn.relu(
            ConvTranspose2d(320, 5, 2, 2, 1, name="up2")(
                jnp.concatenate([c4, t4], axis=-1)
            )
        )
        u2 = jnp.concatenate([u2, inp], axis=-1)
        return ConvTranspose2d(self.out_channels, 1, 1, 0, 0, name="up4")(u2)
