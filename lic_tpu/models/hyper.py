"""Hyper-prior paths: classic conv, ELIC conv/subpel, split U-Net, latent U-Net.

* classic — ``model/net.py:185-216``: h_a = |x| → conv3 s1 → conv5 s2 → conv5
  s2 (ReLU between); h_s = deconv5 s2 → deconv5 s2 → conv3 s1 (ReLU between).
* elic — ``net_ga.py:811-846``: GELU conv stack down (320→288→256s2→224→192s2)
  and two subpel-upsampling heads (192→224↑2→256→288↑2→192).
* unet — ``Block_unet.py:774-891`` (``Unet_ha_new``/``Unet_hs_new``): split
  conv/window-attention branches, residual 1x1 fusions, skip tensors carried
  from encoder to decoder; z is the 512-ch middle at /4 of the latent.
* latent spatial U-Nets — ``Block_unet.py:418-582`` (``Unet``/``Unet_new``):
  latent-space mean/scale predictor with SpatialTransformer halves.

TPU note (shared decoder): the reference runs its hyper decoder twice with
identical inputs for scales and means (``net_unet_ha_hs.py:892-895``) — a 2×
waste that also makes scales == means EXACTLY (a degenerate coupling).
``UnetHyperSynthesis.two_heads`` evaluates the trunk once with a second
learned output projection: same compute shape, strictly more expressive
than the reference's duplicated pass (documented departure; set
``shared_hyper_decoder=False`` for the two-separate-decoders variant).

Known literal departure (documented, not a behavior change): the split
U-Net's STAGE-2 channel-half assignment is mirrored vs the reference —
``Unet_ha_new``/``Unet_hs_new`` give the conv branch channels [:128] at
their second splits (``Block_unet.py:828,881``) while this implementation
gives it [128:].  The two architectures are identical up to a fixed
permutation of the preceding 1x1/strided conv's output channels (which
training absorbs), so from-scratch behavior is unaffected; a torch-weight
importer would need to swap the halves.  Kept as-is because trained
checkpoints predate the observation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import (
    Conv2d,
    ConvTranspose2d,
    ResidualBlock3x3,
    ResidualBlock3_5,
    ResidualBlock5x5,
    ResidualBottleneck,
    SpatialTransformer,
    SubpelConv2d,
    WinBasedAttention,
)
from ..layers.blocks import gelu


# ---------------------------------------------------------------- classic

class ClassicHyperAnalysis(nn.Module):
    """|x| → conv3 s1 → ReLU → conv5 s2 → ReLU → conv5 s2 (N ch, /4)."""

    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = jnp.abs(x)
        x = Conv2d(n, kernel_size=3, stride=1, padding=1, name="c0")(x)
        x = nn.relu(x)
        x = Conv2d(n, kernel_size=5, stride=2, padding=2, name="c1")(x)
        x = nn.relu(x)
        x = Conv2d(n, kernel_size=5, stride=2, padding=2, name="c2")(x)
        return x


class ClassicHyperSynthesis(nn.Module):
    """deconv5 s2 → ReLU → deconv5 s2 → ReLU → conv3 s1 (N ch, ×4)."""

    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = ConvTranspose2d(n, 5, 2, 2, 1, name="d0")(x)
        x = nn.relu(x)
        x = ConvTranspose2d(n, 5, 2, 2, 1, name="d1")(x)
        x = nn.relu(x)
        x = Conv2d(n, kernel_size=3, stride=1, padding=1, name="c2")(x)
        return x


# ------------------------------------------------------------------ elic

class ElicHyperAnalysis(nn.Module):
    """GELU conv stack: N→320→288→256(s2)→224→192(s2) (``net_ga.py:811-821``)."""

    @nn.compact
    def __call__(self, x):
        dims = [(320, 1), (288, 1), (256, 2), (224, 1), (192, 2)]
        for i, (f, s) in enumerate(dims):
            x = Conv2d(f, kernel_size=3, stride=s, padding=1, name=f"c{i}")(x)
            if i < len(dims) - 1:
                x = gelu(x)
        return x


class ElicHyperSynthesis(nn.Module):
    """conv3 → subpel↑2 → conv3 → subpel↑2 → conv3 head (``net_ga.py:823-833``)."""

    out_channels: int = 192

    @nn.compact
    def __call__(self, x):
        x = Conv2d(192, kernel_size=3, padding=1, name="c0")(x)
        x = gelu(x)
        x = SubpelConv2d(224, r=2, name="up0")(x)
        x = gelu(x)
        x = Conv2d(256, kernel_size=3, padding=1, name="c1")(x)
        x = gelu(x)
        x = SubpelConv2d(288, r=2, name="up1")(x)
        x = gelu(x)
        x = Conv2d(self.out_channels, kernel_size=3, padding=1, name="c2")(x)
        return x


# ----------------------------------------------------------- split U-Net

class UnetHyperAnalysis(nn.Module):
    """``Unet_ha_new`` (``Block_unet.py:774-838``): split the channels into a
    conv half (ResidualBlock3_5 / 5x5) and a WinBasedAttention half at each
    scale, 1x1-fuse with a residual, downsample; z = 512-ch middle at /4.

    Returns ``(z, middle, skip1, inp)`` — the skip tensors the decoder needs.
    """

    in_channels: int = 192
    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        half = c // 2
        # reference splits (trans, conv) in that order: Block_unet.py:818
        trans_x = WinBasedAttention(half, self.num_heads, 4, 2, name="attn0")(
            x[..., :half]
        )
        conv_x = ResidualBlock3_5(half, name="conv1")(x[..., half:])
        d1 = Conv2d(c, kernel_size=1, name="down0")(
            jnp.concatenate([conv_x, trans_x], axis=-1)
        )
        d1 = d1 + x
        d1 = Conv2d(256, kernel_size=3, stride=2, padding=1, name="down1")(d1)
        d1 = gelu(d1)

        conv_y = ResidualBlock5x5(128, name="conv2")(d1[..., 128:])
        trans_y = WinBasedAttention(128, self.num_heads, 4, 2, name="attn1")(
            d1[..., :128]
        )
        d2 = Conv2d(256, kernel_size=1, name="down3")(
            jnp.concatenate([conv_y, trans_y], axis=-1)
        )
        d2 = d2 + d1
        d2 = Conv2d(512, kernel_size=3, stride=2, padding=1, name="down2")(d2)
        d2 = gelu(d2)

        m = ResidualBottleneck(512, name="mid0")(d2)
        m = WinBasedAttention(512, self.num_heads, 2, 1, name="mid_attn")(m)
        m = ResidualBottleneck(512, name="mid1")(m)
        return m, m, d1, x


class UnetHyperSynthesis(nn.Module):
    """``Unet_hs_new`` (``Block_unet.py:841-891``) with skip tensors.

    ``two_heads=True`` adds a second output projection so one decoder pass
    yields (scales, means) — replacing the reference's double forward.
    """

    out_channels: int = 192
    num_heads: int = 8
    two_heads: bool = False

    @nn.compact
    def __call__(self, z_hat, middle, skip1, inp):
        conv_u = ResidualBlock3x3(256, name="conv3")(middle[..., 256:])
        trans_u = WinBasedAttention(256, self.num_heads, 2, 1, name="attn3")(
            middle[..., :256]
        )
        u1 = Conv2d(512, kernel_size=1, name="up0")(
            jnp.concatenate([conv_u, trans_u], axis=-1)
        )
        u1 = u1 + middle
        u1 = ConvTranspose2d(256, 5, 2, 2, 1, name="up1")(u1)
        u1 = gelu(u1)

        u1 = jnp.concatenate([u1, skip1], axis=-1)
        u1 = Conv2d(256, kernel_size=1, name="up3")(u1)
        u1 = gelu(u1)

        conv_v = ResidualBlock3x3(128, name="conv4")(u1[..., 128:])
        trans_v = WinBasedAttention(128, self.num_heads, 2, 1, name="attn2")(
            u1[..., :128]
        )
        u2 = Conv2d(256, kernel_size=1, name="up5")(
            jnp.concatenate([conv_v, trans_v], axis=-1)
        )
        u2 = u2 + u1
        u2 = ConvTranspose2d(192, 5, 2, 2, 1, name="up2")(u2)
        u2 = gelu(u2)
        u2 = jnp.concatenate([u2, inp], axis=-1)
        out = ConvTranspose2d(self.out_channels, 1, 1, 0, 0, name="up4")(u2)
        if self.two_heads:
            out2 = ConvTranspose2d(self.out_channels, 1, 1, 0, 0, name="up4b")(u2)
            return out, out2
        return out


class DecodableUnetHyperSynthesis(nn.Module):
    """Decodable variant of the U-Net hyper decoder.

    The reference's ``Unet_hs_new`` consumes *encoder-side* activations as
    skip tensors — ``skip1`` (the /2-scale feature) and ``inp`` (the latent
    z3 itself) cross from ``Unet_ha_new`` (``net_unet_ha_hs.py:880,892``) —
    so no bitstream can reproduce them.  Here the skip pyramid is
    RE-SYNTHESIZED from the coded ẑ alone (two learned upsample stages),
    then fed through the same decoder topology.  This is the framework's
    shippable-flagship path: same capacity class, real bitstreams.
    """

    out_channels: int = 192
    num_heads: int = 8
    two_heads: bool = False

    @nn.compact
    def __call__(self, z_hat):
        skip1 = ConvTranspose2d(256, 5, 2, 2, 1, name="skip_up1")(z_hat)
        skip1 = gelu(skip1)
        inp = ConvTranspose2d(192, 5, 2, 2, 1, name="skip_up2")(skip1)
        inp = gelu(inp)
        return UnetHyperSynthesis(
            self.out_channels, self.num_heads, self.two_heads, name="body"
        )(z_hat, z_hat, skip1, inp)


# ------------------------------------------------- latent spatial U-Nets

class LatentUnet(nn.Module):
    """``Unet``/``Unet_new`` (``Block_unet.py:418-582``): latent-space (H/16)
    mean/scale predictor with SpatialTransformer halves and conv halves.

    ``variant='res'`` uses ResidualBottleneck conv branches (``Unet``, which
    splits (conv, trans)); ``'conv1x1'`` uses 1x1 convs (``Unet_new``, which
    splits (trans, conv)).  The stage-2 modules are *shared* between the
    down and up paths, exactly like the reference (``Block_unet.py:488-489``).
    ``two_heads`` gives a single-pass (scales, means) output — the reference
    calls the module twice with identical input (``Net_unet.py:1014-1015``).
    """

    in_channels: int = 192
    out_channels: int = 192
    num_heads: int = 8
    depth: int = 3
    variant: str = "res"
    two_heads: bool = False

    def setup(self):
        nh, dep = self.num_heads, self.depth
        half = self.in_channels // 2
        res = self.variant == "res"
        self.st1 = SpatialTransformer(half, nh, half // nh, dep)
        self.st2 = SpatialTransformer(128, nh, 128 // nh, dep)
        self.st3 = SpatialTransformer(256, nh, 256 // nh, dep)
        mk = (lambda f: ResidualBottleneck(f)) if res else (
            lambda f: Conv2d(f, kernel_size=1)
        )
        self.cb1 = mk(half)
        self.cb2 = mk(128)
        self.cb3 = mk(256)
        # up-stage-2 conv: Unet shares ResBlock2 between down and up
        # (Block_unet.py:473,490) but Unet_new keeps conv2/conv4 distinct
        # (:525,541) — only SpatialTransformer2 is shared there
        if not res:
            self.cb4 = mk(128)
        self.down1 = Conv2d(256, kernel_size=3, stride=2, padding=1)
        self.down2 = Conv2d(512, kernel_size=3, stride=2, padding=1)
        self.mid = [
            ResidualBottleneck(512),
            SpatialTransformer(512, nh, 512 // nh, dep),
            ResidualBottleneck(512),
        ]
        self.up1 = ConvTranspose2d(256, 5, 2, 2, 1)
        self.up2 = ConvTranspose2d(192, 5, 2, 2, 1)
        self.up3 = ConvTranspose2d(256, 1, 1, 0, 0)
        self.up4 = ConvTranspose2d(self.out_channels, 1, 1, 0, 0)
        if self.two_heads:
            self.up4b = ConvTranspose2d(self.out_channels, 1, 1, 0, 0)

    def _split(self, x, conv_mod, trans_mod, conv_first):
        """Apply (conv, trans) branches to the two channel halves.  The
        reference's half assignment differs per stage AND per variant:
        Unet splits (conv, trans) everywhere (Block_unet.py:466-491);
        Unet_new is (trans, conv) at stage 1 and the up-middle but
        (conv, trans) at both stage-2 splits (:552-578).  The concat
        order downstream is always (conv_out, trans_out)."""
        half = x.shape[-1] // 2
        if conv_first:
            return conv_mod(x[..., :half]), trans_mod(x[..., half:])
        return conv_mod(x[..., half:]), trans_mod(x[..., :half])

    def __call__(self, x):
        res = self.variant == "res"
        c, t = self._split(x, self.cb1, self.st1, conv_first=res)
        d1 = nn.relu(self.down1(jnp.concatenate([c, t], axis=-1)))
        c, t = self._split(d1, self.cb2, self.st2, conv_first=True)
        d2 = nn.relu(self.down2(jnp.concatenate([c, t], axis=-1)))
        m = d2
        for blk in self.mid:
            m = blk(m)
        c, t = self._split(m, self.cb3, self.st3, conv_first=res)
        u1 = nn.relu(self.up1(jnp.concatenate([c, t], axis=-1)))
        u1 = nn.relu(self.up3(jnp.concatenate([u1, d1], axis=-1)))
        # stage-2 modules on the up path: st2 always shared; the conv is
        # shared only for 'res' (see setup)
        c, t = self._split(
            u1, self.cb2 if res else self.cb4, self.st2, conv_first=True
        )
        u2 = nn.relu(self.up2(jnp.concatenate([c, t], axis=-1)))
        u2 = jnp.concatenate([u2, x], axis=-1)
        out = self.up4(u2)
        if self.two_heads:
            return out, self.up4b(u2)
        return out
