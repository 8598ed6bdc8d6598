"""Analysis / synthesis transforms (g_a / g_s) — the three reference families.

* plain      — ``model/net.py:91-148`` (4× stride-2 conv5 + GDN / deconv5 + IGDN)
* plain_wam  — plain + ``Win_noShift_Attention`` gates
  (``source_net_WAM.py`` g_a at the 2nd GDN + output; g_s at input + 2nd IGDN)
* rich       — ``net_unet_ha_hs.py:197-232,287-326`` (ResidualBottleneck×3 +
  ResidualBlockWithStride + GDN at odd stages, padded conv5 at even stages,
  WAM gates)

All NHWC; spatial contract: g_a maps (H, W) → (H/16, W/16) and g_s inverts it
exactly for multiples of 16 (shape-parity tested against the torch padding
arithmetic).
"""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from ..layers import (
    GDN,
    Conv2d,
    ConvTranspose2d,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    ResidualBottleneck,
    WinNoShiftAttention,
)

# torch ZeroPad2d((1, 2, 1, 2)) + Conv2d(5, 2, 0): (left, right, top, bottom)
_DOWN_PAD = (1, 2, 1, 2)


def _chain(x, layers):
    for layer in layers:
        x = layer(x)
    return x


def _down5(features: int, name: str) -> Conv2d:
    return Conv2d(features, kernel_size=5, stride=2, padding=_DOWN_PAD, name=name)


class _Up5(nn.Module):
    """ZeroPad2d((1,0,1,0)) + ConvTranspose2d(5, 2, 3, output_padding=1):
    exact H → 2H (``model/net.py:128-129``).

    Round-5 note: folding the zero pre-pad row into the deconv padding
    (padding=1 + output trim, bit-identical) was tried and MEASURED SLOWER
    (10.0 vs 8.8 ms at the up3 shape — the subpel lowering re-pads
    internally for the shifted phase offsets and additionally pays the
    output slice), so the literal form stays.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        import jax.numpy as jnp

        x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        return ConvTranspose2d(
            self.features, kernel_size=5, stride=2, padding=3, output_padding=1,
            name="deconv",
        )(x)


class AnalysisTransform(nn.Module):
    """g_a: 3 → N channels, /16 spatial.

    ``prefix`` (static, profiling only): run just the first k steps of the
    rich sequence and return that intermediate — `profile_transform_r5`
    times cumulative prefixes so each step's marginal cost is measured
    WITH its real fusion context (single source of truth for the step
    list; ignored by the plain variants and in training).
    """

    N: int
    variant: str = "plain"  # 'plain' | 'plain_wam' | 'rich'
    prefix: int = -1

    def rich_steps(self):
        n = self.N
        steps = [
            ("rb0_x3", lambda x: _chain(
                x, [ResidualBottleneck(x.shape[-1], name=f"rb0_{i}")
                    for i in range(3)])),
            ("rbs0", lambda x: ResidualBlockWithStride(
                n, stride=2, name="rbs0")(x)),
            ("gdn0", lambda x: GDN(n, name="gdn0")(x)),
            ("down1", lambda x: _down5(n, "down1")(x)),
            ("gdn1", lambda x: GDN(n, name="gdn1")(x)),
            ("wam0", lambda x: WinNoShiftAttention(n, 8, 8, 4, name="wam0")(x)),
            ("rb1_x3", lambda x: _chain(
                x, [ResidualBottleneck(n, name=f"rb1_{i}") for i in range(3)])),
            ("rbs1", lambda x: ResidualBlockWithStride(
                n, stride=2, name="rbs1")(x)),
            ("gdn2", lambda x: GDN(n, name="gdn2")(x)),
            ("down3", lambda x: _down5(n, "down3")(x)),
            ("wam1", lambda x: WinNoShiftAttention(n, 8, 4, 2, name="wam1")(x)),
        ]
        return steps

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = self.N
        if self.variant in ("plain", "plain_wam"):
            wam = self.variant == "plain_wam"
            x = _down5(n, "down0")(x)
            x = GDN(n, name="gdn0")(x)
            x = _down5(n, "down1")(x)
            x = GDN(n, name="gdn1")(x)
            if wam:
                x = WinNoShiftAttention(n, 8, 8, 4, name="wam0")(x)
            x = _down5(n, "down2")(x)
            x = GDN(n, name="gdn2")(x)
            x = _down5(n, "down3")(x)
            if wam:
                x = WinNoShiftAttention(n, 8, 4, 2, name="wam1")(x)
            return x

        assert self.variant == "rich"
        steps = self.rich_steps()
        if self.prefix >= 0:
            steps = steps[: self.prefix]
        for _, fn in steps:
            x = fn(x)
        return x


class SynthesisTransform(nn.Module):
    """g_s: C_in → ``out_channels`` (M for syntax-decoder models, 3 direct),
    ×16 spatial."""

    N: int
    out_channels: int
    variant: str = "plain"  # 'plain' | 'plain_wam' | 'rich' | 'rbs'
    prefix: int = -1  # rich-variant profiling knob, see AnalysisTransform

    def rich_steps(self):
        n = self.N
        filters = [n, n, n, self.out_channels]
        return [
            ("wam0", lambda x: WinNoShiftAttention(
                x.shape[-1], 8, 4, 2, name="wam0")(x)),
            ("up0", lambda x: _Up5(filters[0], name="up0")(x)),
            ("igdn0", lambda x: GDN(filters[0], inverse=True, name="igdn0")(x)),
            ("up1", lambda x: _Up5(filters[1], name="up1")(x)),
            ("igdn1", lambda x: GDN(filters[1], inverse=True, name="igdn1")(x)),
            ("wam1", lambda x: WinNoShiftAttention(
                filters[1], 8, 8, 2, name="wam1")(x)),
            ("up2", lambda x: _Up5(filters[2], name="up2")(x)),
            ("igdn2", lambda x: GDN(filters[2], inverse=True, name="igdn2")(x)),
            ("up3", lambda x: _Up5(filters[3], name="up3")(x)),
            ("igdn3", lambda x: GDN(filters[3], inverse=True, name="igdn3")(x)),
        ]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = self.N
        filters = [n, n, n, self.out_channels]

        if self.variant == "plain":
            for i, f in enumerate(filters):
                x = _Up5(f, name=f"up{i}")(x)
                x = GDN(f, inverse=True, name=f"igdn{i}")(x)
            return x

        if self.variant == "plain_wam":
            x = WinNoShiftAttention(x.shape[-1], 8, 4, 2, name="wam0")(x)
            x = _Up5(filters[0], name="up0")(x)
            x = GDN(filters[0], inverse=True, name="igdn0")(x)
            x = _Up5(filters[1], name="up1")(x)
            x = GDN(filters[1], inverse=True, name="igdn1")(x)
            x = WinNoShiftAttention(filters[1], 8, 8, 4, name="wam1")(x)
            x = _Up5(filters[2], name="up2")(x)
            x = GDN(filters[2], inverse=True, name="igdn2")(x)
            x = _Up5(filters[3], name="up3")(x)
            x = GDN(filters[3], inverse=True, name="igdn3")(x)
            return x

        if self.variant == "rbs":
            return _rbs_body(x, filters)

        assert self.variant == "rich"
        # net_unet_ha_hs.py:287-326: WAM(ws4,ss2) in, WAM(ws8,ss2) mid
        steps = self.rich_steps()
        if self.prefix >= 0:
            steps = steps[: self.prefix]
        for _, fn in steps:
            x = fn(x)
        return x


def _rbs_body(x: jax.Array, filters: Sequence[int]) -> jax.Array:
    """Working assembly of ``synthesisTransformModel_RBS``
    (``model/Net_unet.py:371-419`` — broken in the reference: its
    ``__init__`` calls ``super(synthesisTransformModel, ...)`` and it is
    never instantiated).  Topology as written: WAM gate → three
    ResidualBottleneck triplets at each scale, CompressAI-style
    ResidualBlockUpsample for ×2 stages, IGDN activations, padded deconv5
    tail, including the live shape-preserving
    ``ConvTranspose2d(f0, f0, 3, stride=1, padding=1)`` after the first
    IGDN (``Net_unet.py:389``).  As written the class only upsamples ×8;
    the reference's commented-out second ``ResidualBlockUpsample``
    (``Net_unet.py:392``) is restored here so the g_s spatial contract
    (×16) holds.
    """
    f0, f1, f2, f3 = filters
    x = WinNoShiftAttention(x.shape[-1], 8, 4, 2, name="rbs_wam0")(x)
    x = ResidualBlockUpsample(f0, 2, name="rbs_up0")(x)
    for i in range(3):
        x = ResidualBottleneck(f0, name=f"rbs_rb0_{i}")(x)
    x = GDN(f0, inverse=True, name="rbs_igdn0")(x)
    x = ConvTranspose2d(
        f0, kernel_size=3, stride=1, padding=1, output_padding=0,
        name="rbs_deconv3",
    )(x)
    x = ResidualBlockUpsample(f1, 2, name="rbs_up1")(x)
    x = GDN(f1, inverse=True, name="rbs_igdn1")(x)
    x = WinNoShiftAttention(f1, 8, 8, 2, name="rbs_wam1")(x)
    for i in range(3):
        x = ResidualBottleneck(f1, name=f"rbs_rb1_{i}")(x)
    x = ResidualBlockUpsample(f2, 2, name="rbs_up2")(x)
    x = GDN(f2, inverse=True, name="rbs_igdn2")(x)
    for i in range(3):
        x = ResidualBottleneck(f2, name=f"rbs_rb2_{i}")(x)
    x = _Up5(f3, name="rbs_up3")(x)
    x = GDN(f3, inverse=True, name="rbs_igdn3")(x)
    return x
