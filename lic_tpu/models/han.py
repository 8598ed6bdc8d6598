"""HAN post-processing head (Holistic Attention Network, upsampler removed).

Re-design of ``/root/reference/model/han.py:12-285``: RCAB channel-attention
blocks in residual groups, layer attention (LAM) across the group outputs,
channel-spatial attention (CSAM) via a 3-D conv, and the DIV2K mean shift.
4 groups × 8 blocks (low rate) / 6 × 12 (high rate) — ``han.py:224-229``.

Output is 64 feature channels; the codec maps them to RGB with a second
per-image generated 1x1 conv (``model/net.py:813-817``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..layers import Conv2d

DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def mean_shift(x: jax.Array, sign: int, rgb_range: float = 1.0) -> jax.Array:
    """±DIV2K mean as a fixed shift (the intended semantics of the
    reference's frozen ``MeanShift`` conv, ``han.py:12-22``; note the
    ChARM nets accidentally re-randomize it via ``weight_init`` —
    defect not reproduced)."""
    mean = jnp.asarray(DIV2K_RGB_MEAN, x.dtype) * rgb_range
    return x + sign * mean


class CALayer(nn.Module):
    """Squeeze-excite channel attention (``han.py:90-106``)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.channels // self.reduction, kernel_size=1, name="fc0")(y)
        y = nn.relu(y)
        y = Conv2d(self.channels, kernel_size=1, name="fc1")(y)
        return x * jax.nn.sigmoid(y)


class RCAB(nn.Module):
    """conv3 → ReLU → conv3 → CA, residual (``han.py:179-198``)."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        r = Conv2d(self.features, kernel_size=3, padding=1, name="c0")(x)
        r = nn.relu(r)
        r = Conv2d(
            self.features, kernel_size=3, padding=1,
            kernel_init=nn.initializers.zeros_init(), name="c1",
        )(r)
        r = CALayer(self.features, self.reduction, name="ca")(r)
        return x + r


class ResidualGroup(nn.Module):
    """n×RCAB + conv3, residual (``han.py:201-215``).

    ``remat=True`` checkpoints each RCAB: HAN runs at FULL image
    resolution, so a group's 8–12 RCABs each pin several
    (B, H, W, 64) fp32 temps during backward — at phase-2 training shapes
    (batch 8, crop 256) that is ~8 GB per group and the train step OOMs.
    Per-RCAB remat keeps only block boundaries live (forward-only use is
    unaffected: ``jax.checkpoint`` changes nothing without a grad)."""

    features: int
    n_resblocks: int
    reduction: int = 16
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        Block = nn.remat(RCAB) if self.remat else RCAB
        r = x
        for i in range(self.n_resblocks):
            r = Block(self.features, self.reduction, name=f"rcab{i}")(r)
        r = Conv2d(
            self.features, kernel_size=3, padding=1,
            kernel_init=nn.initializers.zeros_init(), name="tail",
        )(r)
        return x + r


class LAMModule(nn.Module):
    """Layer attention across the N stacked group outputs (``han.py:108-138``).

    Input (B, N, H, W, C) → (B, H, W, N·C).
    """

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros_init(), (1,))
        flat = x.reshape(b, n, -1)
        energy = jnp.einsum("bnd,bmd->bnm", flat, flat)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", attn, flat).reshape(x.shape)
        out = gamma * out + x
        # (B, N, H, W, C) → (B, H, W, N·C), N-major channel order like the
        # reference's view(B, N·C, H, W)
        return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)


def _csam_conv3d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """3×3×3 single-channel 3-D conv over the (C, H, W) volume, lowered
    TPU-natively: NHWC stays put (C on the 128-lane axis) and the channel
    (depth) taps become three zero-padded channel shifts, each applied as a
    DEPTHWISE 3×3 conv whose per-channel kernels are the same (H, W) slice
    tiled across C.

    The naive NDHWC lowering carries a trailing feature dim of 1, which the
    TPU layout pads to 128 lanes — a 128× memory blow-up (16 GB of HLO temp
    at crop-256/batch-8 phase-2 training shapes; measured OOM).  This form
    is mathematically identical: cross-correlation with padding 1 on all
    three of (C, H, W), matching ``nn.Conv3d(1, 1, 3, padding=1)`` over the
    reference's (1, C, H, W) volume (``han.py:140-176``).

    kernel: (3, 3, 3) as (D, H, W) taps — ``out[c] = Σ_dd k[dd] ⊛ x[c+dd−1]``.
    """
    c = x.shape[-1]
    out = None
    for dd in range(3):
        # channel shift: contribution of input channel c+dd−1 to output c
        s = dd - 1
        if s < 0:
            xs = jnp.pad(x[..., :c + s], ((0, 0), (0, 0), (0, 0), (-s, 0)))
        elif s > 0:
            xs = jnp.pad(x[..., s:], ((0, 0), (0, 0), (0, 0), (0, s)))
        else:
            xs = x
        k = jnp.tile(kernel[dd][:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
        g = lax.conv_general_dilated(
            xs, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        out = g if out is None else out + g
    return out


class CSAMModule(nn.Module):
    """Channel-spatial attention via a 1-channel 3-D conv over (C, H, W)
    (``han.py:140-176``).  NHWC input; the conv lowers as channel-shifted
    depthwise stencils (see :func:`_csam_conv3d`) so no singleton feature
    dim ever reaches the TPU layout engine."""

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros_init(), (1,))
        kernel = self.param(
            "conv", nn.initializers.xavier_uniform(), (3, 3, 3, 1, 1), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (1,))
        # cast like Conv2d/ConvTranspose2d do — raw fp32 params with
        # bf16 activations would error only inside CSAM
        g = _csam_conv3d(x, kernel[..., 0, 0]) + bias.astype(x.dtype)
        g = jax.nn.sigmoid(g)
        g = gamma * g
        return x * g + x


class HANHead(nn.Module):
    """sub_mean → head conv → residual groups (+final conv) with LAM over the
    per-stage outputs and CSAM on the last → fuse → +head features.

    Output: 64 feature channels (``han.py:262-285``).
    """

    is_high: bool = False
    n_feats: int = 64
    reduction: int = 32
    # nested remat (group + per-RCAB) bounds backward memory at full image
    # resolution; free for forward-only apply, so on by default
    remat: bool = True

    @nn.compact
    def __call__(self, x):
        n_resgroups = 6 if self.is_high else 4
        n_resblocks = 12 if self.is_high else 8

        x = mean_shift(x, sign=-1)
        x = Conv2d(self.n_feats, kernel_size=3, padding=1, name="head")(x)

        Group = nn.remat(ResidualGroup) if self.remat else ResidualGroup
        res = x
        stages = []
        for i in range(n_resgroups):
            res = Group(
                self.n_feats, n_resblocks, self.reduction, remat=self.remat,
                name=f"group{i}",
            )(res)
            stages.append(res)
        res = Conv2d(self.n_feats, kernel_size=3, padding=1, name="body_tail")(res)
        stages.append(res)
        out1 = res

        # reference stacks newest-first (han.py:270-273)
        stacked = jnp.stack(stages[::-1], axis=1)  # (B, n+1, H, W, C)
        la = LAMModule(name="la")(stacked)  # (B, H, W, (n+1)·C)
        out2 = Conv2d(self.n_feats, kernel_size=3, padding=1, name="last_conv")(la)

        out1 = CSAMModule(name="csa")(out1)
        fused = jnp.concatenate([out1, out2], axis=-1)
        res = Conv2d(self.n_feats, kernel_size=3, padding=1, name="last")(fused)
        return res + x
