"""Convolution helpers with PyTorch-parity padding arithmetic, NHWC.

The reference's transforms rely on two idiosyncratic paddings that must be
reproduced exactly for shape/value parity:

* down path:  ``ZeroPad2d((1, 2, 1, 2)) + Conv2d(k=5, s=2, p=0)``
  (``model/net.py:97-98``) — asymmetric (lo=1, hi=2) explicit padding.
* up path:    ``ZeroPad2d((1, 0, 1, 0)) + ConvTranspose2d(k=5, s=2, p=3,
  output_padding=1)`` (``model/net.py:128-129``) — together these map
  H → 2H exactly.

``ConvTranspose2d`` here implements torch's transposed-conv semantics via
``lax.conv_general_dilated`` with ``lhs_dilation`` (input dilation) and the
equivalent explicit padding ``(k-1-p, k-1-p+output_padding)`` — this is the
XLA-native formulation (a single fused conv, no scatter).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Pad = Union[int, Tuple[int, int, int, int], Sequence[Tuple[int, int]]]

# Variance-preserving (fan-in, gain 1) init.  The reference uses
# xavier_uniform (``weight_init``, net_unet_ha_hs.py:646-652), but xavier
# normalizes by fan_in+fan_out and collapses the forward scale through the
# 3→192-channel analysis stack: at init the latent std lands near 0.08,
# *every* value rounds to zero, and the whole decode path (g_s, syntax,
# LRP) is exactly dead — zero gradients, untrainable.  He (gain 2) is too
# hot the other way: most convs here feed GDN/linear stages, not ReLU, so
# gain 2 doubles variance per layer and the synthesis IGDN chain (which
# grows quadratically in its input) explodes on the outliers.  LeCun
# (gain 1, fan_in) keeps every stage at unit scale.
default_kernel_init = nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal"
)
default_bias_init = nn.initializers.zeros_init()


def _norm_padding(padding: Pad) -> Sequence[Tuple[int, int]]:
    """Normalize padding to ((top, bottom), (left, right)).

    Accepts an int (symmetric, torch ``padding=p``) or a 4-tuple in torch
    ``ZeroPad2d`` order ``(left, right, top, bottom)``.
    """
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    if len(padding) == 4 and all(isinstance(p, int) for p in padding):
        left, right, top, bottom = padding
        return ((top, bottom), (left, right))
    return tuple(padding)  # already ((t,b),(l,r))


# Global switch: lower 5×5/stride-2 convs through space-to-depth (dense
# 3×3 over 4·C channels) — see layers/s2d_conv.py.
_S2D_CONV = False


def set_s2d_conv(enabled: bool) -> None:
    global _S2D_CONV
    _S2D_CONV = bool(enabled)


# Global switch: lower wide-channel 5×5/stride-2 convs through the Pallas
# MXU kernel (layers/pallas_conv.py).  Forward = Pallas; backward = XLA's
# strided-conv VJP via jax.custom_vjp, so the path is trainable.  Gated to
# C_in ≥ 128 — below that the polyphase K-padding wastes more MXU time
# than XLA's own lowering (docs/PERF.md, layer-1 row).
_PALLAS_CONV = False
_PALLAS_INTERPRET = False  # tests: run the kernel interpreted on CPU


def set_pallas_conv(enabled: bool, interpret: bool = False) -> None:
    global _PALLAS_CONV, _PALLAS_INTERPRET
    _PALLAS_CONV = bool(enabled)
    _PALLAS_INTERPRET = bool(interpret)


# K-remainder-packed stride-1 k×k conv (layers/pallas_conv_s1.py): the
# flagship's WAM conv branches (3×3 ResidualBlocks, the 7×7 conv —
# reference layers/layers.py:87-111) at 128 < C ≤ 192.  Forward = Pallas,
# backward = XLA conv VJP.  None = auto (on when running on TPU);
# starts False until silicon-validated (see docs/PERF.md round 5).
_PACKED_CONV: Optional[bool] = False
_PACKED_INTERPRET = False


def set_packed_conv(enabled: Optional[bool], interpret: bool = False) -> None:
    global _PACKED_CONV, _PACKED_INTERPRET
    _PACKED_CONV = enabled
    _PACKED_INTERPRET = bool(interpret)


def _packed_conv_on() -> bool:
    if _PACKED_CONV is not None:
        return _PACKED_CONV
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


# Narrow-input convs (RGB entry layers: plain g_a layer 0, the rich
# transforms' full-resolution ResidualBottleneck(3) stack, HAN's first
# conv) starve the MXU: C_in=3 fills 3 of 128 systolic rows, and XLA's
# strided conv lowering runs them at ~3.4 TF/s (docs/PERF.md, g_a layer-1
# row — 6.7 ms of a 38 ms forward).  The im2col lowering concatenates the
# k² shifted strided slices into one (B·H'·W', k²·C_in) operand and runs a
# single dense matmul — K grows k²× (3→75 for the 5×5 entry conv), the
# slices/concat are pure HBM traffic on a tiny tensor, and the op becomes
# bandwidth-bound instead of MXU-starved.  Gated to small C_in where the
# k²× operand blowup is cheap.
#
# MEASURED OFF (scripts/perf_probe_r3.py, v5e): the k² strided slices on a
# 3-lane NHWC tensor lower pathologically (29.8 ms vs 6.4 ms XLA strided on
# the 512×768 entry conv) — every (w, c) row is 3/128 lanes occupied.  The
# winning narrow-input lowering is space-to-depth (see Conv2d below);
# im2col stays available for experiments via set_im2col_conv(True).
_IM2COL_CONV = False


def set_im2col_conv(enabled: bool) -> None:
    global _IM2COL_CONV
    _IM2COL_CONV = bool(enabled)


def _use_im2col(cin: int, k: int) -> bool:
    return _IM2COL_CONV and k > 1 and cin < 64 and cin * k * k <= 512


# Tiny-channel lowering switch (1×1-as-matmul + VPU stencil) — see the
# lowering functions below.  Default ON by measurement
# (scripts/perf_probe_r3.py § ResidualBottleneck(3) @512×768 b8 bf16:
# 11.55 ms XLA convs → 3.22 ms, bit-exact; ×3 blocks in the rich g_a).
_TINY_CONV = True


def set_tiny_conv(enabled: bool) -> None:
    global _TINY_CONV
    _TINY_CONV = bool(enabled)


def _use_1x1_matmul(cin: int, cout: int, k: int) -> bool:
    return _TINY_CONV and k == 1 and min(cin, cout) < 16


def _use_stencil(cin: int, cout: int, k: int, stride: int) -> bool:
    return _TINY_CONV and k > 1 and stride == 1 and cin * cout <= 32


# Narrow-input stride-2 convs (plain g_a layer 0: 5×5 3→192; rich rbs0:
# 3×3 3→192) via s2d + contiguous-slice im2col + one dot — see
# layers/s2d_conv.py::conv_s2d_im2col.  Default set by measurement.
_NARROW_S2D = False


def set_narrow_s2d(enabled: bool) -> None:
    global _NARROW_S2D
    _NARROW_S2D = bool(enabled)


def _use_narrow_s2d(cin: int, k: int, stride: int, padding, h: int, w: int) -> bool:
    if not (_NARROW_S2D and stride == 2 and cin <= 8 and h % 2 == 0 and w % 2 == 0):
        return False
    return (k == 5 and padding == (1, 2, 1, 2)) or (k == 3 and padding == 1)


@jax.custom_vjp
def _conv_narrow_s2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    from .s2d_conv import conv_s2d_im2col

    return conv_s2d_im2col(x, kernel)


def _conv_narrow_s2d_fwd(x, kernel):
    return _conv_narrow_s2d(x, kernel), (x, kernel)


def _conv_narrow_s2d_bwd(res, g):
    x, kernel = res
    k = kernel.shape[0]
    pad = ((1, 2), (1, 2)) if k == 5 else ((1, 1), (1, 1))

    def ref(xx, kk):
        return lax.conv_general_dilated(
            xx, kk, window_strides=(2, 2), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(ref, x, kernel)
    return vjp(g.astype(x.dtype))


_conv_narrow_s2d.defvjp(_conv_narrow_s2d_fwd, _conv_narrow_s2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_im2col(x: jax.Array, kernel: jax.Array, stride: int, padding) -> jax.Array:
    k = kernel.shape[0]
    cout = kernel.shape[-1]
    (pt, pb), (pleft, pright) = _norm_padding(padding)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pleft, pright), (0, 0)))
    b, hp, wp, c = xp.shape
    ho = (hp - k) // stride + 1
    wo = (wp - k) // stride + 1
    cols = jnp.concatenate(
        [
            lax.slice(
                xp,
                (0, a, bb, 0),
                (b, a + (ho - 1) * stride + 1, bb + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            for a in range(k)
            for bb in range(k)
        ],
        axis=-1,
    )
    # concat order (a, b, c_in) matches HWIO kernel.reshape(k*k*c, cout)
    y = lax.dot_general(
        cols.reshape(b * ho * wo, k * k * c),
        kernel.reshape(k * k * c, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(b, ho, wo, cout).astype(x.dtype)


def _conv_im2col_fwd(x, kernel, stride, padding):
    return _conv_im2col(x, kernel, stride, padding), (x, kernel)


def _conv_im2col_bwd(stride, padding, res, g):
    x, kernel = res

    def ref(xx, kk):
        return lax.conv_general_dilated(
            xx, kk, window_strides=(stride, stride),
            padding=_norm_padding(padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(ref, x, kernel)
    return vjp(g.astype(x.dtype))


_conv_im2col.defvjp(_conv_im2col_fwd, _conv_im2col_bwd)


# Tiny-channel lowerings.  The rich transforms' entry stack runs
# ResidualBottleneck(3) at FULL resolution: conv1x1 3→1, conv3x3 1→1,
# conv1x1 1→3 — XLA's conv op on 1–3-lane operands is pathological (the
# flagship g_a bill, scripts/profile_ga.py).  These ops are not matmul
# problems at all:
#   * a 1×1 conv IS a dot over channels — lower it as one;
#   * a k×k conv with cin·cout ≤ ~32 is a VPU stencil: Σ_taps w·shift(x),
#     k²·cin·cout multiply-adds per pixel, HBM-bound.
# Both are exact (same adds in a different order → fp32-tight).


def _conv_1x1_matmul(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    b, h, w, cin = x.shape
    y = lax.dot_general(
        x.reshape(b * h * w, cin),
        kernel.reshape(cin, -1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(b, h, w, -1).astype(x.dtype)


def _conv_stencil(
    x: jax.Array, kernel: jax.Array, stride: int, padding
) -> jax.Array:
    k = kernel.shape[0]
    (pt, pb), (pleft, pright) = _norm_padding(padding)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pleft, pright), (0, 0)))
    b, hp, wp, cin = xp.shape
    cout = kernel.shape[-1]
    ho = (hp - k) // stride + 1
    wo = (wp - k) // stride + 1
    acc = jnp.zeros((b, ho, wo, cout), jnp.float32)
    for a in range(k):
        for bb in range(k):
            sl = lax.slice(
                xp,
                (0, a, bb, 0),
                (b, a + (ho - 1) * stride + 1, bb + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1),
            ).astype(jnp.float32)
            # (B,H,W,cin) × (cin,cout) — cin·cout ≤ ~32: a broadcast
            # multiply-add chain the VPU eats, not a matmul
            acc = acc + jnp.einsum("bhwi,io->bhwo", sl, kernel[a, bb].astype(jnp.float32))
    return acc.astype(x.dtype)


def _xla_conv5s2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """XLA strided conv with the reference ZeroPad(1,2,1,2) arithmetic —
    the Pallas kernel's backward restatement."""
    return lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2),
        padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def _conv5s2_fast(x: jax.Array, kernel: jax.Array) -> jax.Array:
    from .pallas_conv import conv5s2_pallas

    return conv5s2_pallas(x, kernel, interpret=_PALLAS_INTERPRET)


def _conv5s2_fast_fwd(x, kernel):
    return _conv5s2_fast(x, kernel), (x, kernel)


def _conv5s2_fast_bwd(res, g):
    x, kernel = res
    _, vjp = jax.vjp(_xla_conv5s2, x, kernel)
    return vjp(g)


_conv5s2_fast.defvjp(_conv5s2_fast_fwd, _conv5s2_fast_bwd)


def _xla_convs1_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def _convs1_packed(x: jax.Array, kernel: jax.Array) -> jax.Array:
    from .pallas_conv_s1 import convk_s1_pallas

    return convk_s1_pallas(x, kernel, interpret=_PACKED_INTERPRET)


def _convs1_packed_fwd(x, kernel):
    return _convs1_packed(x, kernel), (x, kernel)


def _convs1_packed_bwd(res, g):
    x, kernel = res
    _, vjp = jax.vjp(_xla_convs1_same, x, kernel)
    return vjp(g)


_convs1_packed.defvjp(_convs1_packed_fwd, _convs1_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _convs1_packed_ba(x, kernel, bias, act):
    """Packed conv with bias + activation fused into the kernel epilogue
    (the LeakyReLU after every WAM-branch conv otherwise costs a full
    extra HBM pass — XLA cannot fuse INTO a pallas_call)."""
    from .pallas_conv_s1 import convk_s1_pallas

    return convk_s1_pallas(
        x, kernel, bias, act=act, interpret=_PACKED_INTERPRET
    )


def _xla_convs1_ba(x, kernel, bias, act):
    y = _xla_convs1_same(x, kernel) + bias.astype(x.dtype)
    if act == "leaky_relu":
        y = jax.nn.leaky_relu(y)
    return y


def _convs1_packed_ba_fwd(x, kernel, bias, act):
    return _convs1_packed_ba(x, kernel, bias, act), (x, kernel, bias)


def _convs1_packed_ba_bwd(act, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_convs1_ba(a, b, c, act), x, kernel, bias)
    return vjp(g)


_convs1_packed_ba.defvjp(_convs1_packed_ba_fwd, _convs1_packed_ba_bwd)


def _use_packed_s1(cin: int, k: int, stride: int, padding) -> bool:
    return (
        _packed_conv_on()
        and stride == 1
        and k in (3, 5, 7)
        and k > 1
        and 128 < cin <= 192
        and padding == k // 2
    )


class Conv2d(nn.Module):
    """NHWC conv with torch-style explicit padding.

    ``padding`` accepts an int (torch ``padding=p``) or a torch-``ZeroPad2d``
    4-tuple ``(left, right, top, bottom)`` so the reference's asymmetric
    ``(1, 2, 1, 2)`` down-padding transcribes directly.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Pad = 0
    use_bias: bool = True
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = default_bias_init
    dtype: Any = None
    # fused activation: callers that would apply this right after the conv
    # pass it here instead — the packed Pallas path runs it in-kernel, every
    # other path applies it post-bias, so semantics are caller-independent.
    fused_act: Any = None  # None | 'leaky_relu'

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        if (
            _PALLAS_CONV
            and k == 5
            and self.stride == 2
            and self.padding == (1, 2, 1, 2)
            and x.shape[-1] >= 128
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            y = _conv5s2_fast(x.astype(dtype), kernel.astype(dtype))
        elif _use_packed_s1(x.shape[-1], k, self.stride, self.padding):
            if self.use_bias or self.fused_act is not None:
                bias = (
                    self.param(
                        "bias", self.bias_init, (self.features,), jnp.float32
                    )
                    if self.use_bias
                    else jnp.zeros((self.features,), jnp.float32)
                )
                y = _convs1_packed_ba(
                    x.astype(dtype), kernel.astype(dtype),
                    bias.astype(dtype), self.fused_act,
                )
                return y  # bias + act already applied in-kernel
            y = _convs1_packed(x.astype(dtype), kernel.astype(dtype))
        elif (
            _S2D_CONV
            and k == 5
            and self.stride == 2
            and self.padding == (1, 2, 1, 2)
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            from .s2d_conv import conv5s2_s2d

            y = conv5s2_s2d(x.astype(dtype), kernel.astype(dtype))
        elif _use_im2col(x.shape[-1], k):
            pad = (
                self.padding
                if isinstance(self.padding, int)
                else tuple(self.padding)
            )
            y = _conv_im2col(
                x.astype(dtype), kernel.astype(dtype), self.stride, pad
            )
        elif _use_narrow_s2d(
            x.shape[-1], k, self.stride, self.padding, x.shape[1], x.shape[2]
        ):
            y = _conv_narrow_s2d(x.astype(dtype), kernel.astype(dtype))
        elif _use_1x1_matmul(x.shape[-1], self.features, k) and self.padding == 0:
            y = _conv_1x1_matmul(
                x.astype(dtype), kernel.astype(dtype), self.stride
            )
        elif _use_stencil(x.shape[-1], self.features, k, self.stride):
            y = _conv_stencil(
                x.astype(dtype), kernel.astype(dtype), self.stride, self.padding
            )
        else:
            y = lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(self.stride, self.stride),
                padding=_norm_padding(self.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        if self.fused_act == "leaky_relu":
            y = jax.nn.leaky_relu(y)
        elif self.fused_act is not None:
            raise ValueError(f"unknown fused_act {self.fused_act!r}")
        return y


class ConvTranspose2d(nn.Module):
    """Torch-semantics transposed conv (NHWC), shape parity:

    ``out = (in - 1) * stride - 2 * padding + kernel + output_padding``.

    Kernel stored HWIO in correlation orientation; relative to a torch
    checkpoint ``W_t[in, out, a, b]`` the mapping is
    ``kernel[a', b', in, out] = W_t[in, out, k-1-a', k-1-b']`` (spatial flip
    + axis permute) — handled by the checkpoint importer, irrelevant for
    training from scratch.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int = 2
    output_padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = default_bias_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, in_ch, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        out_h = (x.shape[1] - 1) * self.stride - 2 * self.padding + k \
            + self.output_padding
        out_w = (x.shape[2] - 1) * self.stride - 2 * self.padding + k \
            + self.output_padding
        div = out_h % self.stride == 0 and out_w % self.stride == 0
        if self.stride > 1 and div and self.features < 128:
            # few output channels starve the MXU lane dim in the dilated
            # lowering (192→16 at full res: 20.5 ms dilated vs 9.6 ms here);
            # the subpel lowering computes all s² phases as ONE dense conv
            # with s²·C_out lanes + a pixel shuffle — bit-identical output
            # (see layers/polyphase.py::conv_transpose2d_subpel, PERF.md)
            from .polyphase import conv_transpose2d_subpel

            y = conv_transpose2d_subpel(
                x.astype(dtype), kernel.astype(dtype), self.stride,
                self.padding, self.output_padding,
            )
        else:
            # XLA's lhs_dilation lowering is the fastest measured path for
            # wide outputs (46 TF/s vs 34 polyphase / 39 subpel at C=192 —
            # round-1's polyphase default was stale; docs/PERF.md)
            pad_lo = k - 1 - self.padding
            pad_hi = k - 1 - self.padding + self.output_padding
            y = lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(1, 1),
                padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class SubpelConv2d(nn.Module):
    """3x3 conv + pixel shuffle (sub-pixel upsampling).

    Reference: ``layers/layers.py:45-49`` (``subpel_conv3x3``).  Pixel-shuffle
    in NHWC is a pure reshape/transpose — XLA fuses it into the conv epilogue.
    """

    features: int
    r: int = 2
    kernel_size: int = 3
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r = self.r
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (k, k, x.shape[-1], self.features * r * r), jnp.float32,
        )
        bias = self.param(
            "bias", default_bias_init, (self.features * r * r,), jnp.float32
        )
        y = lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(x.dtype)
        b, h, w, _ = y.shape
        # torch PixelShuffle channel order: c_out-major, then (r, r).
        y = y.reshape(b, h, w, self.features, r, r)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(b, h * r, w * r, self.features)


def conv1x1(features: int, stride: int = 1, **kw) -> Conv2d:
    return Conv2d(features, kernel_size=1, stride=stride, padding=0, **kw)


def conv3x3(features: int, stride: int = 1, **kw) -> Conv2d:
    return Conv2d(features, kernel_size=3, stride=stride, padding=1, **kw)


def conv5x5(features: int, stride: int = 1, **kw) -> Conv2d:
    return Conv2d(features, kernel_size=5, stride=stride, padding=2, **kw)


def conv7x7(features: int, stride: int = 1, **kw) -> Conv2d:
    return Conv2d(features, kernel_size=7, stride=stride, padding=3, **kw)
