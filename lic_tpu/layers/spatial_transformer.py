"""Latent-space transformer (self+cross attention with GEGLU FF).

Re-design of ``/root/reference/model/attention.py:82-306`` — the
``SpatialTransformer`` used inside the latent U-Nets
(``model/Block_unet.py:428-457``).  NHWC; the NCHW↔token permutes of the
reference collapse to a single reshape.

Gradient checkpointing: the reference ships an opt-in checkpoint wrapper
(``model/attention.py:9-54``, default off).  Here the equivalent is
``remat=True``, which wraps each transformer block in ``nn.remat`` — the
XLA-native rematerialization that trades FLOPs for HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import gelu


class GEGLU(nn.Module):
    """x, gate = Linear(dim → 2·dim_out); out = x · gelu(gate)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        x, gate = jnp.split(nn.Dense(2 * self.dim_out, name="proj")(x), 2, axis=-1)
        return x * gelu(gate)


class FeedForward(nn.Module):
    """GEGLU (default) or Linear+GELU, then project back (mult=4)."""

    dim: int
    mult: int = 4
    glu: bool = True

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.glu:
            x = GEGLU(inner, name="geglu")(x)
        else:
            x = gelu(nn.Dense(inner, name="fc_in")(x))
        return nn.Dense(self.dim, name="fc_out")(x)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when ``context`` is None.

    Reference: ``model/attention.py:197-238``.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        h = self.heads
        inner = h * self.dim_head
        context = x if context is None else context

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, h, self.dim_head)
        k = k.reshape(b, m, h, self.dim_head)
        v = v.reshape(b, m, h, self.dim_head)

        scale = self.dim_head ** -0.5
        sim = jnp.einsum(
            "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
        out = out.reshape(b, n, inner)
        return nn.Dense(self.query_dim, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn→res; LN→cross-attn→res; LN→GEGLU FF→res."""

    dim: int
    n_heads: int
    d_head: int

    @nn.compact
    def __call__(self, x, context=None):
        x = CrossAttention(self.dim, self.n_heads, self.d_head, name="attn1")(
            nn.LayerNorm(name="norm1")(x)
        ) + x
        x = CrossAttention(self.dim, self.n_heads, self.d_head, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context=context
        ) + x
        x = FeedForward(self.dim, name="ff")(nn.LayerNorm(name="norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm(32) → 1x1 in → depth×transformer over tokens → zero-init 1x1
    out → + input.  Reference: ``model/attention.py:263-306``.
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    remat: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        y = nn.Conv(inner, (1, 1), name="proj_in")(y)
        y = y.reshape(b, h * w, inner)
        block_cls = BasicTransformerBlock
        if self.remat:
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=())
        for d in range(self.depth):
            y = block_cls(inner, self.n_heads, self.d_head, name=f"block_{d}")(
                y, context
            )
        y = y.reshape(b, h, w, inner)
        # zero-init output projection (reference zero_module, attention.py:289)
        y = nn.Conv(
            c, (1, 1), kernel_init=nn.initializers.zeros_init(), name="proj_out"
        )(y)
        return y + x_in
