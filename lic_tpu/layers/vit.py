"""Vision Transformer (capability parity with ``model/vit_model.py``).

The reference vendors a full timm-style ViT (PatchEmbed :44-75, Block
:150-180, VisionTransformer :183-290) plus factory functions including a
miniature ``vit_base_patch16_224_in21k(img_size=16, patch_size=2,
embed_dim=12)`` intended as a 16x16-latent syntax extractor
(``model/net.py:466-467``, commented out).  It is imported by the training
driver and ``model/net.py`` but never instantiated — kept here as a working,
tested component.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import gelu


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding via strided conv (NHWC)."""

    patch_size: int = 16
    embed_dim: int = 768

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        b, h, w, _ = x.shape
        assert h % p == 0 and w % p == 0, f"({h},{w}) not divisible by {p}"
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID", name="proj"
        )(x)
        return x.reshape(b, (h // p) * (w // p), self.embed_dim)


class ViTAttention(nn.Module):
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * hd ** -0.5, k,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = x + ViTAttention(self.num_heads, self.qkv_bias, name="attn")(
            nn.LayerNorm(name="norm1")(x)
        )
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(c * self.mlp_ratio), name="fc1")(h)
        h = gelu(h)
        h = nn.Dense(c, name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """cls-token ViT classifier/feature extractor."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 0
    representation_size: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        tokens = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(x)
        n = tokens.shape[1]
        cls = self.param(
            "cls_token", nn.initializers.zeros_init(), (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, n + 1, self.embed_dim),
        )
        tokens = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), tokens], axis=1
        ) + pos
        for i in range(self.depth):
            tokens = ViTBlock(
                self.num_heads, self.mlp_ratio, name=f"block{i}"
            )(tokens)
        tokens = nn.LayerNorm(name="norm")(tokens)
        feat = tokens[:, 0]
        if self.representation_size:
            feat = jnp.tanh(
                nn.Dense(self.representation_size, name="pre_logits")(feat)
            )
        if self.num_classes:
            feat = nn.Dense(self.num_classes, name="head")(feat)
        return feat


def vit_base_patch16_224(num_classes: int = 1000) -> VisionTransformer:
    return VisionTransformer(224, 16, 768, 12, 12, num_classes=num_classes)


def vit_latent_syntax(num_classes: int = 16) -> VisionTransformer:
    """The reference's miniature factory (``vit_model.py:328-343``):
    img_size=16, patch_size=2, embed_dim=12 over the 16x16 latent."""
    return VisionTransformer(
        img_size=16, patch_size=2, embed_dim=12, depth=12, num_heads=12,
        num_classes=num_classes,
    )
