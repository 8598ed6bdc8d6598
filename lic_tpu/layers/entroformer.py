"""Entroformer: transformer entropy modeling blocks + the hyper/context
models the reference implies but does not ship.

Re-design of ``model/entroformer_helper.py`` (Config :12-69, PreNorm/
FeedForward :77-99, Attention with 2-D binned relative position bias and
contextual-product RPE :102-259, top-k score filtering :236-240, Block
:262-325).  The reference imports these in all ChARM nets but the consuming
module ``model/Block.py`` (``TransHyperScale``, referenced at
``model/Net_unet.py:862-863``) is missing from the tree (defect §8.1) — the
classes here supply that capability:

* ``TransHyperScale`` — transformer hyper encoder/decoder that shifts
  resolution by ``2^scale`` via space-to-depth patch merging (down) or
  depth-to-space expansion (up), with Entroformer blocks at each scale.
* ``EntroformerContext`` — masked-attention autoregressive context model
  over latent tokens (raster-causal or checkerboard two-pass), giving an
  AR entropy model that decodes in O(1) or O(2) passes on TPU instead of
  per-pixel sequencing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class EntroformerConfig:
    dim: int = 384
    num_layers: int = 6
    num_heads: int = 6
    dim_head: int = 64
    relative_attention_num_buckets: int = 5  # must be odd
    mlp_ratio: int = 4
    scale: bool = True
    attn_topk: int = -1
    is_decoder: bool = True


def relative_position_buckets(
    q_shape: Tuple[int, int], k_shape: Tuple[int, int], num_buckets: int
) -> np.ndarray:
    """2-D binned relative positions (static): bucket 0 holds everything
    beyond the L1 radius ``num_buckets // 2`` (``entroformer_helper.py:
    133-169``)."""
    if num_buckets % 2 == 0:
        # the reference asserts odd at construction; an even count would
        # emit indexes past the embedding table, which JAX gathers CLAMP
        # silently (in-radius pairs aliasing the last row, no diagnostic)
        raise ValueError(f"num_buckets must be odd, got {num_buckets}")
    half = num_buckets // 2
    qv, qh = q_shape
    kv, kh = k_shape
    rv = np.arange(kv)[None, :] - np.arange(qv)[:, None]  # (qv, kv)
    rh = np.arange(kh)[None, :] - np.arange(qh)[:, None]  # (qh, kh)
    # expand to full token grids
    rv_full = np.repeat(np.repeat(rv[:, None, :, None], qh, 1), kh, 3)
    rh_full = np.repeat(np.repeat(rh[None, :, None, :], qv, 0), kv, 2)
    ham = np.abs(rv_full) + np.abs(rh_full)
    buckets = (rv_full + half) * num_buckets + (rh_full + half)
    buckets = np.where(ham <= half, buckets, 0)
    return buckets.reshape(qv * qh, kv * kh).astype(np.int32)


class EntroformerAttention(nn.Module):
    """MHSA with contextual-product relative position: the per-pair bucket
    embedding (head_dim) is contracted against the query — scores += q·RPE."""

    cfg: EntroformerConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # (B, L, D)
        shape_2d: Tuple[int, int],
        mask: Optional[jax.Array] = None,   # (L, L) True = attend
        topk: int = -1,
    ) -> jax.Array:
        cfg = self.cfg
        b, l, d = x.shape
        nh, hd = cfg.num_heads, cfg.dim_head
        inner = nh * hd
        scale = d ** -0.5 if cfg.scale else 1.0

        qkv = nn.Dense(inner * 3, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        scores = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        )

        # contextual-product RPE: scores += q·table[bucket[l, m]].  The
        # naive (L², hd) bucket GATHER was the measured hot spot on TPU
        # (gathers don't vectorize; probe_codec_r4: the 2-pass context
        # dominated the entroformer roundtrip) — build the rows with a
        # one-hot MATMUL instead.  Bit-identical both ways: 0/1 operands
        # survive bf16 exactly, and the downstream DEFAULT-precision
        # einsum truncates rpe to bf16 on the MXU regardless (CPU keeps
        # full f32: a single 1.0·v product per row is exact).
        buckets = relative_position_buckets(
            shape_2d, shape_2d, cfg.relative_attention_num_buckets
        )
        nb = cfg.relative_attention_num_buckets ** 2
        table = nn.Embed(nb, hd, name="relative_attention_bias")
        emb = table(jnp.arange(nb))  # (nb, hd) — the full (tiny) table
        oh = (
            jnp.asarray(buckets)[:, :, None]
            == jnp.arange(nb)[None, None, :]
        ).astype(q.dtype)
        rpe = jnp.einsum("lmc,cd->lmd", oh, emb)  # (L, L, hd)
        ctx = jnp.einsum("blhd,lmd->bhlm", q, rpe)
        scores = (scores + ctx) * scale

        if mask is not None:
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(mask[None, None], scores, neg)

        if topk > 0 and topk < l:
            thresh = jax.lax.top_k(scores, topk)[0][..., -1:]
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(scores >= thresh, scores, neg)

        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", attn.astype(v.dtype), v)
        out = out.reshape(b, l, inner)
        return nn.Dense(
            d, use_bias=False, kernel_init=nn.initializers.zeros_init(),
            name="o",
        )(out)


class EntroformerBlock(nn.Module):
    """PreNorm attention + PreNorm LeakyReLU(0.2) MLP, residual."""

    cfg: EntroformerConfig

    @nn.compact
    def __call__(self, x, shape_2d, mask=None, topk=-1):
        h = nn.LayerNorm(name="ln_attn")(x)
        x = x + EntroformerAttention(self.cfg, name="attn")(
            h, shape_2d, mask, topk
        )
        h = nn.LayerNorm(name="ln_mlp")(x)
        h = nn.Dense(self.cfg.dim * self.cfg.mlp_ratio, name="fc1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(
            self.cfg.dim, kernel_init=nn.initializers.zeros_init(),
            name="fc2",
        )(h)
        return x + h


def _space_to_depth(x, r=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def _depth_to_space(x, r=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))


class TransHyperScale(nn.Module):
    """Transformer hyper transform over latent tokens, shifting resolution
    by ``2^scale`` (down=True: encoder; False: decoder)."""

    cin: int
    cout: int
    scale: int = 2
    down: bool = True
    cfg: EntroformerConfig = EntroformerConfig(dim=192, num_layers=2,
                                               num_heads=6, dim_head=32)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.shape[-1] != self.cin:
            raise ValueError(
                f"TransHyperScale expects cin={self.cin} channels, got "
                f"{x.shape[-1]}"
            )
        cfg = self.cfg
        d = cfg.dim
        x = nn.Dense(d, name="proj_in")(x)
        # blocks at input scale, then per scale: resample + blocks
        for s in range(self.scale + 1):
            h, w = x.shape[1], x.shape[2]
            tokens = x.reshape(x.shape[0], h * w, d)
            for i in range(cfg.num_layers):
                tokens = EntroformerBlock(cfg, name=f"s{s}_block{i}")(
                    tokens, (h, w), topk=cfg.attn_topk
                )
            x = tokens.reshape(x.shape[0], h, w, d)
            if s < self.scale:
                if self.down:
                    x = _space_to_depth(x)
                    x = nn.Dense(d, name=f"merge{s}")(x)
                else:
                    x = nn.Dense(4 * d, name=f"expand{s}")(x)
                    x = _depth_to_space(x)
        return nn.Dense(self.cout, name="proj_out")(x)


def raster_causal_mask(h: int, w: int) -> np.ndarray:
    """(L, L) raster causal mask, True = may attend — tril INCLUDING the
    diagonal: the raster path feeds inputs shifted by one position, so
    slot q holds y[q−1] and attending ≤ self exposes exactly the strict
    causal context (see ``EntroformerContext.__call__``, which uses this
    mask)."""
    return np.tril(np.ones((h * w, h * w), bool))


def checkerboard_masks(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Two-pass checkerboard: anchors (pass 1) see nothing (prior only);
    non-anchors (pass 2) see all anchors.  Returns (anchor_map(H,W) bool,
    attend_mask(L, L))."""
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    anchor = ((ii + jj) % 2 == 0)
    flat = anchor.reshape(-1)
    attend = np.broadcast_to(flat[None, :], (h * w, h * w)).copy()
    return anchor, attend


class EntroformerContext(nn.Module):
    """Masked-attention AR context model over latent tokens.

    Predicts per-position (μ, σ) for the latent from previously-decoded
    positions plus the hyper features, with decode-consistent information
    flow (no position ever conditions on its own value):

    * 'raster' — tokens carry the raster-shifted latent (token q embeds
      y[q−1], start token zero) under a causal mask; decode is strictly
      position-sequential (H·W device passes — no wavefront exists because
      every token attends ALL previous tokens).  TRAIN/ESTIMATE ONLY here:
      the codec instantiates 'checkerboard' for real bitstreams
      (``models/codec.py``); raster is kept as the faithful AR capability
      and for likelihood evaluation.
    * 'checkerboard' — two weight-shared passes: pass 1 predicts the anchor
      half from the hyper alone (y input zeroed), pass 2 predicts the
      non-anchor half seeing only anchor values.  Real decode finishes in
      2 device passes instead of H·W steps — the TPU-shaped AR model.

    Supplies the capability of the reference's missing ``model/Block.py``
    consumer of the entroformer blocks (defect §8.1).
    """

    latent_channels: int
    mode: str = "checkerboard"  # 'checkerboard' | 'raster'
    cfg: EntroformerConfig = EntroformerConfig(dim=192, num_layers=4,
                                               num_heads=6, dim_head=32)

    def setup(self):
        cfg = self.cfg
        self.embed_y = nn.Dense(cfg.dim)
        self.embed_h = nn.Dense(cfg.dim)
        self.blocks = [EntroformerBlock(cfg) for _ in range(cfg.num_layers)]
        self.head = nn.Dense(2 * self.latent_channels)

    def embed_hyper(self, hyper):
        """The passes' shared prefix: the hyper embedding is identical in
        both checkerboard passes — callers driving the two passes
        explicitly (``entro_pass_impl``) compute it once."""
        return self.embed_h(hyper)

    def _run(self, y_in, hyper, mask, shape_2d, h_emb=None):
        b = y_in.shape[0]
        h, w = shape_2d
        if h_emb is None:
            h_emb = self.embed_h(hyper)
        tok = self.embed_y(y_in) + h_emb
        tok = tok.reshape(b, h * w, self.cfg.dim)
        for blk in self.blocks:
            tok = blk(tok, shape_2d, mask=mask, topk=self.cfg.attn_topk)
        out = self.head(tok).reshape(b, h, w, 2 * self.latent_channels)
        mu, log_sigma = jnp.split(out, 2, axis=-1)
        return mu, jnp.exp(log_sigma)

    def __call__(
        self, y_hat: jax.Array, hyper: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """y_hat: (B, H, W, C) quantized latent; hyper: (B, H, W, Ch).
        Returns (mu, sigma), each (B, H, W, C)."""
        b, h, w, c = y_hat.shape

        if self.mode == "raster":
            flat = y_hat.reshape(b, h * w, c)
            shifted = jnp.concatenate(
                [jnp.zeros((b, 1, c), y_hat.dtype), flat[:, :-1]], axis=1
            ).reshape(b, h, w, c)
            mask = jnp.asarray(raster_causal_mask(h, w))
            return self._run(shifted, hyper, mask, (h, w))

        anchor, _ = checkerboard_masks(h, w)
        anchor_map = jnp.asarray(anchor, y_hat.dtype)[None, :, :, None]
        # pass 1: anchors from hyper only
        mu1, s1 = self._run(jnp.zeros_like(y_hat), hyper, None, (h, w))
        # pass 2: non-anchors see anchor values only
        mu2, s2 = self._run(y_hat * anchor_map, hyper, None, (h, w))
        mu = anchor_map * mu1 + (1 - anchor_map) * mu2
        sigma = anchor_map * s1 + (1 - anchor_map) * s2
        return mu, sigma
