"""WMSA-family Swin blocks and the ChARM slice attention (SWAtten).

Re-design of ``/root/reference/model/Block_unet.py:170-277`` (WMSA /
Block_1 / Block_Hyper), ``model/Net_unet.py:165-233`` (SwinBlock / SWAtten).

The WMSA here differs from ``win_attention.WindowAttention`` the same way the
reference's two implementations differ: separate relative-position
parameterization (a (2w-1, 2w-1) table indexed per head) and a mask that only
touches the last window row/column (because of the cyclic roll).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import AttentionBlock, gelu
from .conv import Conv2d


def _wmsa_shift_mask(h_windows: int, w_windows: int, p: int, shift: int) -> np.ndarray:
    """Reference ``WMSA.generate_mask`` (``Block_unet.py:197-214``), static.

    Returns additive mask (nW, p², p²) with 0 / -inf entries.
    """
    m = np.zeros((h_windows, w_windows, p, p, p, p), dtype=bool)
    s = p - shift
    m[-1, :, :s, :, s:, :] = True
    m[-1, :, s:, :, :s, :] = True
    m[:, -1, :, :s, :, s:] = True
    m[:, -1, :, s:, :, :s] = True
    m = m.reshape(h_windows * w_windows, p * p, p * p)
    return np.where(m, -np.inf, 0.0).astype(np.float32)


def _wmsa_pad_mask(
    h: int, w: int, hp: int, wp: int, ws: int, shifted: bool
) -> np.ndarray:
    """Additive mask (nW, p², p²) hiding bottom/right pad tokens.

    Pad↔real pairs are -inf; pad↔pad stays 0 so no softmax row is ever
    all--inf (pad outputs are cropped anyway).  Static numpy."""
    pad = np.zeros((hp, wp), dtype=bool)
    pad[h:, :] = True
    pad[:, w:] = True
    if shifted:
        pad = np.roll(pad, (-(ws // 2), -(ws // 2)), axis=(0, 1))
    f = pad.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    f = f.reshape(-1, ws * ws)
    xor = f[:, :, None] ^ f[:, None, :]
    return np.where(xor, -np.inf, 0.0).astype(np.float32)


def _wmsa_relative_index(ws: int) -> np.ndarray:
    """(p², p², 2) index into the (2w-1, 2w-1) relative-position table."""
    cord = np.array([[i, j] for i in range(ws) for j in range(ws)])
    rel = cord[:, None, :] - cord[None, :, :] + ws - 1
    return rel  # (p², p², 2)


class WMSA(nn.Module):
    """Swin W/SW-MSA over (B, H, W, C) with per-head relative embeddings."""

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int
    block_type: str = "W"  # 'W' or 'SW'

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ws = self.window_size
        n_heads = self.input_dim // self.head_dim
        scale = self.head_dim ** -0.5
        b, h, w, c = x.shape
        # Non-window-multiple (or sub-window) dims: pad bottom/right to the
        # window grid; pad tokens are masked out of every softmax (pad↔pad
        # attends so no row is all--inf) and the output is cropped back —
        # divisible shapes keep the reference behavior exactly.
        assert self.block_type in ("W", "SW"), self.block_type
        pad_b, pad_r = (-h) % ws, (-w) % ws
        hp, wp = h + pad_b, w + pad_r
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        if self.block_type != "W":
            x = jnp.roll(x, shift=(-(ws // 2), -(ws // 2)), axis=(1, 2))

        hw_, ww_ = hp // ws, wp // ws
        xw = x.reshape(b, hw_, ws, ww_, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b, hw_ * ww_, ws * ws, c)

        qkv = nn.Dense(3 * self.input_dim, use_bias=True, name="embedding_layer")(xw)
        qkv = qkv.reshape(b, hw_ * ww_, ws * ws, 3, n_heads, self.head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # (b, nw, p², heads, hd) → heads-major einsum
        sim = jnp.einsum(
            "bwphc,bwqhc->bhwpq", q, k, preferred_element_type=jnp.float32
        ) * scale

        table = self.param(
            "relative_position_params",
            nn.initializers.truncated_normal(stddev=0.02),
            (2 * ws - 1, 2 * ws - 1, n_heads),
            jnp.float32,
        )
        rel = _wmsa_relative_index(ws)
        rel_emb = table[rel[..., 0], rel[..., 1]]  # (p², p², heads)
        sim = sim + rel_emb.transpose(2, 0, 1)[None, :, None].astype(sim.dtype)

        mask_np = None
        if self.block_type != "W":
            mask_np = _wmsa_shift_mask(hw_, ww_, ws, ws // 2)
        if pad_b or pad_r:
            pm = _wmsa_pad_mask(h, w, hp, wp, ws, self.block_type != "W")
            mask_np = pm if mask_np is None else mask_np + pm
        if mask_np is not None:
            sim = sim + jnp.asarray(mask_np)[None, None].astype(sim.dtype)

        probs = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhwpq,bwqhc->bwphc", probs.astype(v.dtype), v)
        out = out.reshape(b, hw_ * ww_, ws * ws, n_heads * self.head_dim)
        out = nn.Dense(
            self.output_dim, kernel_init=nn.initializers.zeros_init(),
            name="linear",
        )(out)

        out = out.reshape(b, hw_, ww_, ws, ws, self.output_dim)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, self.output_dim)
        if self.block_type != "W":
            out = jnp.roll(out, shift=(ws // 2, ws // 2), axis=(1, 2))
        if pad_b or pad_r:
            out = out[:, :h, :w]
        return out


class SwinTransformerBlock(nn.Module):
    """LN → WMSA → +res; LN → MLP(4x GELU) → +res.

    Reference ``Block_1`` / ``Block_Hyper`` (``Block_unet.py:165-188,255-277``;
    DropPath rate is 0 in every use).
    """

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int
    block_type: str = "W"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(name="ln1")(x)
        y = WMSA(
            self.input_dim,
            self.input_dim,
            self.head_dim,
            self.window_size,
            self.block_type,
            name="msa",
        )(y)
        x = x + y
        y = nn.LayerNorm(name="ln2")(x)
        y = nn.Dense(4 * self.input_dim, name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(
            self.output_dim, kernel_init=nn.initializers.zeros_init(),
            name="mlp_fc2",
        )(y)
        return x + y


class SwinBlock(nn.Module):
    """W block followed by SW block (``model/Net_unet.py:190-209``)."""

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = SwinTransformerBlock(
            self.input_dim,
            self.output_dim,
            self.head_dim,
            self.window_size,
            "W",
            name="block_1",
        )(x)
        x = SwinTransformerBlock(
            self.input_dim,
            self.output_dim,
            self.head_dim,
            self.window_size,
            "SW",
            name="block_2",
        )(x)
        return x


class SWAtten(nn.Module):
    """ChARM slice attention: 1x1 in → (AttentionBlock gate over SwinBlock
    branch) → 1x1 out.  Reference: ``model/Net_unet.py:212-233``.
    """

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int
    inter_dim: int | None = 192

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.inter_dim is None and self.output_dim != self.input_dim:
            raise ValueError(
                "SWAtten with inter_dim=None keeps the input width; "
                f"output_dim={self.output_dim} != input_dim={self.input_dim} "
                "would be silently ignored (the out_conv only exists on the "
                "inter_dim path)"
            )
        n = self.inter_dim if self.inter_dim is not None else self.input_dim
        if self.inter_dim is not None:
            x = Conv2d(n, kernel_size=1, name="in_conv")(x)
        z = SwinBlock(n, n, self.head_dim, self.window_size, name="non_local_block")(x)
        # a-branch sees x, b-branch sees the Swin features; residual adds x.
        out = AttentionBlock(n, name="gate")(x, b_input=z)
        if self.inter_dim is not None:
            out = Conv2d(self.output_dim, kernel_size=1, name="out_conv")(out)
        return out
