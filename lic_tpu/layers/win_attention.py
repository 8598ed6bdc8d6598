"""Swin-style window attention, NHWC-native.

Re-design of ``/root/reference/layers/win_attention.py`` (WindowAttention /
WinBasedAttention) and ``layers/layers.py:56-111`` (Win_noShift_Attention).

TPU notes: the reference's NCHW→NHWC permutes vanish here (we are NHWC
already); window partition/reverse are pure reshapes; the SW-MSA mask and
relative-position index are built with numpy at trace time (static shapes)
so they constant-fold into the compiled program.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ResidualBlock
from .conv import Conv2d

# Global switch for the fused Pallas W-MSA kernel (see layers/pallas_attn.py).
# Default None = AUTO: on iff the backend is a real TPU (probe_attn_e2e
# measured the fused path at 1.44× on the full flagship forward — 180.9 →
# 125.4 ms @512×768 b8 bf16, relerr 0 — the on-TPU path removes the ~400 MB
# fp32 logits round trip and all head-split/window relayouts).  CPU (tests,
# dryrun_multichip) resolves to the XLA path; `set_pallas_attn(True/False)`
# overrides either way, `set_pallas_attn(None)` restores auto.
_PALLAS_ATTN = {"enabled": None, "interpret": False, "fuse_proj": False}


def set_pallas_attn(enabled, interpret: bool = False, fuse_proj=None) -> None:
    """``fuse_proj``: fold the qkv/proj Dense matmuls into the kernel's
    strip tiles (pallas_attn.wba_fused_proj_apply) — the qkv tensor (the
    3C-wide largest intermediate) never round-trips HBM.  None keeps the
    current setting; the flag only matters when the fused path is active."""
    _PALLAS_ATTN["enabled"] = enabled
    _PALLAS_ATTN["interpret"] = interpret
    if fuse_proj is not None:
        _PALLAS_ATTN["fuse_proj"] = bool(fuse_proj)


def pallas_attn_enabled() -> bool:
    """Resolve the tri-state switch (trace-time, like every consumer)."""
    enabled = _PALLAS_ATTN["enabled"]
    if enabled is None:
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False
    return bool(enabled)


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, ws·ws, C)."""
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, window_size: int, h: int, w: int) -> jax.Array:
    """(B·nW, ws·ws, C) → (B, H, W, C)."""
    ws = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """Pairwise relative-position index into a (2ws-1)² bias table (static)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws², ws²)


def swin_shift_mask(
    h: int, w: int, ws: int, shift: int, pad_b: int = 0, pad_r: int = 0
) -> np.ndarray:
    """SW-MSA additive mask (nW, ws², ws²), 0 / -100 like the reference
    (``layers/win_attention.py:160-179``).  Static — built in numpy.

    ``pad_b``/``pad_r`` extend the canvas to (h+pad_b, w+pad_r) — must be
    window multiples — and give the pad tokens a unique region id, so real
    tokens never attend to padding (the reference only ever sees
    window-multiple shapes; this extends the domain without changing the
    divisible-shape behavior)."""
    hp, wp = h + pad_b, w + pad_r
    img_mask = np.zeros((1, hp, wp, 1), np.float32)
    if shift > 0:
        h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
        w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
        cnt = 0
        for hs in h_slices:
            for wsl in w_slices:
                img_mask[:, hs, wsl, :] = cnt
                cnt += 1
    if pad_b or pad_r:
        # pad flag lives on the UNROLLED canvas; the shift-region ids above
        # are already in post-roll coordinates, so roll the flag to match.
        pad = np.zeros((1, hp, wp, 1), np.float32)
        pad[:, h:, :, :] = 1.0
        pad[:, :, w:, :] = 1.0
        if shift > 0:
            pad = np.roll(pad, (-shift, -shift), axis=(1, 2))
        img_mask = img_mask + 100.0 * pad
    m = img_mask.reshape(1, hp // ws, ws, wp // ws, ws, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class _DenseParams(nn.Module):
    """Declares an nn.Dense-identical param tree WITHOUT applying it —
    the fully-fused Pallas path consumes the raw (kernel, bias) so the
    matmuls run inside the kernel, while checkpoints stay interchangeable
    with the nn.Dense execution paths (same names, shapes, inits)."""

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                jnp.float32,
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class WindowAttention(nn.Module):
    """W-MSA over already-partitioned windows, with relative position bias.

    Input: (B·nW, N=ws², C).  Reference: ``layers/win_attention.py:38-116``.
    """

    # dim is kept for signature parity with the reference module (channels
    # are derived from the input; the field itself is not read)
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array | None = None,
        *,
        mask_np: np.ndarray | None = None,
        mask_key=None,
    ) -> jax.Array:
        nh = self.num_heads
        ws = self.window_size

        # ONE param/index construction for both execution paths — the
        # shared "relative_position_bias_table" name is load-bearing for
        # checkpoint interchange between fused and XLA execution
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
            jnp.float32,
        )
        idx = relative_position_index(ws).reshape(-1)

        if x.ndim == 4:
            # Fused Pallas path: x is the padded+rolled (B, Hp, Wp, C) map;
            # windowing happens inside the kernel.  Same param tree as the
            # windows path (Dense applies over the last axis either way).
            from .pallas_attn import wba_fused_apply, wba_fused_proj_apply

            b4, hp, wp, c = x.shape
            n = ws * ws
            # rel_flat[i, h·n+m] = bias[idx(i,m), h]
            rel_flat = (
                bias_table[idx]
                .reshape(n, n, nh)
                .transpose(0, 2, 1)
                .reshape(n, nh * n)
            )
            if _PALLAS_ATTN["fuse_proj"]:
                # both Dense layers fold into the kernel; the params are
                # declared through _DenseParams twins so the tree ({"qkv":
                # {kernel, bias}, "proj": …}) stays interchangeable with
                # the nn.Dense paths below
                wqkv, bqkv = _DenseParams(
                    3 * c, use_bias=self.qkv_bias, name="qkv"
                )(c)
                wproj, bproj = _DenseParams(
                    c, kernel_init=nn.initializers.zeros_init(), name="proj"
                )(c)
                if bqkv is None:
                    bqkv = jnp.zeros((3 * c,), wqkv.dtype)
                return wba_fused_proj_apply(
                    x, rel_flat, wqkv, bqkv, wproj, bproj,
                    mask_np, mask_key,
                    ws=ws, nh=nh, interpret=_PALLAS_ATTN["interpret"],
                )
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
            out = wba_fused_apply(
                qkv,
                rel_flat,
                mask_np,
                mask_key,
                ws=ws,
                nh=nh,
                interpret=_PALLAS_ATTN["interpret"],
            )
            return nn.Dense(
                c, kernel_init=nn.initializers.zeros_init(), name="proj"
            )(out)

        bw, n, c = x.shape
        hd = c // nh
        scale = hd ** -0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        # stay in (bw, n, nh, hd) layout — einsums carry the head dim as a
        # batch axis directly, so no materialized (3, bw, nh, n, hd)
        # transpose (a ~226 MB relayout per call at the wam0 shape)
        qkv = qkv.reshape(bw, n, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )

        rel_bias = bias_table[idx].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + rel_bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, nh, n, n) + mask[None, :, None].astype(
                attn.dtype
            )
            attn = attn.reshape(bw, nh, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
        out = out.reshape(bw, n, c)
        # zero-init residual projection (see layers.blocks.residual_out_init)
        return nn.Dense(
            c, kernel_init=nn.initializers.zeros_init(), name="proj"
        )(out)


class WinBasedAttention(nn.Module):
    """Swin block: optional cyclic shift + (S)W-MSA + residual.

    Reference: ``layers/win_attention.py:119-209``.  DropPath rate is 0 in
    every reference instantiation, so the residual is plain.
    """

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        assert 0 <= ss < ws, "shift_size must be in [0, window_size)"
        shortcut = x

        # Non-window-multiple (or sub-window) spatial dims: pad bottom/right
        # to the window grid; pad tokens are masked out of every softmax and
        # the output is cropped back, so divisible shapes are untouched.
        pad_b, pad_r = (-h) % ws, (-w) % ws
        hp, wp = h + pad_b, w + pad_r
        need_mask = ss > 0 or pad_b or pad_r
        mask_np = (
            swin_shift_mask(h, w, ws, ss, pad_b, pad_r) if need_mask else None
        )
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))

        attn_mod = WindowAttention(
            dim=c, window_size=ws, num_heads=self.num_heads, name="attn"
        )
        # Fused path wins when there are enough windows to fill the grid;
        # at small spatial dims (e.g. the 32×48 latent WAMs) the XLA path
        # is marginally faster (measured), so gate by token count.
        use_fused = pallas_attn_enabled() and hp * wp >= 4096
        if use_fused:
            from .pallas_attn import flatten_mask

            flat = (
                flatten_mask(mask_np, hp // ws, wp // ws, self.num_heads)
                if need_mask
                else None
            )
            key = ("wba", h, w, ws, ss, pad_b, pad_r, self.num_heads)
            x = attn_mod(x, mask_np=flat, mask_key=key)
        else:
            mask = jnp.asarray(mask_np) if need_mask else None
            windows = window_partition(x, ws)
            attn = attn_mod(windows, mask=mask)
            x = window_reverse(attn, ws, hp, wp)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        return shortcut + x


class WinNoShiftAttention(nn.Module):
    """Two-branch window-attention gate: ``a · σ(b) + x``.

    ``conv_a`` = 3×ResidualBlock; ``conv_b`` = WinBasedAttention interleaved
    with 1x1/3x3/7x7 convs and ResidualBlocks.  Despite the name it *does*
    shift when ``shift_size > 0`` — exactly like the reference
    (``layers/layers.py:56-111``).
    """

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = self.dim
        wba = lambda name: WinBasedAttention(
            dim=n,
            num_heads=self.num_heads,
            window_size=self.window_size,
            shift_size=self.shift_size,
            name=name,
        )
        a = x
        for i in range(3):
            a = ResidualBlock(n, name=f"conv_a_{i}")(a)

        b = wba("wba0")(x)
        b = Conv2d(n, kernel_size=1, name="c1x1")(b)
        b = wba("wba1")(b)
        b = ResidualBlock(n, name="rb1")(b)
        b = Conv2d(n, kernel_size=3, padding=1, name="c3x3")(b)
        b = wba("wba2")(b)
        b = ResidualBlock(n, name="rb2")(b)
        b = Conv2d(n, kernel_size=7, padding=3, name="c7x7")(b)
        b = wba("wba3")(b)
        b = ResidualBlock(n, name="rb3")(b)

        return a * jax.nn.sigmoid(b) + x
