"""Fused Swin window-attention Pallas TPU kernel.

Replaces the XLA lowering of ``WindowAttention`` (win_attention.py) between
the qkv and proj projections.  At the flagship's wam0 shape (b8 @128x192,
C=192, ws=8, nh=8 → 3072 windows x 64 tokens x head-dim 24) the XLA path is
bandwidth-bound, not FLOP-bound: the head split pads hd=24 minor dims to 128
lanes, the (bw, nh, 64, 64) fp32 logits are ~400 MB of HBM round trips, and
window partition/reverse are two more full-tensor relayouts.  This kernel
keeps one window-row strip in VMEM and never materializes logits in HBM.

Two tricks keep the tiny per-head matmuls MXU-shaped without 3D relayouts:

* **Block-diagonal heads** — all-head logits in ONE matmul per window:
  ``L[i, h·n+m] = Σ_c q[i,c]·k[m,c]·[head(c)=h]`` = ``q @ K'`` where
  ``K'[c, h·n+m] = kᵀ[c, m]·headmask`` is built by a lane-tile + static
  0/1 mask (pure VPU).  The AV product uses the mirrored ``V'``.
* **Segment softmax by matmul** — per-(row, head) softmax over the flat
  (n, nh·n) logits uses per-head maxes (static slices + broadcast concat;
  a single global row max would underflow a low-logit head's whole exp
  segment) and 0/1 segment-sum matrices, so no (n, nh, n) reshape.

The relative-position bias is passed pre-flattened (n, nh·n) fp32; the
SW-MSA/pad mask (static numpy, see win_attention.swin_shift_mask) is passed
pre-broadcast as (nWh, nWw, n, nh·n) bf16 and its block is re-used across
the batch sweep (grid order nWh, nWt, B).

Backward (training) is the VJP of a plain-jnp restatement (`_wba_reference`)
with recompute — matmul-shaped and MXU-bound, like pallas_gdn's bwd.

Reference behavior: /root/reference/layers/win_attention.py:38-116 (q·kᵀ
scale, additive rel-pos bias, per-window additive mask, softmax, ·v).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_masks(c: int, nh: int, n: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Static 0/1 masks for the block-diagonal head trick.

    kmask: (c, nh·n) — kmask[cc, h·n+m] = 1 iff head(cc) == h
    vmask: (nh·n, c) — vmask[h·n+m, cc] = 1 iff head(cc) == h
    """
    hd = c // nh
    head_of_c = np.arange(c) // hd  # (c,)
    h_of_col = np.repeat(np.arange(nh), n)  # (nh·n,)
    kmask = (head_of_c[:, None] == h_of_col[None, :]).astype(dtype)
    return kmask, kmask.T.copy()


def _segment_mats(nh: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """0/1 matrices for per-head segment reductions on flat (·, nh·n) rows.

    seg_sum: (nh·n, nh) — column h sums the h-th n-wide segment
    seg_bcast: (nh, nh·n) — broadcasts an (·, nh) vector back per segment
    """
    h_of_col = np.repeat(np.arange(nh), n)
    seg_sum = (h_of_col[:, None] == np.arange(nh)[None, :]).astype(np.float32)
    return seg_sum, seg_sum.T.copy()


def _attend_window(
    w, rel, kmask, vmask, seg_sum, seg_bcast, mask_j, *, n, nh, c
):
    """One window's fused attention body: (n, 3c) qkv → (n, c) output.

    Shared by the plain and the fused-projection kernels.  Segment softmax
    over each n-wide head segment: the shift must be PER-HEAD — a global
    row max is algebraically valid but a head whose logits sit ~90 below
    another head's would underflow its whole exp segment to 0 and divide
    by zero (rel-pos biases are unbounded under training).  nh static
    slice-maxes make an (n, nh) vector; one 0/1 matmul broadcasts it back
    per segment (cheaper than nh broadcast+concat at (n, n) each)."""
    cdt = w.dtype
    scale = (c // nh) ** -0.5
    q = w[:, :c] * jnp.asarray(scale, cdt)
    k = w[:, c : 2 * c]
    v = w[:, 2 * c :]

    # K'[cc, h·n+m] = kT[cc, m]·[head(cc)=h]; L = q @ K' → (n, nh·n)
    kp = jnp.tile(k.T, (1, nh)) * kmask
    logits = jnp.dot(q, kp, preferred_element_type=jnp.float32)
    logits = logits + rel
    if mask_j is not None:
        logits = logits + mask_j.astype(jnp.float32)

    maxvec = jnp.concatenate(
        [
            jnp.max(logits[:, h * n : (h + 1) * n], axis=-1, keepdims=True)
            for h in range(nh)
        ],
        axis=-1,
    )  # (n, nh)
    rowmax = jnp.dot(maxvec, seg_bcast, preferred_element_type=jnp.float32)
    ex = jnp.exp(logits - rowmax)  # (n, nh·n)
    denom = jnp.dot(ex, seg_sum, preferred_element_type=jnp.float32)
    inv = jnp.dot(1.0 / denom, seg_bcast, preferred_element_type=jnp.float32)
    probs = (ex * inv).astype(cdt)

    # V'[h·n+m, cc] = v[m, cc]·[head(cc)=h]; O = probs @ V' → (n, c)
    vp = jnp.tile(v, (nh, 1)) * vmask
    return jnp.dot(probs, vp, preferred_element_type=jnp.float32)


def _wba_kernel(
    qkv_ref,
    rel_ref,
    kmask_ref,
    vmask_ref,
    seg_sum_ref,
    seg_bcast_ref,
    mask_ref,
    out_ref,
    *,
    ws: int,
    nh: int,
    tw: int,
    c: int,
    has_mask: bool,
):
    """One (window-row, W-tile, batch-element) strip of fused W-MSA."""
    n = ws * ws
    strip = qkv_ref[0]  # (ws, tw·ws, 3c)
    rel = rel_ref[:]  # (n, nh·n) fp32

    kmask = kmask_ref[:]
    vmask = vmask_ref[:]
    seg_sum = seg_sum_ref[:]
    seg_bcast = seg_bcast_ref[:]

    for j in range(tw):
        w = strip[:, j * ws : (j + 1) * ws, :].reshape(n, 3 * c)
        o = _attend_window(
            w, rel, kmask, vmask, seg_sum, seg_bcast,
            mask_ref[0, j] if has_mask else None,
            n=n, nh=nh, c=c,
        )
        out_ref[0, :, j * ws : (j + 1) * ws, :] = o.reshape(ws, ws, c).astype(
            out_ref.dtype
        )


def _wba_proj_kernel(
    x_ref,
    rel_ref,
    wqkv_ref,
    bqkv_ref,
    wproj_ref,
    bproj_ref,
    kmask_ref,
    vmask_ref,
    seg_sum_ref,
    seg_bcast_ref,
    mask_ref,
    out_ref,
    o_scratch,
    *,
    ws: int,
    nh: int,
    tw: int,
    c: int,
    has_mask: bool,
):
    """Fully-fused strip: x → qkv matmul → W-MSA → output projection.

    Folding the two Dense layers into the kernel removes the qkv tensor's
    HBM round trip (3C wide — the largest intermediate of the XLA path)
    and the pre-proj attention output's.  The strip-level matmuls are
    MXU-shaped: (ws·tw·ws, c) @ (c, 3c) and (ws·tw·ws, c) @ (c, c)."""
    n = ws * ws
    xs = x_ref[0]  # (ws, tw·ws, c)
    cdt = xs.dtype
    rel = rel_ref[:]

    flat = xs.reshape(ws * tw * ws, c)
    qkv = jnp.dot(flat, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)  # zeros when bias-less
    strip = qkv.astype(cdt).reshape(ws, tw * ws, 3 * c)

    kmask = kmask_ref[:]
    vmask = vmask_ref[:]
    seg_sum = seg_sum_ref[:]
    seg_bcast = seg_bcast_ref[:]

    for j in range(tw):
        w = strip[:, j * ws : (j + 1) * ws, :].reshape(n, 3 * c)
        o = _attend_window(
            w, rel, kmask, vmask, seg_sum, seg_bcast,
            mask_ref[0, j] if has_mask else None,
            n=n, nh=nh, c=c,
        )
        o_scratch[:, j * ws : (j + 1) * ws, :] = o.reshape(ws, ws, c).astype(
            o_scratch.dtype
        )

    o_flat = o_scratch[:].reshape(ws * tw * ws, c)
    out = jnp.dot(o_flat, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[:].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype).reshape(ws, tw * ws, c)


def _pick_w_tile(nww: int, ws: int, c: int, fused_proj: bool = False) -> int:
    """Largest divisor of nww whose strip block stays comfortably in VMEM.

    The fused-projection variant additionally materializes the strip's
    fp32 qkv product and an output scratch in VMEM, so its per-strip
    budget is tighter (double-buffered blocks + temporaries must stay
    under the ~16 MB/core VMEM)."""
    budget = 3 * 1024 * 1024  # bytes for the (ws, tw·ws, 3c) bf16 block
    per_tw = ws * ws * 3 * c * 2
    if fused_proj:
        budget = 4 * 1024 * 1024
        per_tw = ws * ws * 3 * c * (2 + 4)  # bf16 strip + fp32 qkv product
    for tw in range(nww, 0, -1):
        if nww % tw:
            continue
        if tw * per_tw <= budget or tw == 1:
            return tw
    return 1


def window_attention_fused(
    qkv: jax.Array,
    rel_flat: jax.Array,
    mask_flat: jax.Array | None,
    *,
    ws: int,
    nh: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused W-MSA core: qkv (B, Hp, Wp, 3C) → pre-proj output (B, Hp, Wp, C).

    ``rel_flat``: (n, nh·n) fp32 — rel-pos bias, col = h·n + m.
    ``mask_flat``: (nWh, nWw, n, nh·n) or None — additive mask per window,
    already broadcast across heads (same value for every h segment).
    """
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    n = ws * ws
    assert hp % ws == 0 and wp % ws == 0, (hp, wp, ws)
    nwh, nww = hp // ws, wp // ws
    tw = _pick_w_tile(nww, ws, c)
    nwt = nww // tw

    kernel = functools.partial(
        _wba_kernel, ws=ws, nh=nh, tw=tw, c=c, has_mask=mask_flat is not None
    )
    kmask_np, vmask_np = _head_masks(c, nh, n, np.float32)
    seg_sum_np, seg_bcast_np = _segment_mats(nh, n)
    cdt = qkv.dtype
    full = lambda shape: pl.BlockSpec(
        shape, lambda ih, jt, ib: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(
            (1, ws, tw * ws, 3 * c),
            lambda ih, jt, ib: (ib, ih, jt, 0),
            memory_space=pltpu.VMEM,
        ),
        full((n, nh * n)),
        full((c, nh * n)),
        full((nh * n, c)),
        full((nh * n, nh)),
        full((nh, nh * n)),
    ]
    args = [
        qkv,
        rel_flat,
        jnp.asarray(kmask_np, dtype=cdt),
        jnp.asarray(vmask_np, dtype=cdt),
        jnp.asarray(seg_sum_np),
        jnp.asarray(seg_bcast_np),
    ]
    if mask_flat is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, tw, n, nh * n),
                lambda ih, jt, ib: (ih, jt, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask_flat)
    else:
        # dummy scalar so the kernel arity is static
        in_specs.append(
            pl.BlockSpec((1, 1), lambda ih, jt, ib: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(jnp.zeros((1, 1), jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv.dtype),
        grid=(nwh, nwt, b),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, ws, tw * ws, c),
            lambda ih, jt, ib: (ib, ih, jt, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*args)


def window_attention_fused_proj(
    x: jax.Array,
    rel_flat: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wproj: jax.Array,
    bproj: jax.Array,
    mask_flat: jax.Array | None,
    *,
    ws: int,
    nh: int,
    interpret: bool = False,
) -> jax.Array:
    """Fully-fused W-MSA: x (B, Hp, Wp, C) → post-proj output (B, Hp, Wp, C).

    ``wqkv`` (C, 3C) / ``wproj`` (C, C) with biases (3C,) / (C,) — pass
    zeros for a bias-less qkv.  Folds both Dense layers into the kernel's
    strip tiles (the qkv tensor never touches HBM)."""
    b, hp, wp, c = x.shape
    n = ws * ws
    assert hp % ws == 0 and wp % ws == 0, (hp, wp, ws)
    nwh, nww = hp // ws, wp // ws
    tw = _pick_w_tile(nww, ws, c, fused_proj=True)
    nwt = nww // tw

    kernel = functools.partial(
        _wba_proj_kernel, ws=ws, nh=nh, tw=tw, c=c,
        has_mask=mask_flat is not None,
    )
    kmask_np, vmask_np = _head_masks(c, nh, n, np.float32)
    seg_sum_np, seg_bcast_np = _segment_mats(nh, n)
    cdt = x.dtype
    full = lambda shape: pl.BlockSpec(
        shape, lambda ih, jt, ib: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(
            (1, ws, tw * ws, c),
            lambda ih, jt, ib: (ib, ih, jt, 0),
            memory_space=pltpu.VMEM,
        ),
        full((n, nh * n)),
        full((c, 3 * c)),
        full((1, 3 * c)),
        full((c, c)),
        full((1, c)),
        full((c, nh * n)),
        full((nh * n, c)),
        full((nh * n, nh)),
        full((nh, nh * n)),
    ]
    args = [
        x,
        rel_flat,
        wqkv.astype(cdt),
        bqkv.reshape(1, 3 * c),
        wproj.astype(cdt),
        bproj.reshape(1, c),
        jnp.asarray(kmask_np, dtype=cdt),
        jnp.asarray(vmask_np, dtype=cdt),
        jnp.asarray(seg_sum_np),
        jnp.asarray(seg_bcast_np),
    ]
    if mask_flat is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, tw, n, nh * n),
                lambda ih, jt, ib: (ih, jt, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask_flat)
    else:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda ih, jt, ib: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(jnp.zeros((1, 1), jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), cdt),
        grid=(nwh, nwt, b),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, ws, tw * ws, c),
            lambda ih, jt, ib: (ib, ih, jt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((ws, tw * ws, c), cdt)],
        interpret=interpret,
    )(*args)


def _wba_reference(qkv, rel_flat, mask_flat, *, ws, nh):
    """Plain-jnp restatement of the fused kernel (bwd path + tests)."""
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    n = ws * ws
    hd = c // nh
    nwh, nww = hp // ws, wp // ws
    # (b, nwh, ws, nww, ws, 3c) → (b·nW, n, 3c)
    w = qkv.reshape(b, nwh, ws, nww, ws, c3).transpose(0, 1, 3, 2, 4, 5)
    w = w.reshape(b * nwh * nww, n, c3)
    q, k, v = w[..., :c], w[..., c : 2 * c], w[..., 2 * c :]
    q = q * (hd ** -0.5)
    qh = q.reshape(-1, n, nh, hd)
    kh = k.reshape(-1, n, nh, hd)
    vh = v.reshape(-1, n, nh, hd)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32
    )
    rel = rel_flat.reshape(n, nh, n).transpose(1, 0, 2)  # (nh, n, n)
    logits = logits + rel[None]
    if mask_flat is not None:
        nW = nwh * nww
        m = mask_flat.reshape(nW, n, nh, n)[:, :, 0, :]  # heads identical
        m = jnp.tile(m, (b, 1, 1))
        logits = logits + m[:, None].astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", probs, vh).reshape(-1, n, c)
    o = o.reshape(b, nwh, nww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return o.reshape(b, hp, wp, c).astype(qkv.dtype)


def _wba_proj_reference(
    x, rel_flat, wqkv, bqkv, wproj, bproj, mask_flat, *, ws, nh
):
    """Plain-jnp restatement of the fully-fused kernel (bwd path + tests)."""
    cdt = x.dtype
    qkv = jnp.einsum(
        "bhwc,cd->bhwd", x, wqkv.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv.astype(jnp.float32)).astype(cdt)
    o = _wba_reference(qkv, rel_flat, mask_flat, ws=ws, nh=nh)
    out = jnp.einsum(
        "bhwc,cd->bhwd", o, wproj.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return (out + bproj.astype(jnp.float32)).astype(cdt)


@functools.lru_cache(maxsize=64)
def _make_wba_proj_op(ws: int, nh: int, mask_key, interpret: bool):
    """custom_vjp'd fully-fused op (see _make_wba_op for the mask-key
    contract; masks stay numpy in the closure for per-trace conversion)."""
    mask_c = _MASK_STORE.get(mask_key) if mask_key is not None else None

    @jax.custom_vjp
    def op(x, rel_flat, wqkv, bqkv, wproj, bproj):
        return window_attention_fused_proj(
            x, rel_flat, wqkv, bqkv, wproj, bproj, mask_c,
            ws=ws, nh=nh, interpret=interpret,
        )

    def fwd(x, rel_flat, wqkv, bqkv, wproj, bproj):
        return op(x, rel_flat, wqkv, bqkv, wproj, bproj), (
            x, rel_flat, wqkv, bqkv, wproj, bproj,
        )

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: _wba_proj_reference(*a, mask_c, ws=ws, nh=nh), *res
        )
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=64)
def _make_wba_op(ws: int, nh: int, mask_key, interpret: bool):
    """custom_vjp'd fused op; the static mask (or None) is closed over.

    ``mask_key`` is either None or a hashable token resolving to the numpy
    mask via _MASK_STORE (masks are static per shape-config).
    """
    # keep the mask as NUMPY in the closure: a jnp array materialized here
    # would be a tracer of whichever trace first built this op, and the lru
    # cache would leak it into later traces (numpy converts per-trace).
    mask_c = _MASK_STORE.get(mask_key) if mask_key is not None else None

    @jax.custom_vjp
    def op(qkv, rel_flat):
        return window_attention_fused(
            qkv, rel_flat, mask_c, ws=ws, nh=nh, interpret=interpret
        )

    def fwd(qkv, rel_flat):
        return op(qkv, rel_flat), (qkv, rel_flat)

    def bwd(res, g):
        qkv, rel_flat = res
        _, vjp = jax.vjp(
            lambda a, r: _wba_reference(a, r, mask_c, ws=ws, nh=nh),
            qkv,
            rel_flat,
        )
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


_MASK_STORE: dict = {}
# Each head-broadcast mask is large (~25 MB at 128x192/ws8/nh8, more at
# eval resolutions); cap the store FIFO so a long-lived process sweeping
# many image sizes doesn't grow host RSS without bound.  Eviction is safe:
# already-built ops closed over their numpy mask at creation, and a
# post-lru rebuild re-registers the key before _make_wba_op runs.
_MASK_STORE_MAX = 64


def flatten_mask(mask_np: np.ndarray, nwh: int, nww: int, nh: int) -> np.ndarray:
    """(nW, n, n) additive mask → (nWh, nWw, n, nh·n) bf16, head-broadcast."""
    nW, n, _ = mask_np.shape
    flat = np.broadcast_to(mask_np[:, :, None, :], (nW, n, nh, n))
    flat = flat.reshape(nwh, nww, n, nh * n)
    return np.ascontiguousarray(flat, dtype=np.float32).astype(jnp.bfloat16)


def wba_fused_apply(
    qkv: jax.Array,
    rel_flat: jax.Array,
    mask_np: np.ndarray | None,
    mask_key,
    *,
    ws: int,
    nh: int,
    interpret: bool = False,
) -> jax.Array:
    """Entry point used by WindowAttention: registers the static mask under
    ``mask_key`` (a hashable shape-config token) and applies the fused op."""
    key = _register_mask(mask_np, mask_key)
    return _make_wba_op(ws, nh, key, interpret)(qkv, rel_flat)


def _register_mask(mask_np, mask_key):
    if mask_np is None:
        return None
    _MASK_STORE.pop(mask_key, None)  # refresh FIFO position
    _MASK_STORE[mask_key] = mask_np
    while len(_MASK_STORE) > _MASK_STORE_MAX:
        _MASK_STORE.pop(next(iter(_MASK_STORE)))
    return mask_key


def wba_fused_proj_apply(
    x: jax.Array,
    rel_flat: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wproj: jax.Array,
    bproj: jax.Array,
    mask_np: np.ndarray | None,
    mask_key,
    *,
    ws: int,
    nh: int,
    interpret: bool = False,
) -> jax.Array:
    """Fully-fused entry point: x + both projection weight sets → output."""
    key = _register_mask(mask_np, mask_key)
    return _make_wba_proj_op(ws, nh, key, interpret)(
        x, rel_flat, wqkv, bqkv, wproj, bproj
    )
