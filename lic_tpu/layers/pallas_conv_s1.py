"""Pallas TPU kernel: stride-1 k×k conv with cross-tap K-remainder packing.

The reference's WAM conv branches (``layers/layers.py:87-111`` — 3×3
ResidualBlocks and the 7×7 conv at C=192) dominate the flagship's
post-attention forward.  On the 128-wide MXU a C=192 contraction pads
192→256, inflating every tap matmul by 4/3 on the K side.  The K side is
recoverable exactly (docs/PERF.md round-4 recipe): all k² tap matmuls feed
ONE accumulator, so the K=64 channel remainders of two column-adjacent
taps stack into a single full K=128 pass:

    acc += [x(h+a, w+b)[128:] ‖ x(h+a, w+b+1)[128:]] @ [[W[a,b][128:]],
                                                        [W[a,b+1][128:]]]

Total K-passes drop from 2·k² (padded) to k² + k·⌈k/2⌉:
  k=3: 18 → 15;  k=7: 98 → 77  (the N=192→256 output pad is not
recoverable — every tap writes the same 192 output channels).

Layout: ONE packed input tensor P of 256 lanes built by a single fused
XLA pass —

    P[..., 0:128]   = x[..., 0:128]            (lo)
    P[..., 128:192] = x[..., 128:192]          (hi)
    P[..., 192:256] = x[..., 128:192] @ w+1    (hi, shifted one column)

so the pair operand for taps (a,b),(a,b+1) is the tile's lane slice
128:256 at column offset b — tile-aligned, no in-kernel lane shuffles.
The kernel walks output row-blocks with the same double-buffered manual
DMA pipeline as ``pallas_conv.py`` (block g computes while g+1 streams
HBM→VMEM), and the k column-offset views cost one hoisted sublane shift
each.

Optionally fuses bias, LeakyReLU and the residual skip-add (the
``ResidualBlock`` epilogue) into the same pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h_out: int, k: int, wv: int, wo: int, cout: int, itemsize: int) -> int:
    """Largest row block whose working set fits VMEM (~16 MB/core): 2
    double-buffer slots of (th+2p, wv, 256) input tile + the fp32
    accumulator + the output block, with headroom for weights/temps."""
    p = k // 2
    budget = 11 * 1024 * 1024
    for th in (16, 8, 4, 2, 1):
        if h_out % th:
            continue
        need = (
            2 * (th + 2 * p) * wv * 256 * itemsize
            + th * wo * cout * 4
            + th * wo * cout * itemsize
        )
        if need <= budget:
            return th
    return 1


def _convk_s1_kernel(
    p_hbm, wlo_ref, whi_ref, b_ref, out_ref, xt, sems,
    *, k, th, wo, cout, nb, total, n_hi, act, residual, c_hi,
):
    p = k // 2
    bi = pl.program_id(0)
    i = pl.program_id(1)
    g = bi * nb + i

    def dma(slot, img, blk):
        return pltpu.make_async_copy(
            p_hbm.at[img, pl.ds(blk * th, th + 2 * p)],
            xt.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(0, 0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        ng = g + 1
        dma(jax.lax.rem(ng, 2), ng // nb, jax.lax.rem(ng, nb)).start()

    dma(slot, bi, i).wait()
    tile = xt[slot]

    # NOTE: accumulate in (th, wo, cout) with dot_general over the raw
    # 3-D views — an explicit `.reshape(th*wo, 128)` of the sliced view
    # (wo < wv ⇒ non-contiguous) forced a per-tap materializing copy
    # (~th·wo·128·2B per tap), which held the first cut of this kernel to
    # ~70 TF/s of pass work vs XLA's ~134 (probe_conv_r5).
    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((th, wo, cout), jnp.float32)
    for jw in range(k):
        # one misaligned sublane slice per column offset (hoisted; Mosaic
        # lowers it to a single vector-shift relayout)
        v = tile[:, jw : jw + wo, :]
        for a in range(k):
            sl = v[a : a + th]
            acc = acc + jax.lax.dot_general(
                sl[..., :128], wlo_ref[a * k + jw], dn,
                preferred_element_type=jnp.float32,
            )
        if jw % 2 == 0:
            # pair (jw, jw+1) — or the lone tap jw == k-1, whose second
            # weight half is zero (k odd ⇒ singles land on even jw)
            for a in range(k):
                sl = v[a : a + th]
                acc = acc + jax.lax.dot_general(
                    sl[..., 128:], whi_ref[a * n_hi + jw // 2], dn,
                    preferred_element_type=jnp.float32,
                )
    acc = acc + b_ref[0].astype(jnp.float32)
    if act == "leaky_relu":
        acc = jnp.where(acc >= 0, acc, 0.01 * acc)
    if residual:
        # skip-add the block's center input: lanes 0:128 are the lo
        # channels, lanes 128:128+c_hi the hi channels (the un-shifted slot)
        c = tile[p : p + th, p : p + wo, :]
        skip = jnp.concatenate(
            [c[..., :128], c[..., 128 : 128 + c_hi]], axis=-1
        )
        acc = acc + skip.astype(jnp.float32)
    out_ref[...] = acc[None].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "residual", "out_dtype", "interpret")
)
def convk_s1_pallas(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[str] = None,
    residual: bool = False,
    out_dtype: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """SAME-padded stride-1 k×k conv, K-remainder-packed Pallas path.

    x: (B, H, W, C) with 128 < C ≤ 192;  kernel: (k, k, C, C_out), k odd.
    ``act='leaky_relu'`` fuses the epilogue; ``residual=True`` additionally
    adds x (requires C == C_out) AFTER the activation — the tail of
    ``ResidualBlock`` (CompressAI semantics, ``layers/blocks.py``).
    """
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[-1]
    assert k % 2 == 1, "odd kernel"
    assert 128 < cin <= 192, "packing path covers 128 < C <= 192"
    assert not residual or cin == cout
    p = k // 2
    c_hi = cin - 128
    ho, wo = h, w

    # packed 256-lane input: [lo(128) | hi(64 slot) | hi shifted +1 col]
    wtot = w + 2 * p + 1                  # singles read through col w+k-1
    wv = -(-wtot // 8) * 8
    th = _pick_th(ho, k, wv, wo, cout, jnp.dtype(x.dtype).itemsize)
    lo = jnp.pad(
        x[..., :128], ((0, 0), (p, p), (p, wv - w - p), (0, 0))
    )
    hi = jnp.pad(
        x[..., 128:], ((0, 0), (p, p), (p, wv - w - p), (0, 64 - c_hi))
    )
    hi_s = jnp.pad(hi[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    packed = jnp.concatenate([lo, hi, hi_s], axis=-1)  # (b, h+2p, wv, 256)

    kd = kernel.astype(x.dtype)
    wlo = kd[:, :, :128, :].reshape(k * k, 128, cout)
    n_hi = (k + 1) // 2
    whi = jnp.zeros((k * n_hi, 128, cout), x.dtype)
    for a in range(k):
        for jw in range(0, k, 2):
            idx = a * n_hi + jw // 2
            whi = whi.at[idx, :c_hi].set(kd[a, jw, 128:, :])
            if jw + 1 < k:
                whi = whi.at[idx, 64 : 64 + c_hi].set(kd[a, jw + 1, 128:, :])

    bvec = (
        jnp.zeros((1, cout), x.dtype)
        if bias is None
        else bias.reshape(1, cout).astype(x.dtype)
    )
    nb = ho // th
    out = pl.pallas_call(
        functools.partial(
            _convk_s1_kernel,
            k=k, th=th, wo=wo, cout=cout, nb=nb, total=b * nb,
            n_hi=n_hi, act=act, residual=residual, c_hi=c_hi,
        ),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed stays in HBM
            pl.BlockSpec(
                (k * k, 128, cout), lambda bi, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k * n_hi, 128, cout), lambda bi, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cout), lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, cout), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), out_dtype or x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * p, wv, 256), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(packed, wlo, whi, bvec)
    return out
