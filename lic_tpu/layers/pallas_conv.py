"""Pallas TPU kernel for the 5×5/stride-2 analysis convolution.

XLA's strided conv lowering sustains ~50 TF/s on v5e for the codec's
dominant g_a stages while the same contraction expressed as 25 matmuls
reaches ~108 TF/s (the MXU ceiling for C=192 operands — K/N pad 192→256).
The gap is the strided input walk; every XLA-level rewrite (space-to-depth,
polyphase pre-split feeding convs, im2col) re-materializes operands through
HBM and loses more than it gains (see docs/PERF.md probe tables).

Design here:

* the input is polyphase-split ONCE in XLA (pad to the (2,2)-aligned grid,
  reshape+transpose → (B, 2, 2, H/2+2, W/2+2, C) — one cheap layout pass);
* the kernel walks output row-blocks with a DOUBLE-BUFFERED manual DMA
  pipeline: while block g computes, block g+1's four phase tiles stream
  HBM→VMEM (slot = g mod 2), so the tap matmuls never wait on memory;
* per phase tile the W-offset variants (jw ∈ {0,1,2}) are hoisted into at
  most one sublane ``pltpu.roll`` each (10 shifts/block total) — the 25
  taps then read *aligned* slices, so no per-tap relayout;
* the 25 taps accumulate as MXU matmuls in fp32 — tap (a, b) reads phase
  ((a+1)%2, (b+1)%2) at offset ((a+1)//2, (b+1)//2), the s2d alignment;
* out rides the BlockSpec pipeline.

Semantics match ``Conv2d(k=5, s=2, padding=(1,2,1,2))`` — the reference's
``ZeroPad2d((1,2,1,2)) + Conv2d(5,2,0)`` (``model/net.py:97-98``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h_out: int) -> int:
    for th in (8, 4, 2, 1):
        if h_out % th == 0:
            return th
    return 1


def _conv5s2_kernel(
    ph_hbm, w_ref, out_ref, xt, sems, *, th, wo, cin_p, cout, nb, total
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    g = bi * nb + i

    def dmas(slot, img, blk):
        return [
            pltpu.make_async_copy(
                ph_hbm.at[img, r, c, pl.ds(blk * th, th + 2)],
                xt.at[slot, r * 2 + c],
                sems.at[slot, r * 2 + c],
            )
            for r in range(2)
            for c in range(2)
        ]

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for cp in dmas(0, 0, 0):
            cp.start()

    # prefetch the next block's tiles into the other slot
    @pl.when(g + 1 < total)
    def _():
        ng = g + 1
        for cp in dmas(jax.lax.rem(ng, 2), ng // nb, jax.lax.rem(ng, nb)):
            cp.start()

    for cp in dmas(slot, bi, i):
        cp.wait()

    acc = jnp.zeros((th * wo, cout), jnp.float32)
    for rh in range(2):
        a_list = [a for a in range(5) if (a + 1) % 2 == rh]
        for rw in range(2):
            b_list = [b for b in range(5) if (b + 1) % 2 == rw]
            tile = xt[slot, rh * 2 + rw]
            for b_tap in b_list:
                jw = (b_tap + 1) // 2
                # ONE misaligned sublane slice per (phase, jw) — Mosaic
                # lowers it to a single vector-shift relayout; the per-a
                # slices below are on the untiled H dim and cost nothing.
                # (pltpu.roll would be the natural op but bf16 rotate is
                # unimplemented in Mosaic.)
                v = tile[:, jw : jw + wo, :]
                for a_tap in a_list:
                    jh = (a_tap + 1) // 2
                    sl = v[jh : jh + th]
                    acc = acc + jnp.dot(
                        sl.reshape(th * wo, cin_p),
                        w_ref[a_tap * 5 + b_tap],
                        preferred_element_type=jnp.float32,
                    )
    out_ref[...] = acc.reshape(1, th, wo, cout).astype(out_ref.dtype)


def _conv5s2_v2_kernel(
    view_hbm, w_ref, out_ref, xt, sems, *, th, wo, cin, cout, nb, total
):
    """Fused-prep variant: the four polyphase tiles are gathered straight
    out of the RAW (padded) activation by strided DMAs — no XLA-side
    reshape/transpose pass.  ``view_hbm`` is the padded input viewed as
    ``(B, H/2+2, 2, W/2+2, 2*C)`` (a free reshape: pure metadata on a
    contiguous NHWC array).  Phase (r, t) of block ``g`` is the DMA

        view[img, u0:u0+th+2, r, :, t*C:(t+1)*C]

    — runs of C contiguous channels with stride 2·C along W and
    2·W'·C along H; the stride-2 polyphase gather happens in the DMA
    engine, overlapped with the previous block's matmuls."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    g = bi * nb + i

    def dmas(slot, img, blk):
        return [
            pltpu.make_async_copy(
                view_hbm.at[
                    img, pl.ds(blk * th, th + 2), r, slice(None),
                    pl.ds(t * cin, cin),
                ],
                xt.at[slot, r * 2 + t],
                sems.at[slot, r * 2 + t],
            )
            for r in range(2)
            for t in range(2)
        ]

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for cp in dmas(0, 0, 0):
            cp.start()

    @pl.when(g + 1 < total)
    def _():
        ng = g + 1
        for cp in dmas(jax.lax.rem(ng, 2), ng // nb, jax.lax.rem(ng, nb)):
            cp.start()

    for cp in dmas(slot, bi, i):
        cp.wait()

    acc = jnp.zeros((th * wo, cout), jnp.float32)
    for rh in range(2):
        a_list = [a for a in range(5) if (a + 1) % 2 == rh]
        for rw in range(2):
            b_list = [b for b in range(5) if (b + 1) % 2 == rw]
            tile = xt[slot, rh * 2 + rw]
            for b_tap in b_list:
                jw = (b_tap + 1) // 2
                v = tile[:, jw : jw + wo, :]
                for a_tap in a_list:
                    jh = (a_tap + 1) // 2
                    sl = v[jh : jh + th]
                    acc = acc + jnp.dot(
                        sl.reshape(th * wo, cin),
                        w_ref[a_tap * 5 + b_tap],
                        preferred_element_type=jnp.float32,
                    )
    out_ref[...] = acc.reshape(1, th, wo, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def conv5s2_pallas_v2(
    x: jax.Array,
    kernel: jax.Array,
    out_dtype: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """ZeroPad2d((1,2,1,2)) + Conv2d(k=5, s=2), fused-prep Pallas path.

    Unlike :func:`conv5s2_pallas`, the only XLA-side work is the zero-pad
    (one copy that XLA can fuse into the producer); the polyphase split
    rides the kernel's own DMAs.  Mosaic requires in-kernel DMA slices of
    an HBM ref to be tile-aligned on the last two dims (second-minor /8,
    minor /128 with /128 offsets), so the pad widens W to make the phase
    width a multiple of 8 and C to a multiple of 128 — the W-phase slice
    offsets then land on whole lane-tiles.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, "even input dims"
    ho, wo = h // 2, w // 2
    th = _pick_th(ho)
    hp2 = ho + 2
    wp2 = -(-(wo + 2) // 8) * 8          # /8-aligned phase width
    cin_p = -(-cin // 128) * 128          # /128-aligned channel dim

    xp = jnp.pad(
        x,
        (
            (0, 0), (2, 2),
            (2, 2 * wp2 - w - 2),         # widen right pad to the aligned grid
            (0, cin_p - cin),
        ),
    )
    view = xp.reshape(b, hp2, 2, wp2, 2 * cin_p)
    wk = jnp.zeros((25, cin_p, cout), x.dtype)
    wk = wk.at[:, :cin, :].set(kernel.reshape(25, cin, cout).astype(x.dtype))

    nb = ho // th
    out = pl.pallas_call(
        functools.partial(
            _conv5s2_v2_kernel,
            th=th, wo=wo, cin=cin_p, cout=cout, nb=nb, total=b * nb,
        ),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # raw view stays in HBM
            pl.BlockSpec(
                (25, cin_p, cout), lambda bi, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, cout), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, ho, wo, cout), out_dtype or x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, th + 2, wp2, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(view, wk)
    return out


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def conv5s2_pallas(
    x: jax.Array,
    kernel: jax.Array,
    out_dtype: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """ZeroPad2d((1,2,1,2)) + Conv2d(k=5, s=2) — Pallas MXU path.

    x: (B, H, W, C) with H, W even;  kernel: (5, 5, C, C_out).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, "even input dims"
    ho, wo = h // 2, w // 2
    th = _pick_th(ho)
    hp2, wp2 = ho + 2, wo + 2

    # (1,2,1,2) reference padding on the (2,2)-aligned grid (s2d alignment)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    phases = xp.reshape(b, hp2, 2, wp2, 2, cin).transpose(0, 2, 4, 1, 3, 5)
    # phases: (B, 2, 2, H/2+2, W/2+2, C).  Mosaic memref slices must be
    # tile-aligned on the last two dims: pad W/2+2 up to /8 (sublanes) and
    # C up to /128 (lanes).  The lane pad is FREE compute — the MXU pads
    # K=192→256 internally anyway; explicit zeros (with matching zero rows
    # in the weights) keep every DMA aligned at no extra matmul time.
    wp2 = -(-wp2 // 8) * 8
    cin_p = -(-cin // 128) * 128
    phases = jnp.pad(
        phases,
        (
            (0, 0), (0, 0), (0, 0), (0, 0),
            (0, wp2 - (wo + 2)), (0, cin_p - cin),
        ),
    )
    wk = jnp.zeros((25, cin_p, cout), x.dtype)
    wk = wk.at[:, :cin, :].set(kernel.reshape(25, cin, cout).astype(x.dtype))

    nb = ho // th
    out = pl.pallas_call(
        functools.partial(
            _conv5s2_kernel,
            th=th, wo=wo, cin_p=cin_p, cout=cout, nb=nb, total=b * nb,
        ),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # phases stay in HBM
            pl.BlockSpec(
                (25, cin_p, cout), lambda bi, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, cout), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, ho, wo, cout), out_dtype or x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, th + 2, wp2, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(phases, wk)
    return out
