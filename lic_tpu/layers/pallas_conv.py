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
* the kernel walks output row-blocks; per block it DMAs the 4 phase tiles
  into VMEM and accumulates the 25 taps as MXU matmuls in fp32 — each tap
  is a *contiguous* slice of a phase tile (tap (a, b) ↦ phase
  ((a+1)%2, (b+1)%2) at offset ((a+1)//2, (b+1)//2), the s2d alignment);
* no HBM round-trips between taps; out rides the BlockSpec pipeline.

Semantics match ``Conv2d(k=5, s=2, padding=(1,2,1,2))`` — the reference's
``ZeroPad2d((1,2,1,2)) + Conv2d(5,2,0)`` (``model/net.py:97-98``).

STATUS: correct (tested), but this first cut measures ~12 ms vs XLA's
7.2 ms on the layer-2 shape — the single-buffered DMA serializes against
compute and the per-tap value slices relayout.  Kept OFF the default path
(XLA strided conv remains it) as the base for a double-buffered /
relayout-free iteration; see docs/PERF.md for the measured table.
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
    ph_hbm, w_ref, out_ref, xt, sems, *, th, wo, cin_p, cout
):
    bi = pl.program_id(0)
    i = pl.program_id(1)

    # fetch the 4 phase tiles for this output row block (parallel DMAs)
    cps = []
    for r in range(2):
        for c in range(2):
            cp = pltpu.make_async_copy(
                ph_hbm.at[bi, r, c, pl.ds(i * th, th + 2)],
                xt.at[r * 2 + c],
                sems.at[r * 2 + c],
            )
            cp.start()
            cps.append(cp)
    for cp in cps:
        cp.wait()

    acc = jnp.zeros((th * wo, cout), jnp.float32)
    for a in range(5):
        rh, jh = (a + 1) % 2, (a + 1) // 2
        for b in range(5):
            rw, jw = (b + 1) % 2, (b + 1) // 2
            sl = xt[rh * 2 + rw, jh : jh + th, jw : jw + wo, :]
            acc = acc + jnp.dot(
                sl.reshape(th * wo, cin_p),
                w_ref[a * 5 + b],
                preferred_element_type=jnp.float32,
            )
    out_ref[...] = acc.reshape(1, th, wo, cout).astype(out_ref.dtype)


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

    out = pl.pallas_call(
        functools.partial(
            _conv5s2_kernel, th=th, wo=wo, cin_p=cin_p, cout=cout
        ),
        grid=(b, ho // th),
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
            pltpu.VMEM((4, th + 2, wp2, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(phases, wk)
    return out
