"""Polyphase transposed convolution — zero-skipping deconv for TPU.

``lax.conv_general_dilated`` with ``lhs_dilation`` computes the transposed
conv by inserting zeros between input samples and convolving: for stride 2
three quarters of the MACs multiply zeros.  The polyphase decomposition
splits the output into s×s phases; each phase is a *dense* stride-1 conv
with a small sub-kernel (for k=5, s=2: 2×2 / 2×3 / 3×2 / 3×3 taps — exactly
25/4 taps per output on average, no waste), and the phases interleave back
with a depth-to-space shuffle.  Identical math to the dilated form (tested
to fp32 exactness), ~4× fewer MACs on the deconv stages.

Derivation (per dimension, output index o = s·m + r, kernel tap a,
pre-flip kernel Wf, dilated-position d = o − pad_lo + a):
  d ≡ 0 (mod s)  ⇔  a ≡ (pad_lo − r) (mod s)
  input index    i = m + (r − pad_lo + a) / s
so phase r uses taps a_j = ((pad_lo − r) mod s) + j·s with input offsets
o_j = (r − pad_lo + a_j) / s — a short dense correlation.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _phase_taps(pad_lo: int, r: int, k: int, s: int):
    """Kernel tap indices (into the flipped kernel) and their input offsets
    for output phase ``r``."""
    a0 = (pad_lo - r) % s
    taps = list(range(a0, k, s))
    offs = [(r - pad_lo + a) // s for a in taps]
    return taps, offs


def conv_transpose2d_subpel(
    x: jax.Array,
    kernel: jax.Array,  # (k, k, in, out), correlation orientation
    stride: int,
    padding: int,
    output_padding: int,
) -> jax.Array:
    """Transposed conv as ONE dense conv producing s²·C_out channels + a
    pixel shuffle (subpel lowering).

    Same math as the polyphase decomposition but all phases ride a single
    conv with the sub-kernels scattered into a ceil(k/s)-wide window
    (s²·k²−k² zero taps ⇒ (s²·⌈k/s⌉²)/k² FLOP overhead, 1.44× for k=5/s=2)
    — a worthwhile trade on the MXU where one fat conv with s²·C_out output
    lanes beats s² skinny convs (measured: the C_out=16 synthesis head runs
    2.5× faster this way; see docs/PERF.md).
    """
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[3]
    s = stride
    pad_lo = k - 1 - padding
    out_h = (h - 1) * s - 2 * padding + k + output_padding
    out_w = (w - 1) * s - 2 * padding + k + output_padding
    kw = -(-k // s)  # ceil(k/s): unified window width

    phase_info = [_phase_taps(pad_lo, r, k, s) for r in range(s)]
    all_offs = [o for _, offs in phase_info for o in offs]
    o_min, o_max = min(all_offs), max(all_offs)
    assert o_max - o_min + 1 <= kw

    def n_phase(out_size, r):
        return (out_size - r + s - 1) // s

    nh = [n_phase(out_h, r) for r in range(s)]
    nw = [n_phase(out_w, r) for r in range(s)]
    assert len(set(nh)) == 1 and len(set(nw)) == 1, (
        "subpel path requires output size divisible by stride"
    )
    mh, mw = nh[0], nw[0]

    pad_before = -o_min
    pad_after_h = (mh - 1) + o_max - (h - 1)
    pad_after_w = (mw - 1) + o_max - (w - 1)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pad_before, max(pad_after_h, 0)),
            (pad_before, max(pad_after_w, 0)),
            (0, 0),
        ),
    )

    # assemble sub-kernels closed-form: phase (rh, rw) occupies out-channel
    # block (rh·s + rw)·cout and its taps are the strided slice
    # kernel[a0_h::s, a0_w::s] placed at window offset (off0 − o_min) —
    # s² (slice + pad) + one concat.  (The first cut built k3 with k²·s²/…
    # dynamic-update-slices; the kernel is a traced PARAM, so that scatter
    # chain re-ran inside every forward.)
    planes = []
    for rh in range(s):
        taps_h, offs_h = phase_info[rh]
        for rw in range(s):
            taps_w, offs_w = phase_info[rw]
            if not taps_h or not taps_w:
                planes.append(jnp.zeros((kw, kw, cin, cout), kernel.dtype))
                continue
            sub = kernel[taps_h[0] :: s, taps_w[0] :: s]
            th, tw = sub.shape[0], sub.shape[1]
            oh0 = offs_h[0] - o_min
            ow0 = offs_w[0] - o_min
            planes.append(
                jnp.pad(
                    sub,
                    (
                        (oh0, kw - th - oh0),
                        (ow0, kw - tw - ow0),
                        (0, 0),
                        (0, 0),
                    ),
                )
            )
    k3 = jnp.concatenate(planes, axis=-1)

    y = lax.conv_general_dilated(
        xp, k3.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (b, mh', mw', s²·cout)
    y = y[:, :mh, :mw, :]
    y = y.reshape(b, mh, mw, s, s, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, mh * s, mw * s, cout)
    return y[:, :out_h, :out_w, :]


def conv_transpose2d_polyphase(
    x: jax.Array,
    kernel: jax.Array,  # (k, k, in, out), correlation orientation (as in
    #                     layers.conv.ConvTranspose2d — flip handled here)
    stride: int,
    padding: int,
    output_padding: int,
) -> jax.Array:
    """Exact replacement for the dilated-conv transposed conv.

    out_size = (in − 1)·stride − 2·padding + k + output_padding.
    """
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[3]
    s = stride
    pad_lo = k - 1 - padding
    out_h = (h - 1) * s - 2 * padding + k + output_padding
    out_w = (w - 1) * s - 2 * padding + k + output_padding

    # the module's kernel parameter is already stored in correlation
    # orientation (see layers.conv.ConvTranspose2d) — use directly
    wf = kernel

    # per-phase input-offset ranges; pad x once to cover all phases
    all_offs = []
    phase_info = []
    for r in range(s):
        taps, offs = _phase_taps(pad_lo, r, k, s)
        phase_info.append((taps, offs))
        all_offs += offs
    o_min, o_max = min(all_offs), max(all_offs)

    # number of output rows per phase r: ceil((out - r)/s)
    def n_phase(out_size, r):
        return (out_size - r + s - 1) // s

    nh = [n_phase(out_h, r) for r in range(s)]
    nw = [n_phase(out_w, r) for r in range(s)]
    # phases must be equal-sized to interleave with a reshape; this holds
    # whenever out is a multiple of s (true for the codec's 2× stages).
    assert len(set(nh)) == 1 and len(set(nw)) == 1, (
        "polyphase path requires output size divisible by stride"
    )
    mh, mw = nh[0], nw[0]

    # pad so every phase's taps index validly:  i = m + off, m ∈ [0, mh)
    pad_before = -o_min
    pad_after_h = (mh - 1) + o_max - (h - 1)
    pad_after_w = (mw - 1) + o_max - (w - 1)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pad_before, max(pad_after_h, 0)),
            (pad_before, max(pad_after_w, 0)),
            (0, 0),
        ),
    )

    dn = ("NHWC", "HWIO", "NHWC")
    phases = []
    for rh in range(s):
        taps_h, offs_h = phase_info[rh]
        row = []
        for rw in range(s):
            taps_w, offs_w = phase_info[rw]
            # build the dense sub-kernel: taps ordered by input offset
            sub = wf[jnp.asarray(taps_h)][:, jnp.asarray(taps_w)]
            # slice the input window for this phase
            h0 = offs_h[0] + pad_before
            w0 = offs_w[0] + pad_before
            xin = lax.dynamic_slice(
                xp,
                (0, h0, w0, 0),
                (b, mh + len(offs_h) - 1, mw + len(offs_w) - 1, cin),
            )
            y = lax.conv_general_dilated(
                xin, sub, (1, 1), "VALID", dimension_numbers=dn
            )
            row.append(y)  # (b, mh, mw, cout)
        phases.append(jnp.stack(row, axis=3))  # (b, mh, mw, s, cout)
    ph = jnp.stack(phases, axis=2)  # (b, mh, s, mw, s, cout)
    out = ph.reshape(b, mh * s, mw * s, cout)
    return out[:, :out_h, :out_w, :]
