"""Pallas TPU kernel for the interleaved rANS drain — the serial inner
loop of every AR codec decode (ChARM slices, entroformer checkerboard,
neural-syntax wavefronts).

The XLA lowering (``DeviceRans16Interleaved.decode_chunk`` driven by a
``lax.scan``) pays per chunk: an HBM gather of the CDF rows, several
fusion boundaries, and scan-step overhead — measured O(100 µs)/chunk
while the actual math is a handful of (B·L)-wide vector ops.  A decode
drains hundreds to thousands of chunks, so the chunk cost IS the decode
latency.  This kernel runs the whole drain inside ONE pallas_call:

* lane states and the shared pointers live in VMEM/SMEM scratch across
  all chunks (no per-chunk HBM round trip);
* the CDF row lookup is a one-hot **matmul** against the (nrows ≤ 1024,
  131) table held in VMEM — TPUs have no fast gather, but the MXU eats
  (B·L, nrows) @ (nrows, 131) for breakfast;
* the interleaved window renorm (contiguous word window at the shared
  pointer, exclusive-prefix ranks, one-hot select) keeps its shape: the
  rank prefix-sum is a matmul with a strict lower-triangular 0/1 matrix
  and the select one small matmul per stream;
* the rare escape path (bypass nibbles for far-tail symbols) runs under
  ``pl.when``, so escape-free chunks pay one predicate test.

Bit-exactness: this is a restatement of ``_decode_chunk_live`` with the
same integer arithmetic (int32 two's-complement with logical shifts for
the unsigned ops), verified against it lane-for-lane in tests, including
escape-heavy streams.  Encoder (host C++) and both device decoders agree
on the wire format.

Integer/fp32 trick inventory: CDF values < 2^16 and payload words
< 2^16 are exact in fp32, so every table lookup/select rides the MXU;
state math stays int32 (modular multiply matches uint32), and unsigned
comparisons are expressed as logical right shifts.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SRL = jax.lax.shift_right_logical

# Global switch, same contract as layers.win_attention._PALLAS_ATTN:
# None = AUTO, True/False override.  Consumers read it at TRACE time —
# set it before building a ChannelCoder.  AUTO currently resolves OFF
# even on TPU: the kernel is interpret-verified lane-for-lane on CPU,
# and after the round-4 fixes (integer-only iotas; chunk-major rows/dec;
# 128-aligned superset window loads) it COMPILES AND RUNS on real v5e.
# Hardware-wrongness hunt (probe_mosaic_prims + probe_rans_drain,
# 2026-08-19): interpret mode was always bit-exact; on silicon three
# kernel variants failed identically.  The primitive-isolation probe
# pinned it: the v5e MXU runs f32 matmuls in bf16 passes at default
# precision, so one-hot selects of 16-bit CDF/payload values came back
# bf16-ROUNDED (P6 start read 61440 for a table value of 61400) while
# every other primitive (dynamic leading-dim reads, dim-0 iotas,
# one-hot+reduce, scratch RMW loops, SMEM pointer loops) was exact.
# With byte-split selects (P6s) the kernel is bit-exact on hardware:
# probe_rans_drain 18:06 prints vals/sym/state OK at both shapes, the
# raw drain is 7.7× the scan at the bench shape (86.2 → 11.2 ms), and
# the whole-codec roundtrip through the kernel is BITEXACT.
_AUTO_ON_TPU = True
_PALLAS_RANS = {"enabled": None, "interpret": False}


def set_pallas_rans(enabled, interpret: bool = False) -> None:
    _PALLAS_RANS["enabled"] = enabled
    _PALLAS_RANS["interpret"] = interpret


def pallas_rans_active() -> bool:
    enabled = _PALLAS_RANS["enabled"]
    if enabled is None:
        if not _AUTO_ON_TPU:
            return False
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False
    return bool(enabled)


# rows+dec VMEM budget per pallas_call; drains larger than this split into
# sequential segment calls threading (state, ptr) — the payload (whole
# stream) and CDF table stay resident every call.
_SEG_BUDGET_BYTES = 2 * 1024 * 1024


def _drain_kernel(
    s_tot_ref,      # SMEM (1,) int32 — traced symbol count (NS wavefronts)
    rows_ref,       # (mc, 1, B·L) int32 CDF row per symbol, chunk-major —
                    # dynamic chunk index rides the LEADING dim (Mosaic
                    # rejects dynamic minor-dim starts not provably
                    # 128-aligned)
    payload_ref,    # (B, W) int32 zero-extended uint16 words
    state_in_ref,   # (1, B·L) int32 lane states (uint32 bit pattern)
    ptr_in_ref,     # SMEM (B,) int32 shared word pointer per stream
    cdf_hi_ref,     # (row_len, nrows) fp32 = cdf >> 8, TRANSPOSED
    cdf_lo_ref,     # (row_len, nrows) fp32 = cdf & 255, TRANSPOSED
    off_ref,        # (nrows, 1) fp32 symbol offsets (column)
    lt_ref,         # (L, L) fp32 strict lower-triangular ones (rank matmul)
    dec_ref,        # out (mc, 1, B·L) int32 decoded values, chunk-major
    state_out_ref,  # out (1, B·L) int32
    ptr_out_ref,    # out SMEM (B,) int32
    state_s,        # scratch VMEM (1, B·L) int32
    ptr_s,          # scratch SMEM (B,) int32
    *,
    B: int,
    L: int,
    mc: int,
    W: int,
    nrows: int,
    row_len: int,
    nsyms: int,
    WL: int,
):
    # LAYOUT CONTRACT (the hardware-lowering lessons of round 4): every
    # in-kernel tensor keeps ALL lanes on the minor (lane) dim as
    # (X, B·L) — streams b-major within the lane dim — and one-hots are
    # built by broadcasting a (1, B·L) row against a dim-0 iota.  There
    # are NO reshapes, NO transposes, NO 1-D vectors and NO stacks of
    # them anywhere inside the kernel: Mosaic lowers relayout-free
    # elementwise/broadcast/reduce ops and plain 2-D matmuls only.
    # ADDITIONALLY (probe_mosaic_prims P6, 2026-08-19 17:40): the v5e
    # MXU multiplies f32 matmuls in bf16 passes at default precision —
    # one-hot 0/1 operands survive, but ≥9-bit values (CDF entries,
    # payload words < 2^16) get mantissa-truncated (start read 61440
    # where the table held 61400).  Every one-hot select of a 16-bit
    # value therefore runs as TWO matmuls over bf16-exact byte halves,
    # recombined as 256·hi + lo — exact by construction.  (The rank
    # matmul's operands are 0/1 with sums ≤ L, already bf16-exact.)
    BL = B * L
    state_s[...] = state_in_ref[...]
    # zero dec: chunks past s_tot are pl.when-skipped, and the scan path
    # this replaces returned zeros for them
    dec_ref[...] = jnp.zeros((mc, 1, BL), jnp.int32)
    for b in range(B):
        ptr_s[b] = ptr_in_ref[b]

    # Mosaic's tpu.iota is integer-only, and it FOLDS convert(int-iota)
    # back into a float tpu.iota during lowering (verifier error seen on
    # real TPU).  Keep every iota int32 and do the one-hot comparisons in
    # integers; only the comparison RESULT is cast to f32 for the MXU.
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (1, BL), 1)
    lane_in_stream = lane_g - (lane_g // L) * L   # position within stream
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (WL, L), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, BL), 0)
    len_iota = jax.lax.broadcasted_iota(jnp.int32, (row_len, BL), 0)
    s_tot = s_tot_ref[0]

    def window_renorm(state, need):
        """state/need (1, B·L) → new state; advances ptr_s."""
        need_f = need.astype(jnp.float32)
        ws = []
        for b in range(B):
            # exclusive prefix count of needing lanes = strict-LT matmul
            nb = need_f[:, b * L:(b + 1) * L]            # (1, L) static
            rank_b = jnp.dot(
                jnp.broadcast_to(nb, (8, L)), lt_ref[...],
                preferred_element_type=jnp.float32,
            )[0:1].astype(jnp.int32)                     # (1, L), exact
            # Mosaic requires dynamic minor-dim load starts provably
            # 128-aligned: load the aligned superset window [ptr_al,
            # ptr_al+WL) and fold the misalignment offset into the
            # one-hot select.  The wrapper pads payload so ptr_al+WL ≤ W
            # and W % 128 == 0, making the multiple_of hint truthful.
            ptr_b = ptr_s[b]
            ptr_al = pl.multiple_of(
                jnp.minimum((ptr_b // 128) * 128, W - WL), 128
            )
            win_i = payload_ref[pl.ds(b, 1), pl.ds(ptr_al, WL)]  # (1, WL)
            win_hi = _SRL(win_i, 8).astype(jnp.float32)  # < 256: bf16-exact
            win_lo = (win_i & 255).astype(jnp.float32)
            tgt = rank_b + (ptr_b - ptr_al)              # (1, L)
            # non-needing lanes alias a needing lane's rank and pick up a
            # garbage word here — discarded by the where() below
            oh = (w_iota == tgt).astype(jnp.float32)     # (WL, L)
            sel = lambda v: jnp.dot(
                jnp.broadcast_to(v, (8, WL)), oh,
                preferred_element_type=jnp.float32,
            )[0:1]                                       # (1, L)
            ws.append(256.0 * sel(win_hi) + sel(win_lo))
            ptr_s[b] = ptr_b + jnp.sum(nb).astype(jnp.int32)
        w = jnp.concatenate(ws, axis=1).astype(jnp.int32)  # (1, B·L)
        return jnp.where(need, (state << 16) | w, state)

    def renorm_phase(state, active):
        # unsigned state < 2^16  ⟺  logical (state >> 16) == 0
        need = active & (_SRL(state, 16) == 0)
        return window_renorm(state, need)

    def get_bits4(state, active):
        val = jnp.where(active, state & 15, 0)
        ns = jnp.where(active, _SRL(state, 4), state)
        return val, renorm_phase(ns, active)

    def chunk_body(i, _):
        @pl.when(i * L < s_tot)
        def _():
            state = state_s[...]
            rows = rows_ref[i]  # (1, B·L)
            valid = (i * L + lane_in_stream) < s_tot
            cum = state & 0xFFFF

            # CDF row lookup as one-hot matmuls (fp32-exact: values < 2^16);
            # one-hot = dim-0 iota vs the (1, B·L) row, no reshapes
            oh_rows = (row_iota == rows).astype(jnp.float32)  # (nrows, B·L)
            row_f = 256.0 * jnp.dot(
                cdf_hi_ref[...], oh_rows,
                preferred_element_type=jnp.float32,
            ) + jnp.dot(
                cdf_lo_ref[...], oh_rows,
                preferred_element_type=jnp.float32,
            )  # (row_len, B·L), exact: byte-split beats MXU bf16 passes
            # offsets via elementwise broadcast + sublane reduce (the
            # exact path slot takes) — NOT an M=1 matmul, see above
            off = jnp.sum(
                off_ref[...] * oh_rows, axis=0, keepdims=True
            ).astype(jnp.int32)  # (1, B·L)

            le = (row_f <= cum.astype(jnp.float32)).astype(jnp.float32)
            # counts ≤ row_len (131) are fp32-exact → int slot is exact
            slot = (
                jnp.sum(le, axis=0, keepdims=True) - 1.0  # cdf[0]=0
            ).astype(jnp.int32)  # (1, B·L)
            slot = jnp.minimum(slot, nsyms)
            # start = cdf[slot], nxt = cdf[slot+1] — one-hot selects
            oh_slot = (len_iota == slot).astype(jnp.float32)
            start = jnp.sum(row_f * oh_slot, axis=0, keepdims=True)
            oh_nxt = (len_iota == slot + 1).astype(jnp.float32)
            nxt = jnp.sum(row_f * oh_nxt, axis=0, keepdims=True)
            freq = (nxt - start).astype(jnp.int32)
            start_i = start.astype(jnp.int32)

            # x' = freq·(x >> 16) + (cum − start): modular int32 ≡ uint32
            ns = freq * _SRL(state, 16) + (cum - start_i)
            state = jnp.where(valid, ns, state)
            state = renorm_phase(state, valid)
            state_s[...] = state

            vals = jnp.where(valid, slot + off, 0)
            dec_ref[i] = vals

            esc = valid & (slot == nsyms)

            @pl.when(jnp.any(esc))
            def _esc():
                st = state_s[...]
                cnt, st = get_bits4(st, esc)
                cnt = cnt + 1
                u = jnp.zeros((1, B * L), jnp.int32)
                for k in range(8):
                    active = esc & (k < cnt)
                    d, st = get_bits4(st, active)
                    u = jnp.where(active, (u << 4) | d, u)
                state_s[...] = st
                # unzigzag with logical shift (matches the C++ mirror for
                # |delta| >= 2^30)
                delta = _SRL(u, 1) ^ (-(u & 1))
                esc_val = jnp.where(delta < 0, 0, nsyms - 1) + delta + off
                dec_ref[i] = jnp.where(esc, esc_val, dec_ref[i])

        return 0

    jax.lax.fori_loop(0, mc, chunk_body, 0)
    state_out_ref[...] = state_s[...]
    for b in range(B):
        ptr_out_ref[b] = ptr_s[b]


@functools.lru_cache(maxsize=32)
def _build_drain(B, L, mc, W, nrows, row_len, nsyms, WL, interpret):
    kernel = functools.partial(
        _drain_kernel, B=B, L=L, mc=mc, W=W,
        nrows=nrows, row_len=row_len, nsyms=nsyms, WL=WL,
    )

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    def run(s_tot, rows_pad, payload, state, ptr, cdf_hi, cdf_lo, off_f,
            lt):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((mc, 1, B * L), jnp.int32),
                jax.ShapeDtypeStruct((1, B * L), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ),
            in_specs=[
                smem(),  # s_tot
                vmem(),  # rows
                vmem(),  # payload
                vmem(),  # state in
                smem(),  # ptr in
                vmem(),  # cdf hi bytes
                vmem(),  # cdf lo bytes
                vmem(),  # offsets
                vmem(),  # lower-triangular
            ],
            out_specs=(vmem(), vmem(), smem()),
            scratch_shapes=[
                pltpu.VMEM((1, B * L), jnp.int32),
                pltpu.SMEM((B,), jnp.int32),
            ],
            interpret=interpret,
        )(s_tot, rows_pad, payload, state, ptr, cdf_hi, cdf_lo, off_f, lt)

    return run


def pallas_drain(dev, lanes, payload, rows_flat, s_tot, interpret=None):
    """Drop-in pallas replacement for the chunked decode scan.

    ``dev``: a ``DeviceRans16Interleaved`` (CDF tables + lane count).
    ``lanes``: ``DeviceIState``; ``payload`` (B, W) int32 (self-padded
    here to the kernel's aligned-window contract); ``rows_flat`` (B, S)
    int32; ``s_tot`` traced or static symbol count (≤ S; trailing lanes
    masked).

    Returns ``(new_lanes, dec (B, S) int32)`` matching
    ``decode_chunk``-over-``lax.scan`` lane-for-lane.

    Drains whose rows+dec footprint exceeds ``_SEG_BUDGET_BYTES`` split
    into sequential pallas calls threading (state, ptr); segments wholly
    past ``s_tot`` cost only the state copy (chunk bodies pl.when-skip).
    """
    from .device_rans import DeviceIState

    if interpret is None:
        interpret = _PALLAS_RANS["interpret"]
    B, S = rows_flat.shape
    L = dev.n_lanes
    mc = -(-S // L)
    rows_flat = jnp.clip(rows_flat, 0, dev.rows - 1)
    # Aligned-window contract (see _drain_kernel.window_renorm): the
    # kernel loads WL words from a 128-aligned start ≤ ptr; pad payload
    # so every such window is in bounds and W is a multiple of 128.
    WL = 128 + -(-L // 128) * 128
    # COMPILE-SHAPE BUCKETING: every distinct (mc, W) used to compile a
    # fresh Mosaic executable (minutes each on the 1-vCPU host).  Round
    # the payload width up to 4 Ki-word buckets (zeros past the stream
    # are never *selected* — decode consumes exactly the encoded words)
    # and pad the chunk count to a whole number of segments below, so
    # one compiled shape serves a whole family of image sizes.
    W0 = payload.shape[1]
    W = -(-(W0 + WL) // 4096) * 4096
    payload = jnp.pad(payload.astype(jnp.int32), ((0, 0), (0, W - W0)))
    # SUBLANE-PAD CONTRACT (probe_mosaic_prims, 2026-08-19 17:40): on
    # real v5e, reductions/compares whose dim-0 is not a multiple of 8
    # sublanes read the tile's PAD sublanes — zeros in interpret mode,
    # garbage on silicon (P6: the off reduce over nrows=64 was exact
    # while slot/start/nxt over row_len=131 were wrong).  Pad both table
    # dims to multiples of 8 with a too-big sentinel so `cdf ≤ cum`
    # (cum < 2^16) is false on pads and every reduction sees only
    # well-defined values.
    # BYTE-SPLIT CONTRACT (see kernel header): CDF values < 2^17 ship as
    # bf16-exact hi/lo byte planes; the sentinel 1<<17 (hi=512, lo=0)
    # reconstructs to 131072 > any cum, keeping padded rows unselectable.
    row_len_p = -(-dev.row_len // 8) * 8
    nrows_p = -(-dev.rows // 8) * 8
    cdf_np = np.full((row_len_p, nrows_p), 1 << 17, np.int64)
    cdf_np[:dev.row_len, :dev.rows] = np.asarray(dev.cdf_rows, np.int64).T
    cdf_hi = jnp.asarray((cdf_np >> 8).astype(np.float32))
    cdf_lo = jnp.asarray((cdf_np & 255).astype(np.float32))
    off_np = np.zeros((nrows_p, 1), np.float32)
    off_np[:dev.rows, 0] = np.asarray(dev.offsets, np.float32)
    off_f = jnp.asarray(off_np)
    # rank_j = Σ_k need_k·M[k,j] must count lanes BEFORE j ⇒ M[k,j]=1 iff k<j
    lt = jnp.asarray(np.triu(np.ones((L, L), np.float32), k=1))

    seg_mc = max(1, _SEG_BUDGET_BYTES // (B * L * 4 * 2))
    # bucket mc: below one segment, the next power of two (≤2× skipped
    # chunks, log-many shapes); above, whole segments so every segment
    # call shares ONE compiled shape.  Padded chunks pl.when-skip via
    # the s_loc clamp.
    if mc < seg_mc:
        mc = 1 << (mc - 1).bit_length()
    else:
        mc = -(-mc // seg_mc) * seg_mc
    rows_pad = jnp.pad(rows_flat, ((0, 0), (0, mc * L - S)))
    payload = payload.astype(jnp.int32)
    state = lanes.state.astype(jnp.int32).reshape(1, B * L)
    ptr = lanes.ptr.astype(jnp.int32)
    s_tot = jnp.asarray(s_tot, jnp.int32)
    decs = []
    for seg_start in range(0, mc, seg_mc):
        seg = min(seg_mc, mc - seg_start)
        run = _build_drain(
            B, L, seg, W, nrows_p, row_len_p, dev.nsyms, WL,
            bool(interpret),
        )
        # local symbol budget for this segment (traced; clamps at 0 make
        # fully-past-the-end segments skip every chunk body)
        s_loc = jnp.clip(s_tot - seg_start * L, 0, seg * L)
        rows_seg = (
            jax.lax.slice_in_dim(rows_pad, seg_start * L,
                                 (seg_start + seg) * L, axis=1)
            .reshape(B, seg, L)
            .transpose(1, 0, 2)          # chunk-major
            .reshape(seg, 1, B * L)      # flattened-lane kernel layout
        )
        dec, state, ptr = run(
            s_loc.reshape(1), rows_seg,
            payload, state, ptr, cdf_hi, cdf_lo, off_f, lt,
        )
        decs.append(
            dec.reshape(seg, B, L).transpose(1, 0, 2).reshape(B, seg * L)
        )
    dec = decs[0] if len(decs) == 1 else jnp.concatenate(decs, axis=1)
    return (
        DeviceIState(state.reshape(B, L).astype(jnp.uint32), ptr),
        dec[:, :S],
    )
