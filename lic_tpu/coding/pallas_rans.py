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
# 128-aligned superset window loads) it COMPILES AND RUNS on real v5e —
# but the 2026-08-19 probe run miscompared values at the L=32 shape
# (interpret mode is bit-exact; the L=128 native-lane-width case was
# never reached — probe now runs it first with diff diagnostics).
# Prime relayout suspects for the hardware-only wrongness: the 1-D
# (WL,)→(WL,1) reshape feeding the window-select matmul, jnp.stack of
# 1-D lane vectors, and (B·L,1)→(B,L) reshapes after the lookup dots.
# Flip _AUTO_ON_TPU only once scripts/probe_rans_drain.py prints
# PALLAS_DRAIN: OK on hardware.
_AUTO_ON_TPU = False
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
    rows_ref,       # (mc, B, L) int32 CDF row per symbol, chunk-major —
                    # dynamic chunk index rides the LEADING dim (Mosaic
                    # rejects dynamic minor-dim starts not provably
                    # 128-aligned)
    payload_ref,    # (B, W) int32 zero-extended uint16 words
    state_in_ref,   # (B, L) int32 lane states (uint32 bit pattern)
    ptr_in_ref,     # SMEM (B,) int32 shared word pointer per stream
    cdf_ref,        # (nrows, row_len) fp32 CDF table
    off_ref,        # (nrows, 1) fp32 symbol offsets
    lt_ref,         # (L, L) fp32 strict lower-triangular ones (rank matmul)
    dec_ref,        # out (mc, B, L) int32 decoded values, chunk-major
    state_out_ref,  # out (B, L) int32
    ptr_out_ref,    # out SMEM (B,) int32
    state_s,        # scratch VMEM (B, L) int32
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
    state_s[:] = state_in_ref[:]
    # zero dec: chunks past s_tot are pl.when-skipped, and the scan path
    # this replaces returned zeros for them
    dec_ref[:] = jnp.zeros((mc, B, L), jnp.int32)
    for b in range(B):
        ptr_s[b] = ptr_in_ref[b]

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    # Mosaic's tpu.iota is integer-only, and it FOLDS convert(int-iota)
    # back into a float tpu.iota during lowering (verifier error seen on
    # real TPU).  Keep every iota int32 and do the one-hot comparisons in
    # integers; only the comparison RESULT is cast to f32 for the MXU.
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (L, WL), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (B * L, nrows), 1)
    len_iota = jax.lax.broadcasted_iota(jnp.int32, (B * L, row_len), 1)
    s_tot = s_tot_ref[0]

    def window_renorm(state, need):
        """state (B,L) int32, need (B,L) bool → new state; advances ptr_s."""
        need_f = need.astype(jnp.float32)
        # exclusive prefix count of needing lanes = strict-LT matmul
        rank = jnp.dot(
            need_f, lt_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # (B, L) — counts ≤ L are fp32-exact
        ws = []
        for b in range(B):
            # Mosaic requires dynamic minor-dim load starts provably
            # 128-aligned: load the aligned superset window [ptr_al,
            # ptr_al+WL) and fold the misalignment offset into the
            # one-hot select.  The wrapper pads payload so ptr_al+WL ≤ W
            # and W % 128 == 0, making the multiple_of hint truthful.
            ptr_b = ptr_s[b]
            ptr_al = pl.multiple_of(
                jnp.minimum((ptr_b // 128) * 128, W - WL), 128
            )
            win_b = payload_ref[b, pl.ds(ptr_al, WL)].astype(
                jnp.float32
            )  # words < 2^16: fp32-exact
            tgt = rank[b][:, None] + (ptr_b - ptr_al)  # (L, 1)
            sel_b = (
                (tgt == w_iota).astype(jnp.float32)
                * need_f[b][:, None]
            )  # (L, WL)
            ws.append(
                jnp.dot(sel_b, win_b[:, None],
                        preferred_element_type=jnp.float32)[:, 0]
            )
            ptr_s[b] = ptr_s[b] + jnp.sum(need_f[b]).astype(jnp.int32)
        w = jnp.stack(ws).astype(jnp.int32)  # (B, L)
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
            state = state_s[:]
            rows = rows_ref[i]  # (B, L)
            valid = (i * L + lane_iota) < s_tot
            cum = state & 0xFFFF

            # CDF row lookup as one-hot matmuls (fp32-exact: values < 2^16)
            oh_rows = (
                rows.reshape(B * L, 1) == row_iota
            ).astype(jnp.float32)
            row_f = jnp.dot(
                oh_rows, cdf_ref[:], preferred_element_type=jnp.float32
            )  # (B·L, row_len)
            off = jnp.dot(
                oh_rows, off_ref[:], preferred_element_type=jnp.float32
            ).reshape(B, L).astype(jnp.int32)

            cum_f = cum.reshape(B * L, 1).astype(jnp.float32)
            le = (row_f <= cum_f).astype(jnp.float32)
            # counts ≤ row_len (131) are fp32-exact → int slot is exact
            slot_i = (
                jnp.sum(le, axis=-1, keepdims=True) - 1.0  # cdf[0]=0
            ).astype(jnp.int32)
            slot_i = jnp.minimum(slot_i, nsyms)
            # start = cdf[slot], nxt = cdf[slot+1] — one-hot selects
            oh_slot = (len_iota == slot_i).astype(jnp.float32)
            start = jnp.sum(row_f * oh_slot, axis=-1).reshape(B, L)
            oh_nxt = (len_iota == slot_i + 1).astype(jnp.float32)
            nxt = jnp.sum(row_f * oh_nxt, axis=-1).reshape(B, L)
            slot = slot_i.reshape(B, L)
            freq = (nxt - start).astype(jnp.int32)
            start_i = start.astype(jnp.int32)

            # x' = freq·(x >> 16) + (cum − start): modular int32 ≡ uint32
            ns = freq * _SRL(state, 16) + (cum - start_i)
            state = jnp.where(valid, ns, state)
            state = renorm_phase(state, valid)
            state_s[:] = state

            vals = jnp.where(valid, slot + off, 0)
            dec_ref[i] = vals

            esc = valid & (slot == nsyms)

            @pl.when(jnp.any(esc))
            def _esc():
                st = state_s[:]
                cnt, st = get_bits4(st, esc)
                cnt = cnt + 1
                u = jnp.zeros((B, L), jnp.int32)
                for k in range(8):
                    active = esc & (k < cnt)
                    d, st = get_bits4(st, active)
                    u = jnp.where(active, (u << 4) | d, u)
                state_s[:] = st
                # unzigzag with logical shift (matches the C++ mirror for
                # |delta| >= 2^30)
                delta = _SRL(u, 1) ^ (-(u & 1))
                esc_val = jnp.where(delta < 0, 0, nsyms - 1) + delta + off
                dec_ref[i] = jnp.where(esc, esc_val, dec_ref[i])

        return 0

    jax.lax.fori_loop(0, mc, chunk_body, 0)
    state_out_ref[:] = state_s[:]
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

    def run(s_tot, rows_pad, payload, state, ptr, cdf_f, off_f, lt):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((mc, B, L), jnp.int32),
                jax.ShapeDtypeStruct((B, L), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ),
            in_specs=[
                smem(),  # s_tot
                vmem(),  # rows
                vmem(),  # payload
                vmem(),  # state in
                smem(),  # ptr in
                vmem(),  # cdf
                vmem(),  # offsets
                vmem(),  # lower-triangular
            ],
            out_specs=(vmem(), vmem(), smem()),
            scratch_shapes=[
                pltpu.VMEM((B, L), jnp.int32),
                pltpu.SMEM((B,), jnp.int32),
            ],
            interpret=interpret,
        )(s_tot, rows_pad, payload, state, ptr, cdf_f, off_f, lt)

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
    W0 = payload.shape[1]
    W = -(-(W0 + WL) // 128) * 128
    payload = jnp.pad(payload.astype(jnp.int32), ((0, 0), (0, W - W0)))
    cdf_f = dev.cdf_rows.astype(jnp.float32)
    off_f = dev.offsets.astype(jnp.float32).reshape(-1, 1)
    # rank_j = Σ_k need_k·M[k,j] must count lanes BEFORE j ⇒ M[k,j]=1 iff k<j
    lt = jnp.asarray(np.triu(np.ones((L, L), np.float32), k=1))
    rows_pad = jnp.pad(rows_flat, ((0, 0), (0, mc * L - S)))

    seg_mc = max(1, _SEG_BUDGET_BYTES // (B * L * 4 * 2))
    payload = payload.astype(jnp.int32)
    state = lanes.state.astype(jnp.int32)
    ptr = lanes.ptr.astype(jnp.int32)
    s_tot = jnp.asarray(s_tot, jnp.int32)
    decs = []
    for seg_start in range(0, mc, seg_mc):
        seg = min(seg_mc, mc - seg_start)
        run = _build_drain(
            B, L, seg, W, dev.rows, dev.row_len, dev.nsyms, WL,
            bool(interpret),
        )
        # local symbol budget for this segment (traced; clamps at 0 make
        # fully-past-the-end segments skip every chunk body)
        s_loc = jnp.clip(s_tot - seg_start * L, 0, seg * L)
        rows_seg = (
            jax.lax.slice_in_dim(rows_pad, seg_start * L,
                                 (seg_start + seg) * L, axis=1)
            .reshape(B, seg, L)
            .transpose(1, 0, 2)  # chunk-major for the kernel
        )
        dec, state, ptr = run(
            s_loc.reshape(1), rows_seg,
            payload, state, ptr, cdf_f, off_f, lt,
        )
        decs.append(dec.transpose(1, 0, 2).reshape(B, seg * L))
    dec = decs[0] if len(decs) == 1 else jnp.concatenate(decs, axis=1)
    return (
        DeviceIState(state.astype(jnp.uint32), ptr),
        dec[:, :S],
    )
