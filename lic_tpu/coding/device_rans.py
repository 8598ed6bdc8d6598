"""Lane-parallel rANS ("rans16") — host encoder wrapper + ON-DEVICE decoder.

The sequential codecs (neural-syntax wavefront AR, ChARM slice chain) are
bound by host↔device round trips: every autoregressive step must fetch the
entropy parameters, host-decode the rANS slice, and upload the values for
the next step (~25 ms RTT each over the tunneled TPU link).  This module
removes the host from the loop entirely:

* the **encoder** (host, C++ `rans16_encode_lanes`) splits the symbol
  sequence round-robin across L independent lane streams — lane =
  flat_index mod L *within each AR step*, steps in decode order — and
  encodes each lane with a 32-bit-state / 16-bit-renorm rANS coder sharing
  the SAME quantized CDF tables as the host coder (identical bpp modulo
  per-lane flush overhead: ~4 bytes · L per stream);
* the **decoder** is pure jax: L states and L read pointers live as
  vectors; one `decode_chunk` call decodes ≤ L symbols with a vectorized
  binary search over the CDF rows (8 gathers for 131-entry rows), one
  conditional 16-bit renorm gather, and a bounded predicated bypass loop
  for escape symbols.  It runs INSIDE `lax.scan`/`fori_loop`, so a whole
  autoregressive decode is ONE device dispatch.

The per-symbol CDF row index is computed on device (σ → scale-table index),
exactly as the encoder computed it — bit-identity by construction since
both run the same jitted executable.

No reference counterpart: /root/reference never decodes its AR models at
all (SURVEY §2.7); this is the TPU-native design that makes them decodable
at speed.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import numpy as np

from .rans import _lib


def lane_schedule(step_counts: np.ndarray, n_lanes: int):
    """Static decode schedule → per-lane contiguous permutation.

    ``step_counts``: number of symbols of each AR step, in decode order.
    Symbol ``m`` of step ``t`` is decoded by lane ``m % L`` in chunk
    ``m // L``.  Returns ``(perm, lane_starts)`` where ``perm`` maps
    lane-contiguous positions → flat decode positions (so
    ``sym_lane_order = sym_flat[perm]``), and ``lane_starts`` is the
    (L+1,) prefix of per-lane counts.
    """
    step_counts = np.asarray(step_counts, np.int64)
    t_of = np.repeat(np.arange(len(step_counts)), step_counts)
    m_of = np.concatenate([np.arange(c) for c in step_counts]) if len(
        step_counts
    ) else np.zeros((0,), np.int64)
    lane = m_of % n_lanes
    chunk = m_of // n_lanes
    perm = np.lexsort((chunk, t_of, lane))  # lane-major, then (t, chunk)
    counts = np.bincount(lane, minlength=n_lanes)
    lane_starts = np.zeros(n_lanes + 1, np.int64)
    lane_starts[1:] = np.cumsum(counts)
    return perm.astype(np.int64), lane_starts


class Rans16LaneCodec:
    """Host-side encode (and mirror decode) of the lane-parallel format.

    Container: [uint16 L][uint32 word_count × L][uint16 payload ...].
    Shares CDF rows/offsets with a ``RansCodec`` (same bpp tables).
    """

    def __init__(self, cdfs: np.ndarray, offsets: np.ndarray):
        self.cdfs = np.ascontiguousarray(cdfs, np.uint32)
        self.row_len = self.cdfs.shape[1]
        self.offsets = np.ascontiguousarray(offsets, np.int32)

    def encode(
        self,
        symbols: np.ndarray,
        indexes: np.ndarray,
        step_counts: np.ndarray,
        n_lanes: int,
    ) -> bytes:
        symbols = np.ascontiguousarray(symbols.reshape(-1), np.int32)
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        assert symbols.shape == indexes.shape
        assert int(np.sum(step_counts)) == symbols.size
        perm, lane_starts = lane_schedule(step_counts, n_lanes)
        sym_l = np.ascontiguousarray(symbols[perm])
        idx_l = np.ascontiguousarray(indexes[perm])
        cap = symbols.size * 8 + 16 * n_lanes + 64
        out = np.empty(cap, np.uint16)
        counts = np.empty(n_lanes, np.int32)
        n = _lib().rans16_encode_lanes(
            sym_l, idx_l, lane_starts, n_lanes, self.cdfs, self.row_len,
            self.offsets, out, cap, counts,
        )
        if n < 0:
            raise RuntimeError("rans16 encode overflow")
        head = np.asarray([n_lanes], np.uint16).tobytes()
        return head + counts.astype(np.uint32).tobytes() + out[:n].tobytes()

    @staticmethod
    def parse(blob: bytes) -> Tuple[int, np.ndarray, np.ndarray]:
        """→ (n_lanes, lane_word_starts (L+1,) int64, payload uint16)."""
        n_lanes = int(np.frombuffer(blob, np.uint16, 1)[0])
        counts = np.frombuffer(blob, np.uint32, n_lanes, 2)
        payload = np.frombuffer(blob, np.uint16, -1, 2 + 4 * n_lanes)
        starts = np.zeros(n_lanes + 1, np.int64)
        starts[1:] = np.cumsum(counts)
        if starts[-1] != payload.size:
            raise ValueError("rans16 container length mismatch")
        return n_lanes, starts, payload

    def decode_host(
        self, blob: bytes, indexes: np.ndarray, step_counts: np.ndarray
    ) -> np.ndarray:
        """C++ mirror of the device decoder (tests/fallback)."""
        n_lanes, wstarts, payload = self.parse(blob)
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        perm, lane_starts = lane_schedule(step_counts, n_lanes)
        idx_l = np.ascontiguousarray(indexes[perm])
        out_l = np.empty(indexes.size, np.int32)
        rc = _lib().rans16_decode_lanes(
            np.ascontiguousarray(payload), wstarts, idx_l, lane_starts,
            n_lanes, self.cdfs, self.row_len, self.offsets, out_l,
        )
        if rc != 0:
            raise ValueError("corrupt or truncated rans16 stream")
        out = np.empty(indexes.size, np.int32)
        out[perm] = out_l
        return out


class DeviceLaneState(NamedTuple):
    """Vectorized decoder state: one rANS state + read pointer per lane."""

    state: "jax.Array"  # (L,) uint32
    ptr: "jax.Array"  # (L,) int32 — word index into the payload buffer


class DeviceRans16:
    """Jittable lane decoder over fixed CDF tables.

    Construct once per coder (tables are jnp constants); the methods are
    pure functions safe to close over inside jitted programs.
    """

    def __init__(self, cdfs: np.ndarray, offsets: np.ndarray):
        import jax.numpy as jnp

        cdfs = np.asarray(cdfs, np.int64)
        self.rows, self.row_len = cdfs.shape
        self.nsyms = self.row_len - 2  # value slots; slot nsyms = escape
        self.cdf_rows = jnp.asarray(cdfs, jnp.int32)  # (rows, row_len)
        self.offsets = jnp.asarray(offsets, jnp.int32)

    # -- helpers -------------------------------------------------------
    def init_lanes(self, payload, lane_word_starts) -> DeviceLaneState:
        """payload: (W,) int32 zero-extended uint16 words (device);
        lane_word_starts: (L,) int32."""
        import jax.numpy as jnp

        ptr = lane_word_starts.astype(jnp.int32)
        hi = payload[ptr].astype(jnp.uint32)
        lo = payload[ptr + 1].astype(jnp.uint32)
        return DeviceLaneState((hi << 16) | lo, ptr + 2)

    def _renorm(self, state, ptr, payload, active):
        import jax.numpy as jnp

        need = active & (state < jnp.uint32(1 << 16))
        w = payload[jnp.clip(ptr, 0, payload.shape[0] - 1)].astype(jnp.uint32)
        state = jnp.where(need, (state << 16) | w, state)
        ptr = ptr + need.astype(jnp.int32)
        return state, ptr

    def _get_bits4(self, state, ptr, payload, active):
        import jax.numpy as jnp

        val = (state & jnp.uint32(15)).astype(jnp.int32)
        ns = state >> 4
        ns, nptr = self._renorm(ns, ptr, payload, active)
        state = jnp.where(active, ns, state)
        ptr = jnp.where(active, nptr, ptr)
        return jnp.where(active, val, 0), state, ptr

    def decode_chunk(self, lanes: DeviceLaneState, payload, rows, valid):
        """Decode one symbol on each lane where ``valid``.

        rows: (L,) int32 CDF row per lane; valid: (L,) bool.
        Returns (values int32 (L,), new DeviceLaneState).
        """
        import jax.numpy as jnp

        state, ptr = lanes
        rows = jnp.clip(rows, 0, self.rows - 1)
        cum = (state & jnp.uint32(0xFFFF)).astype(jnp.int32)

        # ONE row-gather (L, row_len) then pure VPU: per-element gathers
        # lower poorly on TPU (measured: they dominated the decode), while
        # a major-axis row gather is a DMA and the slot search over the
        # ≤131-wide row is elementwise compare + reduce.
        row = self.cdf_rows[rows]  # (L, row_len)
        le = (row <= cum[:, None]).astype(jnp.int32)
        # largest slot with cdf[slot] <= cum; cdf[0]=0 so sum >= 1
        slot = jnp.sum(le, axis=-1) - 1
        slot = jnp.minimum(slot, self.nsyms)
        onehot = (
            jnp.arange(self.row_len, dtype=jnp.int32)[None, :] == slot[:, None]
        ).astype(jnp.int32)
        start = jnp.sum(row * onehot, axis=-1)
        nxt = jnp.sum(
            row * jnp.concatenate(
                [jnp.zeros_like(onehot[:, :1]), onehot[:, :-1]], axis=-1
            ),
            axis=-1,
        )
        freq = nxt - start
        ns = freq.astype(jnp.uint32) * (state >> 16) + (
            cum - start
        ).astype(jnp.uint32)
        ns, nptr = self._renorm(ns, ptr, payload, valid)
        state = jnp.where(valid, ns, state)
        ptr = jnp.where(valid, nptr, ptr)

        esc = valid & (slot == self.nsyms)
        cnt, state, ptr = self._get_bits4(state, ptr, payload, esc)
        cnt = cnt + 1
        u = jnp.zeros_like(rows)
        for i in range(8):
            active = esc & (i < cnt)
            d, state, ptr = self._get_bits4(state, ptr, payload, active)
            u = jnp.where(active, (u << 4) | d, u)
        delta = (u >> 1) ^ -(u & 1)  # unzigzag
        off = self.offsets[rows]
        esc_val = jnp.where(delta < 0, 0, self.nsyms - 1) + delta + off
        values = jnp.where(esc, esc_val, slot + off)
        return jnp.where(valid, values, 0), DeviceLaneState(state, ptr)
