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

        Entirely-invalid chunks (padding in a fixed-trip scan, e.g. the
        short wavefronts of the neural-syntax decode) skip all the work
        through one scalar-pred branch.
        """
        import jax
        import jax.numpy as jnp

        return jax.lax.cond(
            jnp.any(valid),
            lambda: self._decode_chunk_live(lanes, payload, rows, valid),
            lambda: (jnp.zeros_like(rows), lanes),
        )

    def _decode_chunk_live(self, lanes, payload, rows, valid):
        import jax
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
        off = self.offsets[rows]

        # Escapes are rare (far-tail symbols only): the bypass-nibble loop
        # is 9 predicated payload gathers, so skip the whole block with a
        # real branch (scalar-pred lax.cond) unless this chunk has one.
        def esc_path(state, ptr):
            cnt, state, ptr = self._get_bits4(state, ptr, payload, esc)
            cnt = cnt + 1
            u = jnp.zeros_like(rows)
            for i in range(8):
                active = esc & (i < cnt)
                d, state, ptr = self._get_bits4(state, ptr, payload, active)
                u = jnp.where(active, (u << 4) | d, u)
            # unzigzag in uint32: int32 `u >> 1` sign-extends once the
            # zigzag value reaches 2^31 (|delta| >= 2^30), silently
            # diverging from the C++ mirror's logical shift
            uu = u.astype(jnp.uint32)
            delta = ((uu >> 1) ^ (-(uu & 1)).astype(jnp.uint32)).astype(
                jnp.int32
            )
            esc_val = jnp.where(delta < 0, 0, self.nsyms - 1) + delta + off
            return esc_val, state, ptr

        esc_val, state, ptr = jax.lax.cond(
            jnp.any(esc),
            esc_path,
            lambda state, ptr: (jnp.zeros_like(rows), state, ptr),
            state, ptr,
        )
        values = jnp.where(esc, esc_val, slot + off)
        return jnp.where(valid, values, 0), DeviceLaneState(state, ptr)


# --------------------------------------------------------------- rans16i --
# Shared-stream INTERLEAVED lane coding.  Same CDF tables and per-lane
# 32/16 rANS math as above, but the renorm words of ALL lanes interleave
# into ONE stream in a deterministic read order (per chunk: one symbol per
# lane ascending, then escape nibble phases).  The device decoder therefore
# reads each phase's words from ONE contiguous window at a single shared
# pointer — a `dynamic_slice` + prefix-sum + one-hot matmul instead of the
# per-lane scattered payload gathers that dominated the segmented decoder
# (measured ~114 µs/chunk; the gathers, not the math) — and the container
# drops the per-lane word-count table (4 B/lane).


class Rans16InterleavedCodec:
    """Host-side encode (and mirror decode) of the interleaved format.

    Container: [uint16 L][uint16 payload ...] — no per-lane count table.
    ``symbols``/``indexes`` are flat in DECODE order (step-major); the
    wire format is defined entirely by (step_counts, L).
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
        step_counts = np.ascontiguousarray(step_counts, np.int64)
        assert symbols.shape == indexes.shape
        assert int(step_counts.sum()) == symbols.size
        cap = symbols.size * 24 + 2 * n_lanes + 64
        out = np.empty(cap, np.uint16)
        n = _lib().rans16i_encode(
            symbols, indexes, step_counts, step_counts.size, n_lanes,
            self.cdfs, self.row_len, self.offsets, out, cap,
        )
        if n < 0:
            raise RuntimeError("rans16i encode overflow")
        head = np.asarray([n_lanes], np.uint16).tobytes()
        return head + out[:n].tobytes()

    @staticmethod
    def parse(blob: bytes) -> Tuple[int, np.ndarray]:
        """→ (n_lanes, payload uint16)."""
        n_lanes = int(np.frombuffer(blob, np.uint16, 1)[0])
        payload = np.frombuffer(blob, np.uint16, -1, 2)
        return n_lanes, payload

    def decode_host(
        self, blob: bytes, indexes: np.ndarray, step_counts: np.ndarray
    ) -> np.ndarray:
        """C++ mirror of the device decoder (tests/fallback)."""
        n_lanes, payload = self.parse(blob)
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        step_counts = np.ascontiguousarray(step_counts, np.int64)
        out = np.empty(indexes.size, np.int32)
        rc = _lib().rans16i_decode(
            np.ascontiguousarray(payload), payload.size, indexes,
            step_counts, step_counts.size, n_lanes, self.cdfs,
            self.row_len, self.offsets, out,
        )
        if rc != 0:
            raise ValueError("corrupt or truncated rans16i stream")
        return out


class DeviceIState(NamedTuple):
    """Interleaved decoder state over a BATCH of independent streams:
    L lane states and ONE shared word pointer per stream."""

    state: "jax.Array"  # (B, L) uint32
    ptr: "jax.Array"  # (B,) int32 — shared word index per stream


class DeviceRans16Interleaved:
    """Jittable decoder for the interleaved shared-stream format.

    Batch-native: every method takes ``payload`` (B, W) int32 — the
    zero-extended uint16 words of B independent streams, **each padded with
    at least L trailing zeros** (so the contiguous window slice at the
    final pointer stays in bounds) — and (B, L) rows/valid masks.  The
    batch form keeps the rare-escape skip as ONE global branch instead of
    the per-stream selects a vmap would produce.

    ``valid`` masks must be PREFIX masks per stream (lane i invalid ⇒
    lane i+1 invalid) — guaranteed by the format's chunk layout.
    """

    def __init__(self, cdfs: np.ndarray, offsets: np.ndarray, n_lanes: int):
        import jax.numpy as jnp

        cdfs = np.asarray(cdfs, np.int64)
        self.rows, self.row_len = cdfs.shape
        self.nsyms = self.row_len - 2
        self.n_lanes = int(n_lanes)
        self.cdf_rows = jnp.asarray(cdfs, jnp.int32)
        self.offsets = jnp.asarray(offsets, jnp.int32)

    def init_lanes(self, payload) -> DeviceIState:
        import jax.numpy as jnp

        L = self.n_lanes
        b = payload.shape[0]
        head = payload[:, : 2 * L].reshape(b, L, 2).astype(jnp.uint32)
        return DeviceIState(
            (head[..., 0] << 16) | head[..., 1],
            jnp.full((b,), 2 * L, jnp.int32),
        )

    def _window_renorm(self, state, ptr, payload, need):
        """One interleaved renorm phase: per stream, the k-th lane needing
        a word (lanes ascending) takes word ``ptr + k`` — one contiguous
        window slice, exclusive prefix-sum ranks, one-hot matmul select."""
        import jax
        import jax.numpy as jnp

        L = self.n_lanes
        win = jax.vmap(
            lambda pay, p: jax.lax.dynamic_slice(pay, (p,), (L,))
        )(payload, ptr)  # (B, L)
        needi = need.astype(jnp.int32)
        rank = jnp.cumsum(needi, axis=1) - needi  # exclusive prefix sum
        sel = (
            rank[..., None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.int32) * needi[..., None]
        w = jnp.einsum("blk,bk->bl", sel, win).astype(jnp.uint32)
        state = jnp.where(need, (state << 16) | w, state)
        return state, ptr + jnp.sum(needi, axis=1)

    def _renorm_phase(self, state, ptr, payload, active):
        import jax.numpy as jnp

        need = active & (state < jnp.uint32(1 << 16))
        return self._window_renorm(state, ptr, payload, need)

    def _get_bits4(self, state, ptr, payload, active):
        import jax.numpy as jnp

        val = (state & jnp.uint32(15)).astype(jnp.int32)
        ns = jnp.where(active, state >> 4, state)
        ns, ptr = self._renorm_phase(ns, ptr, payload, active)
        return jnp.where(active, val, 0), ns, ptr

    def decode_chunk(self, lanes: DeviceIState, payload, rows, valid):
        """Decode one symbol per valid lane (prefix mask per stream).

        rows/valid: (B, L).  Returns (values int32 (B, L), new state).
        Entirely-invalid chunks consume nothing and skip all work through
        one scalar-pred branch."""
        import jax
        import jax.numpy as jnp

        return jax.lax.cond(
            jnp.any(valid),
            lambda: self._decode_chunk_live(lanes, payload, rows, valid),
            lambda: (jnp.zeros_like(rows), lanes),
        )

    def _decode_chunk_live(self, lanes, payload, rows, valid):
        import jax
        import jax.numpy as jnp

        state, ptr = lanes
        rows = jnp.clip(rows, 0, self.rows - 1)
        cum = (state & jnp.uint32(0xFFFF)).astype(jnp.int32)

        # slot search: ONE row-gather (B, L, row_len) then pure VPU (see
        # DeviceRans16._decode_chunk_live for the lowering rationale)
        row = self.cdf_rows[rows]
        le = (row <= cum[..., None]).astype(jnp.int32)
        slot = jnp.sum(le, axis=-1) - 1
        slot = jnp.minimum(slot, self.nsyms)
        onehot = (
            jnp.arange(self.row_len, dtype=jnp.int32)[None, None, :]
            == slot[..., None]
        ).astype(jnp.int32)
        start = jnp.sum(row * onehot, axis=-1)
        nxt = jnp.sum(
            row * jnp.concatenate(
                [jnp.zeros_like(onehot[..., :1]), onehot[..., :-1]], axis=-1
            ),
            axis=-1,
        )
        freq = nxt - start
        ns = freq.astype(jnp.uint32) * (state >> 16) + (
            cum - start
        ).astype(jnp.uint32)
        state = jnp.where(valid, ns, state)
        state, ptr = self._renorm_phase(state, ptr, payload, valid)

        esc = valid & (slot == self.nsyms)
        off = self.offsets[rows]

        def esc_path(state, ptr):
            cnt, state, ptr = self._get_bits4(state, ptr, payload, esc)
            cnt = cnt + 1
            u = jnp.zeros_like(rows)
            for i in range(8):
                active = esc & (i < cnt)
                d, state, ptr = self._get_bits4(state, ptr, payload, active)
                u = jnp.where(active, (u << 4) | d, u)
            # unzigzag in uint32: int32 `u >> 1` sign-extends once the
            # zigzag value reaches 2^31 (|delta| >= 2^30), silently
            # diverging from the C++ mirror's logical shift
            uu = u.astype(jnp.uint32)
            delta = ((uu >> 1) ^ (-(uu & 1)).astype(jnp.uint32)).astype(
                jnp.int32
            )
            esc_val = jnp.where(delta < 0, 0, self.nsyms - 1) + delta + off
            return esc_val, state, ptr

        esc_val, state, ptr = jax.lax.cond(
            jnp.any(esc),
            esc_path,
            lambda state, ptr: (jnp.zeros_like(rows), state, ptr),
            state, ptr,
        )
        values = jnp.where(esc, esc_val, slot + off)
        return jnp.where(valid, values, 0), DeviceIState(state, ptr)
