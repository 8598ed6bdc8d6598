"""Real bitstream encode/decode for the ChARM codecs.

The reference never emits an actual bitstream (no ``.compress()`` call
anywhere; bpp is likelihood-estimated).  This module supplies the missing
capability for the decodable hyper paths ('classic_dual', 'elic',
'unet_dec'):

encode (ONE device pass + host rANS):
  x → g_a → z3; z → rANS (factorized CDFs); the shared ``slices_pass``
  executable (encode mode) computes every slice's symbols + CDF rows in
  one dispatch; host rANS writes one interleaved lane-parallel stream.

decode (ONE device pass):
  z blob → z_hat; ``slices_pass`` (decode mode) runs the whole slice
  chain — per-slice (μ, σ) from decoded slices, in-pass device rANS,
  LRP — in one dispatch; finally g_s + syntax conv → image.  The
  entroformer checkerboard and neural-syntax wavefront families ride the
  same single-dispatch contract (``entro_pass_impl`` / ``_ns_scan``).

The U-Net hyper ('unet') and latent U-Net ('latent_unet') models are NOT
decodable as designed — their entropy parameters consume encoder-side
activations (``net_unet_ha_hs.py:880,892``; ``Net_unet.py:1014``) — and are
rejected with an explanatory error.

neural_syntax family (the reference's ``model/net.py`` — it never wrote the
sequential decode its spatial context implies; SURVEY §7.8):
  the 4×4 causal context window of ``PredictionModel_Context`` reads rows
  p−3..p−1 (cols q−2..q+1) plus (p, q−2), (p, q−1), so every position on
  the anti-diagonal t = 2p + q depends only on strictly-earlier wavefronts.
  Decode runs all T = 2(H−1)+W wavefronts as ONE ``lax.scan`` dispatch —
  device-side patch gather (``block_sample`` geometry, verified against
  the training path by test) → prediction head → in-scan interleaved
  device rANS → scatter — with no host round trips.  The encoder drives
  the same scan in encode mode so μ/σ match the decoder bit-for-bit.
  z2 ints ride the learned per-channel N(0, σ_z2); the syntax vector
  rides ``PredictionModel_Syntax``'s (μ, σ) — both decodable from coded
  data.

Bitstream layout (little-endian):
  magic 'LTC2' | u8 name-len | name (utf-8) | u32 model digest (crc32 of
  the factorized-prior CDF tables — catches wrong weights/preset at decode)
  | u16 H | u16 W (ORIGINAL size; padding to /64 happens inside compress
  and decompress crops back) | u16 syntax-len | i16 syntax[M]
  | u32 z_len | z blob | per slice: u32 len | blob
"""

from __future__ import annotations

import struct
import zlib
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.codec import FactorizedCoder, GaussianCoder, GaussianMuCoder
from ..data.pad import pad_to_multiple, padded_size
from .codec import CodecModel

MAGIC = b"LTC2"
Z_RANGE = 128  # factorized-prior symbol support: [-128, 127] rel. medians

# Decode payload buffers are padded up to a multiple of this many uint16
# words before entering the jitted pass: raw content-dependent widths
# would recompile the decode executable for nearly every new bitstream
# length (multi-minute on a small host, unbounded jit-cache growth in a
# long-lived CodecService).  16384 words = 32 KiB per step, a handful of
# buckets across realistic stream sizes.  Note encode (a fixed dummy
# payload) and decode (a bucketed width) therefore compile as separate
# executables of the same traced program; any σ/CDF-row divergence XLA
# could introduce between them is caught loudly by the decoder's
# final-state integrity check rather than producing silent corruption.
_PAYLOAD_BUCKET = 16384

_DECODABLE = ("classic_dual", "elic", "unet_dec")


def wavefront_groups(h: int, w: int):
    """Anti-diagonal schedule for the 4×4 causal context: positions with
    equal t = 2·row + col are mutually independent and depend only on
    earlier t.  Returns a list of (rows, cols) int arrays, t ascending."""
    groups = []
    for t in range(2 * (h - 1) + w):
        p_min = max(0, -(-(t - w + 1) // 2))  # ceil((t-w+1)/2)
        p_max = min(h - 1, t // 2)
        if p_min > p_max:
            continue
        ps = np.arange(p_min, p_max + 1, dtype=np.int64)
        groups.append((ps, t - 2 * ps))
    return groups


def _gather_patches(padded: np.ndarray, ps, qs, p_max: int) -> np.ndarray:
    """(H+6, W+6, C) 3-padded plane → (p_max, 4, 4, C) context patches for
    positions (ps, qs); rows beyond len(ps) are zero.  Geometry matches
    ``entropy.context.block_sample``: patch[i, j] = x_pad[p+i, q+j+1]."""
    n = len(ps)
    c = padded.shape[-1]
    out = np.zeros((p_max, 4, 4, c), np.float32)
    for i in range(4):
        for j in range(4):
            out[:n, i, j, :] = padded[ps + i, qs + j + 1, :]
    return out


_SYM_CLIP = 32000  # int16-safe symbol range (escape coding handles |s|>radius)


def _dev_scale_idx(sigma: jax.Array, table: jax.Array) -> jax.Array:
    """Scale-table index computed ON DEVICE (uint8) — semantics of
    ``GaussianCoder.scale_indexes``.  Encoder and decoder both run this
    identical jitted function on identical inputs, so the indexes agree
    bit-for-bit; only 1-byte indexes cross the (slow) host link."""
    s = jnp.maximum(sigma, table[0])
    return jnp.clip(
        jnp.searchsorted(table, s - 1e-9), 0, table.shape[0] - 1
    ).astype(jnp.uint8)


class ChannelCoder:
    """Owns the jitted sub-passes + rANS coders for one (model, params)."""

    def __init__(
        self, model: CodecModel, params: Any, name: str = "",
        rate: Optional[float] = None,
    ):
        cfg = model.cfg
        self.model = model
        # gain-unit models: ``rate`` selects the (gain, inverse-gain) pair
        # (continuous index, see CodecModel._gain_vectors); the coded latent
        # is the gained latent, so only analyze/synthesize see the rate —
        # it rides the bitstream header so any decoder picks the right
        # inverse gain.
        self.has_gain = cfg.gain_units > 0
        if rate is not None and not self.has_gain:
            raise ValueError(
                "rate= was given but this model has no gain units "
                "(cfg.gain_units == 0) — it would be silently ignored; "
                "use a variable-rate preset (e.g. source_net_vr) or drop "
                "the rate"
            )
        self.rate = float(rate) if rate is not None else 0.0
        # Pin params on device: checkpoint loaders return numpy leaves, and
        # passing those to the jitted sub-passes re-uploads the full tree
        # (~80 MB) on EVERY call — measured as the dominant codec cost.
        self.params = params = jax.device_put(params)
        self.is_ns = cfg.family == "neural_syntax"
        self.name = name or f"{cfg.family}.{cfg.transform}.{cfg.hyper}.{cfg.context}"
        # the HAN tail changes the reconstruction (not the bitstream) —
        # surface it in the identity so a pp-encoded stream decoded by a
        # non-pp coder fails loudly instead of reconstructing differently
        if cfg.post_processing and not self.name.endswith("+pp"):
            self.name += "+pp"
        if self.is_ns:
            self._init_neural_syntax()
            return
        if cfg.hyper not in _DECODABLE:
            raise ValueError(
                f"hyper path '{cfg.hyper}' is not decodable: the "
                "reference feeds encoder-side activations into its hyper "
                "decoder (see lic_tpu.models.compress docstring); use a "
                "'classic_dual', 'elic' or 'unet_dec' preset for real bitstreams (or "
                "the neural_syntax family's wavefront coder)"
            )

        ap = lambda method: partial(
            jax.jit(
                lambda p, *a: model.apply({"params": p}, *a, method=method)
            ),
            params,
        )
        self._analyze = ap(CodecModel.analyze)
        self._syntax = ap(CodecModel.syntax_from_latent)
        self._synthesize = ap(CodecModel.synthesize)
        self.is_entro = model.cfg.context == "entroformer"
        medians = model.apply({"params": params}, method=CodecModel.eb_medians)
        pmf = model.apply(
            {"params": params}, -Z_RANGE, Z_RANGE - 1,
            method=CodecModel.eb_pmf_table,
        )
        self.z_coder = FactorizedCoder(
            np.asarray(pmf), np.asarray(medians), -Z_RANGE
        )
        self.y_coder = GaussianCoder()

        # ---- wire-efficient step functions (device syms/indexes) ----
        # fp32 μ/σ/latent fetches cost ~5× the traffic the codec actually
        # needs.  These steps compute the integer symbols and the 1-byte
        # scale-table indexes on device and rebuild y_hat on device from
        # uploaded symbols — only int16/uint8 tensors cross the host link
        # (docs/PERF.md § codec anatomy).
        med = jnp.asarray(np.asarray(medians), jnp.float32)
        tab = jnp.asarray(self.y_coder.scale_table, jnp.float32)

        def z_enc_impl(p, z3):
            z = model.apply({"params": p}, z3, method=CodecModel.hyper_encode)
            sym = jnp.clip(jnp.round(z - med), -_SYM_CLIP, _SYM_CLIP)
            return sym.astype(jnp.int16), sym + med

        def z_dec_impl(p, sym16):
            return sym16.astype(jnp.float32) + med

        def eparams(p, m, s, sup, i):
            return model.apply(
                {"params": p}, m, s, sup, i,
                method=CodecModel.charm_entropy_params,
            )

        self._z_enc = partial(jax.jit(z_enc_impl), params)
        self._z_dec = partial(jax.jit(z_dec_impl), params)

        # ---- single-executable slice chain (device rANS) ------------
        # ONE jitted pass runs the whole ChARM slice chain for BOTH
        # directions: per slice it computes (μ, σ, scale-table rows), then
        # either consumes this slice's symbols from the lane-parallel
        # rans16 streams with the on-device decoder (decode mode) or takes
        # them from the known latents (encode mode).  The mode is a TRACED
        # flag, so encoder and decoder trace the *same program text* —
        # the payload width differs (fixed dummy at encode, bucketed at
        # decode, see _PAYLOAD_BUCKET), so they compile as two
        # executables; any σ/CDF-row divergence XLA could introduce
        # between them is caught loudly by the decoder's final-state
        # integrity check.  The decode's former 2-round-trips-per-slice
        # ping-pong (round 2: ~12 RTTs/batch) collapses to ONE dispatch.
        from ..coding.device_rans import (
            DeviceRans16Interleaved,
            Rans16InterleavedCodec,
        )
        from ..coding.pallas_rans import pallas_drain, pallas_rans_active

        # INTERLEAVED shared-stream format: all lanes' renorm words weave
        # into one stream, so the device decoder reads each chunk from ONE
        # contiguous window (dynamic_slice + prefix-sum + one-hot matmul)
        # instead of per-lane scattered payload gathers (measured: the
        # gathers, not the math, dominated the segmented decode), and the
        # container drops the 4 B/lane word-count table — which lets lanes
        # double to 128 (the TPU lane width) at the segmented format's
        # 64-lane overhead.
        self.lane_codec = Rans16InterleavedCodec(
            self.y_coder.codec.cdfs, self.y_coder.codec.offsets
        )
        self.charm_lanes = 128
        self.dev_rans = DeviceRans16Interleaved(
            self.y_coder.codec.cdfs, self.y_coder.codec.offsets,
            self.charm_lanes,
        )
        dev, n_lanes = self.dev_rans, self.charm_lanes

        def drain(lanes, payload, rows_flat, s_tot, use_stream=None):
            """Decode ``s_tot`` symbols from the lane-parallel stream with
            CDF rows ``rows_flat`` (b, s_tot) — chunked lax.scan (xs are
            pre-sliced, ys auto-stacked, `unroll` amortizes the per-chunk
            loop overhead that dominated the decode).

            ``use_stream``: the pass's encode/decode selector.  When given,
            the WHOLE chunk scan sits behind a scalar-pred ``lax.cond`` —
            encode mode (0) skips every serial rANS chunk instead of
            decoding a dummy payload (the decoded values are discarded by
            the ``jnp.where(use_stream, …)`` selects anyway, and the μ/σ
            computation is outside this function, so encode/decode
            bit-exactness of the entropy params is untouched).

            On TPU the whole drain runs as ONE pallas kernel (lane states
            in VMEM across all chunks, one-hot MXU table lookups —
            ``coding/pallas_rans.py``); the scan lowering below is the
            CPU/fallback path and the kernel's parity reference."""
            b = rows_flat.shape[0]
            if pallas_rans_active():
                def run_pallas(lanes):
                    return pallas_drain(
                        dev, lanes, payload, rows_flat, s_tot
                    )

                if use_stream is None:
                    return run_pallas(lanes)
                return jax.lax.cond(
                    use_stream != 0,
                    run_pallas,
                    lambda lanes: (
                        lanes,
                        jnp.zeros_like(rows_flat),
                    ),
                    lanes,
                )
            mc = -(-s_tot // n_lanes)
            rows_pad = jnp.pad(
                rows_flat, ((0, 0), (0, mc * n_lanes - s_tot))
            )
            rows_sc = rows_pad.reshape(b, mc, n_lanes).transpose(1, 0, 2)
            valid_sc = (
                jnp.arange(mc, dtype=jnp.int32)[:, None] * n_lanes
                + jnp.arange(n_lanes, dtype=jnp.int32)[None, :]
            ) < s_tot  # (mc, L)

            def chunk(lanes, xs):
                rk, vd = xs  # (b, L), (L,)
                vals, lanes = dev.decode_chunk(
                    lanes, payload, rk,
                    jnp.broadcast_to(vd, (b, n_lanes)),
                )
                return lanes, vals

            def run(lanes):
                return jax.lax.scan(
                    chunk, lanes, (rows_sc, valid_sc), unroll=8
                )

            if use_stream is None:
                lanes, dec = run(lanes)
            else:
                lanes, dec = jax.lax.cond(
                    use_stream != 0,
                    run,
                    lambda lanes: (
                        lanes, jnp.zeros((mc, b, n_lanes), jnp.int32)
                    ),
                    lanes,
                )
            return lanes, dec.transpose(1, 0, 2).reshape(b, -1)[:, :s_tot]

        def slices_pass_impl(p, z_hat, y, payload, use_stream):
            b = z_hat.shape[0]
            scales, means = model.apply(
                {"params": p}, z_hat, method=CodecModel.hyper_decode
            )
            y_slices = jnp.split(y, cfg.num_slices, axis=-1)
            lanes = dev.init_lanes(payload)
            supports, syms_out, rows_out = [], [], []
            for i in range(cfg.num_slices):
                sup = (
                    supports[: cfg.max_support_slices]
                    if cfg.max_support_slices >= 0
                    else supports
                )
                mu, sigma, msup = model.apply(
                    {"params": p}, means, scales, tuple(sup), i,
                    method=CodecModel.charm_entropy_params,
                )
                rows = _dev_scale_idx(sigma, tab).astype(jnp.int32)
                sym_enc = jnp.clip(
                    jnp.round(y_slices[i] - mu), -_SYM_CLIP, _SYM_CLIP
                ).astype(jnp.int32)

                s_tot = rows.shape[1] * rows.shape[2] * rows.shape[3]
                lanes, dec = drain(
                    lanes, payload, rows.reshape(b, s_tot), s_tot,
                    use_stream=use_stream,
                )
                sym_dec = dec.reshape(rows.shape)
                sym = jnp.where(use_stream != 0, sym_dec, sym_enc)
                y_hat = model.apply(
                    {"params": p}, msup, sym.astype(jnp.float32) + mu, i,
                    method=CodecModel.charm_apply_lrp,
                )
                supports.append(y_hat)
                syms_out.append(sym.astype(jnp.int16).reshape(b, -1))
                rows_out.append(rows.astype(jnp.uint8).reshape(b, -1))
            return (
                jnp.concatenate(syms_out, axis=1),
                jnp.concatenate(rows_out, axis=1),
                jnp.concatenate(supports, axis=-1),
                lanes.state,
                lanes.ptr,
            )

        def entro_pass_impl(p, z_hat, y, payload, use_stream):
            """Checkerboard analog of ``slices_pass_impl``: pass 1 codes the
            anchor half (prior only), pass 2 the non-anchors given decoded
            anchors — same single-dispatch encode/decode contract.  The
            anchor gather/scatter uses static flat indexes (trace-time
            numpy from the concrete latent shape; symbol order matches the
            boolean-mask raster order of the old host path)."""
            from ..layers.entroformer import checkerboard_masks

            b, yh, yw, c = y.shape
            mask = np.broadcast_to(
                checkerboard_masks(yh, yw)[0][:, :, None], (yh, yw, c)
            )
            idxs = [
                jnp.asarray(np.flatnonzero(mask.reshape(-1))),
                jnp.asarray(np.flatnonzero(~mask.reshape(-1))),
            ]
            scales, means = model.apply(
                {"params": p}, z_hat, method=CodecModel.hyper_decode
            )
            y_flat = y.reshape(b, -1)
            lanes = dev.init_lanes(payload)
            y_known = jnp.zeros_like(y)
            syms_out, rows_out = [], []
            h_emb = model.apply(
                {"params": p}, scales, means,
                method=CodecModel.entro_embed_hyper,
            )
            for idx in idxs:
                mu, sigma = model.apply(
                    {"params": p}, y_known, scales, means, h_emb,
                    method=CodecModel.entro_predict,
                )
                mu_f = jnp.take(mu.reshape(b, -1), idx, axis=1)
                rows_f = jnp.take(
                    _dev_scale_idx(sigma, tab).astype(jnp.int32)
                    .reshape(b, -1), idx, axis=1,
                )
                sym_enc = jnp.clip(
                    jnp.round(jnp.take(y_flat, idx, axis=1) - mu_f),
                    -_SYM_CLIP, _SYM_CLIP,
                ).astype(jnp.int32)
                lanes, sym_dec = drain(
                    lanes, payload, rows_f, idx.shape[0],
                    use_stream=use_stream,
                )
                sym = jnp.where(use_stream != 0, sym_dec, sym_enc)
                y_known = (
                    y_known.reshape(b, -1)
                    .at[:, idx].set(sym.astype(jnp.float32) + mu_f)
                    .reshape(b, yh, yw, c)
                )
                syms_out.append(sym.astype(jnp.int16))
                rows_out.append(rows_f.astype(jnp.uint8))
            return (
                jnp.concatenate(syms_out, axis=1),
                jnp.concatenate(rows_out, axis=1),
                y_known,
                lanes.state,
                lanes.ptr,
            )

        self._slices_pass = partial(
            jax.jit(entro_pass_impl if self.is_entro else slices_pass_impl),
            params,
        )
        # weights digest: crc32 of the quantized factorized-prior CDF tables
        # (a pure function of the trained params, already on host)
        self.digest = zlib.crc32(self.z_coder.codec.cdfs.tobytes()) & 0xFFFFFFFF

    # ------------------------------------------- neural-syntax machinery

    def _init_neural_syntax(self):
        model, params = self.model, self.params
        ap = lambda method: partial(
            jax.jit(
                lambda p, *a: model.apply({"params": p}, *a, method=method)
            ),
            params,
        )
        self._analyze = ap(CodecModel.analyze)
        self._ns_ha = ap(CodecModel.ns_hyper_encode)
        self._ns_hs = ap(CodecModel.ns_hyper_decode)
        self._ns_syntax_params = ap(CodecModel.ns_syntax_params)
        self._ns_syntax_vec = ap(CodecModel.syntax_from_latent)
        self._synthesize = ap(CodecModel.synthesize)

        sigma_z2 = np.abs(
            np.asarray(
                model.apply({"params": params}, method=CodecModel.ns_z2_sigma)
            )
        )  # (N,)
        self.z2_sigma = sigma_z2
        self.z2_coder = GaussianCoder()
        self.mu_coder = GaussianMuCoder()
        self.digest = zlib.crc32(sigma_z2.tobytes()) & 0xFFFFFFFF

        # ---- single-dispatch wavefront scan (device rANS) -----------
        # ONE jitted lax.scan drives BOTH encode and decode: each step
        # gathers the group's 4×4 causal patches from the device-resident
        # plane, runs the prediction head, and then either (decode mode)
        # consumes this wavefront's symbols from the lane-parallel rans16
        # streams with the vectorized on-device decoder, or (encode mode)
        # scatters the known integer latents.  The mode is a TRACED
        # flag, so both directions trace the same program text (payload
        # widths differ — see _PAYLOAD_BUCKET — so they compile
        # separately; the final-state integrity check catches any
        # cross-executable μ/σ divergence loudly).  Decode needs NO host
        # round trips at all (the round-2 host-rANS loop paid T≈2H'+W').
        from ..coding.device_rans import Rans16InterleavedCodec

        # Interleaved shared-stream format (same rationale as the ChARM
        # path, see __init__): contiguous-window renorm instead of
        # per-lane scattered payload gathers, no per-lane count table.
        # The device decoder is built per latent grid inside _ns_scan
        # (its lane count is shape-dependent).
        self.lane_codec = Rans16InterleavedCodec(
            self.mu_coder.codec.cdfs, self.mu_coder.codec.offsets
        )
        self._ns_scan_cache = {}

    # ------------------------------------------------------------- encode

    def compress(self, x: jax.Array, rate: Optional[float] = None) -> bytes:
        """x: (1, H, W, 3) in [−1, 1] — any size; padded to /64 internally
        and the original size is carried in the header.

        ``rate``: per-call gain-unit rate index overriding the coder's
        default (gain-unit models only) — e.g. the output of
        ``serving.rate_control.solve_rate_for_bpp``.  It rides the
        bitstream header, so decoding needs no matching coder state."""
        cfg = self.model.cfg
        if rate is not None and not self.has_gain:
            raise ValueError(
                "rate= was given but this model has no gain units"
            )
        r = self.rate if rate is None else float(rate)
        b, h, w, _ = x.shape
        assert b == 1, "one image per bitstream"
        x, _ = pad_to_multiple(x, 64)
        if self.is_ns:
            return self._compress_ns(x, h, w)

        z3 = self._analyze(x, jnp.float32(r))
        # symbols are rounded ON DEVICE so they match the jitted forward's
        # ste_round bit-for-bit (host numpy fp32 can round differently at
        # .5 boundaries); the decoder reconstructs z_hat/y_hat from the same
        # device functions, and only int16 symbols / uint8 scale indexes
        # cross the host link (see _dev_scale_idx).
        z_sym16, z_hat = self._z_enc(z3)
        z_blob = self.z_coder.encode_symbols(np.asarray(z_sym16))

        if cfg.syntax != "none":
            syntax = np.asarray(self._syntax(z3))[0, 0, 0].astype(np.int16)
        else:
            syntax = np.zeros((0,), np.int16)

        blob_y = self._charm_encode_streams(z_hat, z3)[0]
        return self._pack(h, w, syntax, z_blob, [blob_y], rate=r)

    def _charm_step_counts(self, hy: int, wy: int) -> List[int]:
        """Per-step symbol counts in decode order of the lane split: one
        entry per ChARM slice, or [anchors, non-anchors] for the
        checkerboard entroformer pass."""
        cfg = self.model.cfg
        if self.is_entro:
            from ..layers.entroformer import checkerboard_masks

            n_anchor = int(checkerboard_masks(hy, wy)[0].sum()) * cfg.N
            return [n_anchor, hy * wy * cfg.N - n_anchor]
        per = cfg.N // cfg.num_slices
        return [hy * wy * per] * cfg.num_slices

    def _charm_encode_streams(self, z_hat, z3) -> List[bytes]:
        """Run the shared slices executable in encode mode and lane-encode
        each image's symbols (one rans16 container per image)."""
        b = z3.shape[0]
        sym16, rows, _, _, _ = self._slices_pass(
            z_hat, z3,
            jnp.zeros((b, 2 * self.charm_lanes), jnp.int32),
            jnp.int32(0),
        )
        sym_np = np.asarray(sym16)
        rows_np = np.asarray(rows)
        counts = self._charm_step_counts(z3.shape[1], z3.shape[2])
        return [
            self.lane_codec.encode(
                sym_np[i], rows_np[i], counts, self.charm_lanes
            )
            for i in range(b)
        ]

    def _pack(self, h, w, syntax, z_blob, blobs, rate=None) -> bytes:
        out = bytearray()
        out += MAGIC
        name = self.name.encode("utf-8")[:255]
        out += struct.pack("<B", len(name))
        out += name
        out += struct.pack("<I", self.digest)
        out += struct.pack("<HH", h, w)
        out += struct.pack("<H", syntax.size)
        out += syntax.tobytes()
        if self.has_gain:
            # gain-unit models carry the continuous rate index so any
            # decoder applies the matching inverse gain
            out += struct.pack("<f", self.rate if rate is None else rate)
        out += struct.pack("<I", len(z_blob))
        out += z_blob
        for blob in blobs:
            out += struct.pack("<I", len(blob))
            out += blob
        return bytes(out)

    # --------------------------- batched + host-overlapped codec path

    def compress_batch(
        self, xs: jax.Array, rates: Optional[List[float]] = None
    ) -> List[bytes]:
        """Compress B same-sized images through ONE batched device pipeline.

        Device work (transforms, hyper, slice μ/σ) runs batched — one
        dispatch per stage instead of per image — and the host rANS encodes
        are submitted to a worker thread as soon as each slice's symbols
        land, overlapping entropy coding with the remaining device compute
        (SURVEY §7.8 "pipelined host coding").

        ``rates``: per-image gain-unit rate indexes (gain-unit models
        only); None codes every image at the coder's rate.  Mixed rates
        share the batch — the gains broadcast per image on device.
        """
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.model.cfg
        b, h, w, _ = xs.shape
        xs, _ = pad_to_multiple(xs, 64)
        if self.is_ns:
            assert rates is None, "neural_syntax models have no gain units"
            return self._compress_ns_batch(xs, h, w)

        if rates is not None:
            assert self.has_gain and len(rates) == b
            rate_arg = jnp.asarray(rates, jnp.float32)
        else:
            rate_arg = jnp.float32(self.rate)
        z3 = self._analyze(xs, rate_arg)
        z_sym16, z_hat = self._z_enc(z3)
        if cfg.syntax != "none":
            syntax_dev = self._syntax(z3)
        # one dispatch computes every slice's symbols + CDF rows (encode
        # mode of the shared executable); host rANS encodes overlap the
        # device fetches via a worker thread
        sym_dev, rows_dev, _, _, _ = self._slices_pass(
            z_hat, z3,
            jnp.zeros((b, 2 * self.charm_lanes), jnp.int32),
            jnp.int32(0),
        )

        if cfg.syntax != "none":
            syntax = np.asarray(syntax_dev)[:, 0, 0].astype(np.int16)
        else:
            syntax = np.zeros((b, 0), np.int16)

        counts = self._charm_step_counts(z3.shape[1], z3.shape[2])
        with ThreadPoolExecutor(max_workers=1) as pool:
            z_sym = np.asarray(z_sym16)
            z_jobs = [
                pool.submit(self.z_coder.encode_symbols, z_sym[i : i + 1])
                for i in range(b)
            ]
            sym_np, rows_np = np.asarray(sym_dev), np.asarray(rows_dev)
            y_jobs = [
                pool.submit(
                    self.lane_codec.encode,
                    sym_np[i], rows_np[i], counts, self.charm_lanes,
                )
                for i in range(b)
            ]
            return [
                self._pack(
                    h, w, syntax[i], z_jobs[i].result(), [y_jobs[i].result()],
                    rate=None if rates is None else float(rates[i]),
                )
                for i in range(b)
            ]

    def decompress_batch(self, blobs: List[bytes]) -> jax.Array:
        """Decode B same-sized bitstreams through batched device passes.

        The slice ping-pong is inherently sequential (slice i's μ/σ need
        decoded slices < i) but batching across images amortizes every
        device dispatch B-fold; host rANS decodes run between device steps.
        """
        from ..coding.device_rans import Rans16InterleavedCodec

        b = len(blobs)
        heads = [self._parse_header(d) for d in blobs]
        orig_h, orig_w = heads[0][1], heads[0][2]
        assert all(
            (hh[1], hh[2]) == (orig_h, orig_w) for hh in heads
        ), "decompress_batch needs same-sized bitstreams"
        h, w = padded_size(orig_h, orig_w, 64)
        if self.is_ns:
            return self._decompress_ns_batch(
                blobs, [hh[0] for hh in heads], orig_h, orig_w, h, w
            )

        z_shape = (1, h // 64, w // 64, self.z_coder.medians.shape[0])
        z_syms, syns, payloads, rates = [], [], [], []
        for data, hd in zip(blobs, heads):
            off = hd[0]
            if self.has_gain:
                rates.append(struct.unpack_from("<f", data, off)[0])
                off += 4
            (z_len,) = struct.unpack_from("<I", data, off)
            off += 4
            z_syms.append(
                self.z_coder.decode_symbols(data[off : off + z_len], z_shape)
            )
            off += z_len
            syns.append(hd[3])
            (y_len,) = struct.unpack_from("<I", data, off)
            off += 4
            nl, pay = Rans16InterleavedCodec.parse(data[off : off + y_len])
            if nl != self.charm_lanes:
                raise ValueError(
                    f"rans16i lane count mismatch: stream {nl}, "
                    f"decoder {self.charm_lanes}"
                )
            payloads.append(pay)
        z_hat = self._z_dec(
            jnp.asarray(np.concatenate(z_syms, axis=0).astype(np.int16))
        )

        # stack per-image payloads (B, wmax); >= L trailing zeros keep the
        # shared-pointer window slice in bounds at the final position.
        # wmax is BUCKETED (next multiple of 16384 words): a raw
        # content-dependent width would recompile the whole slice-chain
        # executable for nearly every new bitstream length.
        wmax = -(-(max(p.size for p in payloads) + self.charm_lanes)
                 // _PAYLOAD_BUCKET) * _PAYLOAD_BUCKET
        pay_flat = np.zeros((b, wmax), np.int32)
        for i, p in enumerate(payloads):
            pay_flat[i, : p.size] = p

        _, _, y_full, lstate, lptr = self._slices_pass(
            z_hat,
            jnp.zeros(
                (b, h // 16, w // 16, self.model.cfg.N), jnp.float32
            ),
            jnp.asarray(pay_flat),
            jnp.int32(1),
        )
        ends = np.asarray([p.size for p in payloads], np.int32)
        if not (
            np.all(np.asarray(lstate) == np.uint32(1 << 16))
            and np.all(np.asarray(lptr) == ends)
        ):
            raise ValueError(
                "corrupt or truncated rans16i stream (final-state check)"
            )

        m_len = syns[0].size
        syn = (
            jnp.asarray(np.stack(syns).astype(np.float32)).reshape(b, 1, 1, -1)
            if m_len
            else None
        )
        if self.has_gain:
            # per-image header rates; mixed rates broadcast on device
            rec = self._synthesize(
                y_full, syn, jnp.asarray(rates, jnp.float32)
            )
        else:
            rec = self._synthesize(y_full, syn)
        return rec[:, :orig_h, :orig_w, :]

    def _parse_header(self, data: bytes):
        """→ (offset past header, orig_h, orig_w, syntax int16 array)."""
        if data[:4] != MAGIC:
            raise ValueError("bad magic — not an LTC2 bitstream")
        off = 4
        (nlen,) = struct.unpack_from("<B", data, off)
        off += 1
        name = data[off : off + nlen].decode("utf-8")
        off += nlen
        (digest,) = struct.unpack_from("<I", data, off)
        off += 4
        if name != self.name:
            raise ValueError(
                f"bitstream was produced by model '{name}', this coder is "
                f"'{self.name}'"
            )
        if digest != self.digest:
            raise ValueError(
                "bitstream weights digest mismatch — decoding with "
                "different parameters than it was encoded with"
            )
        orig_h, orig_w = struct.unpack_from("<HH", data, off)
        off += 4
        (m_len,) = struct.unpack_from("<H", data, off)
        off += 2
        syntax = np.frombuffer(data, np.int16, m_len, off)
        off += m_len * 2
        return off, orig_h, orig_w, syntax

    # ------------------------------- neural-syntax wavefront coding

    @staticmethod
    def _ns_lane_count(total_syms: int) -> int:
        """Lanes for the content stream.  Wavefront decode latency is the
        SERIAL chunk count ``Σ_t ceil(p_max·c / L)``, so lanes are the
        dominant throughput lever (round-3's ≥2048-symbols/lane rule left
        the bench shape at 32 lanes = 66 serial chunks per wavefront).
        ≥256 symbols/lane keeps the 4 B/lane state flush ≤ ~1.6% of a
        typical payload — measured +0.7% bpp at 640×512 for ~7× fewer
        chunks."""
        l = 1
        while l < 256 and total_syms // (2 * l) >= 256:
            l *= 2
        return max(l, 8)

    def _ns_scan(self, hy: int, wy: int, batch: int = 1):
        """Build (and cache) the single-dispatch wavefront executable for a
        latent grid at batch size ``batch``.  Returns
        ``fn(h2 (B,hy,wy,·), payload (B,W), y_known (B,hy,wy,C), mode)``
        → ``(res (T,B,P,C) i16, rows (T,B,P,C) i16, mu_r (T,B,P,C) i16,
        plane (B,hy,wy,C), lane_state (B,L), lane_ptr (B,))``.

        Batching is the wavefront decode's dominant throughput lever: a
        wavefront step's work (a ≤p_max-position context head + an
        ≤mc-chunk rANS drain) is far below one dispatch's latency floor,
        so B images in ONE scan cost nearly the same wall-clock as one —
        each image stays an independent L-lane rANS stream (identical
        wire format to the B=1 coder), batched only on device.
        """
        key = (hy, wy, batch)
        if key in self._ns_scan_cache:
            return self._ns_scan_cache[key]

        from ..coding.device_rans import DeviceRans16Interleaved
        from ..coding.pallas_rans import pallas_drain, pallas_rans_active

        cfg = self.model.cfg
        c = cfg.N - cfg.M
        groups = wavefront_groups(hy, wy)
        T = len(groups)
        p_max = max(len(g[0]) for g in groups)
        n_lanes = self._ns_lane_count(hy * wy * c)
        mc = -(-(p_max * c) // n_lanes)  # chunks per step
        OOB = -(10 ** 6)  # padded rows: scatter-dropped, gathers clamp

        def pad_rc(a):
            return np.pad(
                a.astype(np.int32) + 3, (0, p_max - len(a)),
                constant_values=OOB,
            )

        rs = jnp.asarray(np.stack([pad_rc(ps) for ps, _ in groups]))
        cs = jnp.asarray(np.stack([pad_rc(qs) for _, qs in groups]))
        nsym = jnp.asarray(
            np.asarray([len(ps) * c for ps, _ in groups], np.int32)
        )
        tabm = jnp.asarray(self.mu_coder.scale_table, jnp.float32)
        nd = self.mu_coder.n_delta
        dev = DeviceRans16Interleaved(
            self.mu_coder.codec.cdfs, self.mu_coder.codec.offsets, n_lanes
        )
        model, params = self.model, self.params

        B = batch

        def fn_impl(p, h2, payload, y_known, use_stream):
            # payload: (B, W) int32 — one interleaved stream per image,
            # padded with >= n_lanes trailing zeros by the caller
            hpad = jnp.pad(h2, ((0, 0), (3, 3), (3, 3), (0, 0)))
            ypad = jnp.zeros((B, hy + 6, wy + 6, c), jnp.float32)
            lanes = dev.init_lanes(payload)

            def body(carry, xs):
                ypad, lanes = carry
                r, q, ns_t = xs
                ii = jnp.arange(4)
                # patch[i, j] covers unpadded rows p−3..p, cols q−2..q+1
                # (block_sample geometry: xp[p+i, q+j+1] on a 3-padded
                # plane); r, q here are PADDED coords, hence the −3 / −2
                rr = r[:, None, None] + ii[None, :, None] - 3  # (P, 4, 1)
                cc = q[:, None, None] + ii[None, None, :] - 2  # (P, 1, 4)
                ypat = ypad[:, rr, cc]      # (B, P, 4, 4, Cy); OOB clamps
                ypat = ypat.at[:, :, 3, 2:, :].set(0.0)   # causal mask
                hpat = hpad[:, rr, cc]
                merged = jnp.concatenate([ypat, hpat], axis=-1)
                mu, sg = model.apply(
                    {"params": p},
                    merged.reshape((B * p_max,) + merged.shape[2:]),
                    method=CodecModel.ns_context_head,
                )
                mu = mu.reshape(B, p_max, c)
                sg = sg.reshape(B, p_max, c)
                mu_r = jnp.round(mu)
                si = jnp.clip(
                    jnp.searchsorted(tabm, jnp.maximum(sg, tabm[0]) - 1e-9),
                    0, tabm.shape[0] - 1,
                )
                dj = jnp.clip(jnp.floor((mu - mu_r + 0.5) * nd), 0, nd - 1)
                rows = (si * nd + dj).astype(jnp.int32)    # (B, P, C)
                mu_i = mu_r.astype(jnp.int32)

                # encode mode never reads the (dummy) stream: skip the
                # whole serial drain behind one scalar-pred branch —
                # μ/σ above are computed identically either way, so the
                # coded rows stay bit-exact between encode and decode
                if pallas_rans_active():
                    # whole-wavefront drain in ONE pallas kernel (traced
                    # ns_t masks the padded tail; see coding/pallas_rans)
                    lanes, dec = jax.lax.cond(
                        use_stream != 0,
                        lambda lanes: pallas_drain(
                            dev, lanes, payload,
                            rows.reshape(B, -1), ns_t,
                        ),
                        lambda lanes: (
                            lanes,
                            jnp.zeros((B, p_max * c), jnp.int32),
                        ),
                        lanes,
                    )
                    sym = dec.reshape(B, p_max, c)
                else:
                    rows_pad = jnp.pad(
                        rows.reshape(B, -1),
                        ((0, 0), (0, mc * n_lanes - p_max * c)),
                    )
                    # inner chunk loop as an unrolled scan (see
                    # slices_pass): pre-sliced xs + auto-stacked ys
                    rows_sc = (
                        rows_pad.reshape(B, mc, n_lanes).transpose(1, 0, 2)
                    )
                    valid_sc = (
                        jnp.arange(mc, dtype=jnp.int32)[:, None] * n_lanes
                        + jnp.arange(n_lanes, dtype=jnp.int32)[None, :]
                    ) < ns_t  # (mc, L); ns_t = this wavefront's symbols

                    def chunk(lanes, xs):
                        rk, vd = xs  # (B, L), (L,)
                        vals, lanes = dev.decode_chunk(
                            lanes, payload, rk,
                            jnp.broadcast_to(vd, (B, n_lanes)),
                        )
                        return lanes, vals

                    lanes, dec = jax.lax.cond(
                        use_stream != 0,
                        lambda lanes: jax.lax.scan(
                            chunk, lanes, (rows_sc, valid_sc), unroll=8
                        ),
                        lambda lanes: (
                            lanes, jnp.zeros((mc, B, n_lanes), jnp.int32)
                        ),
                        lanes,
                    )
                    sym = (
                        dec.transpose(1, 0, 2).reshape(B, -1)
                        [:, : p_max * c].reshape(B, p_max, c)
                    )

                yk = y_known[
                    :, jnp.clip(r - 3, 0, hy - 1), jnp.clip(q - 3, 0, wy - 1)
                ]
                vals = jnp.where(
                    use_stream != 0, sym + mu_i, yk
                ).astype(jnp.float32)
                ypad = ypad.at[:, r, q].set(vals, mode="drop")
                # wire-efficient encode outputs: the host rANS encoder needs
                # only (y−μ) residuals + CDF rows, both int16-safe (the ±
                # _SYM_CLIP charm convention; values this large never occur
                # on trained latents and escape coding covers the tail) —
                # halves the (T,B,P,C) fetch over the host link twice over
                res = jnp.clip(yk - mu_i, -_SYM_CLIP, _SYM_CLIP)
                return (ypad, lanes), (
                    res.astype(jnp.int16),
                    rows.astype(jnp.int16),
                    jnp.clip(mu_i, -_SYM_CLIP, _SYM_CLIP).astype(jnp.int16),
                )

            (ypad, lanes), (res_all, rows_all, mu_all) = jax.lax.scan(
                body, (ypad, lanes), (rs, cs, nsym)
            )
            plane = ypad[:, 3 : 3 + hy, 3 : 3 + wy, :]
            return res_all, rows_all, mu_all, plane, lanes.state, lanes.ptr

        fn = partial(jax.jit(fn_impl), params)
        entry = (fn, groups, n_lanes, p_max, c)
        self._ns_scan_cache[key] = entry
        return entry

    def _compress_ns(self, x: jax.Array, h: int, w: int) -> bytes:
        return self._compress_ns_batch(x, h, w)[0]

    def _compress_ns_batch(self, xs: jax.Array, h: int, w: int) -> List[bytes]:
        """B same-sized images → B independent bitstreams (identical wire
        format to the B=1 path) through ONE batched wavefront scan; host
        rANS encodes run on a worker thread overlapping device compute."""
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.model.cfg
        b = xs.shape[0]
        z3 = self._analyze(xs)
        z2 = self._ns_ha(z3)
        z2_int = np.asarray(jnp.round(z2)).astype(np.int32)
        scales_z2 = np.broadcast_to(self.z2_sigma, z2_int.shape[1:])

        # decode-parity by construction: h2 is derived from the SAME host
        # integers the decoder will decode (z2 is tiny; the big tensors
        # below never leave the device)
        h2 = self._ns_hs(jnp.asarray(z2_int, jnp.float32))
        syn_int = np.asarray(self._ns_syntax_vec(z3)).astype(np.int32)
        mu_s, sg_s = self._ns_syntax_params(h2)
        mu_s = np.asarray(mu_s, np.float32).reshape(b, -1)
        sg_s = np.asarray(sg_s, np.float32).reshape(b, -1)

        y_dev = jnp.round(z3[..., cfg.M :]).astype(jnp.int32)  # stays on device
        hy, wy = int(y_dev.shape[1]), int(y_dev.shape[2])
        fn, groups, n_lanes, p_max, c = self._ns_scan(hy, wy, batch=b)
        # valid (t, p) slots in the old concat-over-groups symbol order
        vt = np.concatenate(
            [np.full(len(ps), t, np.int64) for t, (ps, _) in enumerate(groups)]
        )
        vp = np.concatenate(
            [np.arange(len(ps), dtype=np.int64) for ps, _ in groups]
        )
        with ThreadPoolExecutor(max_workers=1) as pool:
            z_jobs = [
                pool.submit(
                    self.z2_coder.encode_symbols, z2_int[i], scales_z2
                )
                for i in range(b)
            ]
            s_jobs = [
                pool.submit(
                    self.mu_coder.encode_ints,
                    syn_int[i].reshape(-1), mu_s[i], sg_s[i],
                )
                for i in range(b)
            ]
            # encode mode: dummy stream, known integer latents drive the
            # plane; the z2/syntax host encodes overlap this device pass.
            # Only the int16 (residual, row) tensors cross the host link.
            res_dev, rows_dev, _, _, _, _ = fn(
                h2,
                jnp.zeros((b, 2 * n_lanes), jnp.int32),
                y_dev,
                jnp.int32(0),
            )
            res_np = np.asarray(res_dev)      # (T, B, P, C) int16
            rows_np = np.asarray(rows_dev)
            res_all = res_np[vt, :, vp]       # (S, B, C), group order
            rows_all = rows_np[vt, :, vp]
            step_counts = [len(ps) * c for ps, _ in groups]
            y_jobs = [
                pool.submit(
                    self.lane_codec.encode,
                    np.ascontiguousarray(res_all[:, i]).astype(np.int32),
                    np.ascontiguousarray(rows_all[:, i]).astype(np.int32),
                    step_counts, n_lanes,
                )
                for i in range(b)
            ]
            return [
                self._pack(
                    h, w, np.zeros((0,), np.int16),
                    z_jobs[i].result(), [s_jobs[i].result(), y_jobs[i].result()],
                )
                for i in range(b)
            ]

    def _decompress_ns(self, data, off, orig_h, orig_w, h, w):
        return self._decompress_ns_batch(
            [data], [off], orig_h, orig_w, h, w
        )

    def _decompress_ns_batch(self, blobs, offs, orig_h, orig_w, h, w):
        """Decode B same-sized NS bitstreams through ONE batched wavefront
        scan — each image stays its own L-lane rANS stream; the scan's
        per-step latency floor is paid once for the whole batch."""
        cfg = self.model.cfg
        from ..coding.device_rans import Rans16InterleavedCodec

        b = len(blobs)
        z_shape = (h // 64, w // 64, cfg.N)
        scales_z2 = np.broadcast_to(self.z2_sigma, z_shape)
        z_idx = self.z2_coder.scale_indexes(scales_z2)
        z2_int = np.zeros((b,) + z_shape, np.float32)
        s_blobs, payloads = [], []
        for i, (data, off) in enumerate(zip(blobs, offs)):
            (z_len,) = struct.unpack_from("<I", data, off)
            off += 4
            z2_int[i] = (
                self.z2_coder.codec.decode(data[off : off + z_len], z_idx)
                .reshape(z_shape)
                .astype(np.float32)
            )
            off += z_len
            (s_len,) = struct.unpack_from("<I", data, off)
            off += 4
            s_blobs.append(data[off : off + s_len])
            off += s_len
            (y_len,) = struct.unpack_from("<I", data, off)
            off += 4
            blob_lanes, payload = Rans16InterleavedCodec.parse(
                data[off : off + y_len]
            )
            if i == 0:
                lanes0 = blob_lanes
            elif blob_lanes != lanes0:
                raise ValueError(
                    "mixed rans16i lane counts in one decode batch"
                )
            payloads.append(payload)
        h2 = self._ns_hs(jnp.asarray(z2_int))

        mu_s, sg_s = self._ns_syntax_params(h2)
        mu_s = np.asarray(mu_s, np.float32).reshape(b, -1)
        sg_s = np.asarray(sg_s, np.float32).reshape(b, -1)
        syn_int = np.stack(
            [
                self.mu_coder.decode_ints(s_blobs[i], mu_s[i], sg_s[i])
                for i in range(b)
            ]
        )

        hy, wy = int(h2.shape[1]), int(h2.shape[2])
        fn, groups, n_lanes, p_max, c = self._ns_scan(hy, wy, batch=b)
        if blob_lanes != n_lanes:
            raise ValueError(
                f"rans16i lane count mismatch: stream {blob_lanes}, "
                f"decoder {n_lanes}"
            )
        # decode mode: one device dispatch runs the whole wavefront scan;
        # >= n_lanes trailing zeros keep the shared-pointer window slice
        # in bounds at the final position.  Width is bucketed so new
        # stream lengths reuse the compiled scan (see _PAYLOAD_BUCKET).
        wmax = max(p.size for p in payloads)
        wpad = -(-(wmax + n_lanes) // _PAYLOAD_BUCKET) * _PAYLOAD_BUCKET
        pay_flat = np.zeros((b, wpad), np.int32)
        for i, p in enumerate(payloads):
            pay_flat[i, : p.size] = p
        _, _, _, plane, lstate, lptr = fn(
            h2,
            jnp.asarray(pay_flat),
            jnp.zeros((b, hy, wy, c), jnp.int32),
            jnp.int32(1),
        )
        # stream integrity: every lane must end at the interval bound with
        # every word consumed (the single-stream path's finish() analogue)
        ends = np.asarray([p.size for p in payloads], np.int32)
        if not (
            np.all(np.asarray(lstate) == np.uint32(1 << 16))
            and np.all(np.asarray(lptr) == ends)
        ):
            raise ValueError(
                "corrupt or truncated rans16i stream (final-state check)"
            )

        content = jnp.asarray(plane)
        syn = jnp.asarray(syn_int, jnp.float32).reshape(b, 1, 1, -1)
        rec = self._synthesize(content, syn)
        return rec[:, :orig_h, :orig_w, :]

    # ------------------------------------------------------------- decode

    def decompress(self, data: bytes) -> jax.Array:
        off, orig_h, orig_w, syn16 = self._parse_header(data)
        if self.is_ns:
            h, w = padded_size(orig_h, orig_w, 64)
            # NS codes its syntax vector; the header field is empty
            return self._decompress_ns(data, off, orig_h, orig_w, h, w)
        # charm / entroformer: the batched path IS the single-image path
        return self.decompress_batch([data])
