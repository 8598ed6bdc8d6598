"""Real bitstream encode/decode for the ChARM codecs.

The reference never emits an actual bitstream (no ``.compress()`` call
anywhere; bpp is likelihood-estimated).  This module supplies the missing
capability for the decodable hyper paths ('classic_dual', 'elic'):

encode (ONE device pass + host rANS):
  x → g_a → z3; z → rANS (factorized CDFs); hyper-decode z_hat →
  per-slice (μ, σ) with the evolved y_hat supports → 4 slice blobs
  (conditional-Gaussian rANS over the scale table).

decode (sequential slice ping-pong, device ↔ host):
  z blob → z_hat → (scales, means); for each slice: device computes
  (μ, σ) from decoded slices, host rANS-decodes the residuals, device
  applies LRP; finally g_s + syntax conv → image.

The U-Net hyper ('unet') and latent U-Net ('latent_unet') models are NOT
decodable as designed — their entropy parameters consume encoder-side
activations (``net_unet_ha_hs.py:880,892``; ``Net_unet.py:1014``) — and are
rejected with an explanatory error.

neural_syntax family (the reference's ``model/net.py`` — it never wrote the
sequential decode its spatial context implies; SURVEY §7.8):
  the 4×4 causal context window of ``PredictionModel_Context`` reads rows
  p−3..p−1 (cols q−2..q+1) plus (p, q−2), (p, q−1), so every position on
  the anti-diagonal t = 2p + q depends only on strictly-earlier wavefronts.
  Decode runs T = 2(H−1)+W wavefronts; each step gathers the ≤P_max
  context patches on host, runs the per-position (μ, σ) head on device
  (one statically-shaped jitted call reused every step) and rANS-decodes
  that wavefront's symbols from ONE continuous stream (streaming decoder —
  no per-wavefront flush overhead).  The encoder drives the *identical*
  schedule/shapes so μ/σ match the decoder bit-for-bit.  z2 ints ride the
  learned per-channel N(0, σ_z2); the syntax vector rides
  ``PredictionModel_Syntax``'s (μ, σ) — both decodable from coded data.

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

    def __init__(self, model: CodecModel, params: Any, name: str = ""):
        cfg = model.cfg
        self.model = model
        # Pin params on device: checkpoint loaders return numpy leaves, and
        # passing those to the jitted sub-passes re-uploads the full tree
        # (~80 MB) on EVERY call — measured as the dominant codec cost.
        self.params = params = jax.device_put(params)
        self.is_ns = cfg.family == "neural_syntax"
        self.name = name or f"{cfg.family}.{cfg.transform}.{cfg.hyper}.{cfg.context}"
        if self.is_ns:
            self._init_neural_syntax()
            return
        if cfg.hyper not in _DECODABLE:
            raise ValueError(
                f"hyper path '{cfg.hyper}' is not decodable: the "
                "reference feeds encoder-side activations into its hyper "
                "decoder (see lic_tpu.models.compress docstring); use a "
                "'classic_dual' or 'elic' preset for real bitstreams (or "
                "the neural_syntax family's wavefront coder)"
            )

        ap = lambda method: partial(
            jax.jit(
                lambda p, *a: model.apply({"params": p}, *a, method=method)
            ),
            params,
        )
        self._analyze = ap(CodecModel.analyze)
        self._hyper_decode = ap(CodecModel.hyper_decode)
        self._syntax = ap(CodecModel.syntax_from_latent)
        self._synthesize = ap(CodecModel.synthesize)
        self.is_entro = model.cfg.context == "entroformer"
        if self.is_entro:
            self._entro = ap(CodecModel.entro_predict)
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

        def enc_step_impl(p, m, s, sup, y, i):
            mu, sigma, mean_support = eparams(p, m, s, sup, i)
            sym = jnp.clip(jnp.round(y - mu), -_SYM_CLIP, _SYM_CLIP)
            y_hat = model.apply(
                {"params": p}, mean_support, sym + mu, i,
                method=CodecModel.charm_apply_lrp,
            )
            return sym.astype(jnp.int16), _dev_scale_idx(sigma, tab), y_hat

        def dec_idx_impl(p, m, s, sup, i):
            # One entropy-params evaluation per slice: σ becomes the uint8
            # scale-table index (the only thing fetched to host); μ and the
            # mean support stay device-resident and feed the slim LRP-only
            # apply step — the params are NOT recomputed after the host
            # rANS decode.
            mu, sigma, mean_support = eparams(p, m, s, sup, i)
            return _dev_scale_idx(sigma, tab), mu, mean_support

        def dec_apply_impl(p, mean_support, mu, sym16, i):
            return model.apply(
                {"params": p}, mean_support, sym16.astype(jnp.float32) + mu, i,
                method=CodecModel.charm_apply_lrp,
            )

        self._z_enc = partial(jax.jit(z_enc_impl), params)
        self._z_dec = partial(jax.jit(z_dec_impl), params)
        self._enc_step, self._dec_idx, self._dec_apply = {}, {}, {}
        for i in range(0 if self.is_entro else cfg.num_slices):
            self._enc_step[i] = partial(
                jax.jit(partial(enc_step_impl, i=i)), params
            )
            self._dec_idx[i] = partial(
                jax.jit(partial(dec_idx_impl, i=i)), params
            )
            self._dec_apply[i] = partial(
                jax.jit(partial(dec_apply_impl, i=i)), params
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

        # ---- device-resident wavefront step -------------------------
        # ONE jitted step drives both encode and decode (bit-identity by
        # construction): scatter the previous group's integer values into
        # the device-resident plane, gather the current group's 4×4 causal
        # patches ON DEVICE, run the prediction head, and emit the rounded
        # means + rANS row indexes (int32).  The encoder knows every value
        # upfront (y_int), so it dispatches all T steps back-to-back with
        # NO host fetch in the loop — wavefront encode collapses from
        # T≈2H'+W' round trips to one pipeline + one bulk fetch of the
        # (T, P, C) accumulators.  The decoder runs the same executable
        # but fetches the small (2, P, C) per-step output to drive the
        # host rANS between steps.
        tabm = jnp.asarray(self.mu_coder.scale_table, jnp.float32)
        nd = self.mu_coder.n_delta

        def ns_step_impl(
            p, ypad, acc, hpad, prev_r, prev_c, prev_vals, cur_r, cur_c, t
        ):
            ypad = ypad.at[prev_r, prev_c].set(prev_vals, mode="drop")
            ii = jnp.arange(4)
            rr = cur_r[:, None, None] + ii[None, :, None]     # (P, 4, 1)
            cc = cur_c[:, None, None] + ii[None, None, :] + 1  # (P, 1, 4)
            ypat = ypad[rr, cc]  # (P, 4, 4, Cy) — OOB rows clamp (garbage
            ypat = ypat.at[:, 3, 2:, :].set(0.0)  # rows are masked on host)
            hpat = hpad[rr, cc]
            mu, sg = self.model.apply(
                {"params": p},
                jnp.concatenate([ypat, hpat], axis=-1),
                method=CodecModel.ns_context_head,
            )
            mu_r = jnp.round(mu)
            si = jnp.clip(
                jnp.searchsorted(tabm, jnp.maximum(sg, tabm[0]) - 1e-9),
                0, tabm.shape[0] - 1,
            )
            dj = jnp.clip(jnp.floor((mu - mu_r + 0.5) * nd), 0, nd - 1)
            step_out = jnp.stack(
                [mu_r.astype(jnp.int32), (si * nd + dj).astype(jnp.int32)]
            )  # (2, P, C): [round(μ), rANS row index]
            acc = jax.lax.dynamic_update_index_in_dim(acc, step_out, t, 0)
            return ypad, acc, step_out

        self._ns_step = partial(
            jax.jit(ns_step_impl, donate_argnums=(1, 2)), params
        )
        self._ns_scatter = jax.jit(
            lambda ypad, r, c, v: ypad.at[r, c].set(v, mode="drop"),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------- encode

    def compress(self, x: jax.Array) -> bytes:
        """x: (1, H, W, 3) in [−1, 1] — any size; padded to /64 internally
        and the original size is carried in the header."""
        cfg = self.model.cfg
        b, h, w, _ = x.shape
        assert b == 1, "one image per bitstream"
        x, _ = pad_to_multiple(x, 64)
        if self.is_ns:
            return self._compress_ns(x, h, w)

        z3 = self._analyze(x)
        # symbols are rounded ON DEVICE so they match the jitted forward's
        # ste_round bit-for-bit (host numpy fp32 can round differently at
        # .5 boundaries); the decoder reconstructs z_hat/y_hat from the same
        # device functions, and only int16 symbols / uint8 scale indexes
        # cross the host link (see _dev_scale_idx).
        z_sym16, z_hat = self._z_enc(z3)
        z_blob = self.z_coder.encode_symbols(np.asarray(z_sym16))
        scales, means = self._hyper_decode(z_hat)

        if cfg.syntax != "none":
            syntax = np.asarray(self._syntax(z3))[0, 0, 0].astype(np.int16)
        else:
            syntax = np.zeros((0,), np.int16)

        if self.is_entro:
            blobs = self._compress_entro(z3, scales, means)
            return self._pack(h, w, syntax, z_blob, blobs)

        y_slices = jnp.split(z3, cfg.num_slices, axis=-1)
        supports: List[jax.Array] = []
        blobs: List[bytes] = []
        for i in range(cfg.num_slices):
            sup = supports[: cfg.max_support_slices] if cfg.max_support_slices >= 0 else supports
            sym16, idx, y_hat = self._enc_step[i](
                means, scales, tuple(sup), y_slices[i]
            )
            blobs.append(
                self.y_coder.encode_indexed(np.asarray(sym16), np.asarray(idx))
            )
            supports.append(y_hat)

        return self._pack(h, w, syntax, z_blob, blobs)

    def _pack(self, h, w, syntax, z_blob, blobs) -> bytes:
        out = bytearray()
        out += MAGIC
        name = self.name.encode("utf-8")[:255]
        out += struct.pack("<B", len(name))
        out += name
        out += struct.pack("<I", self.digest)
        out += struct.pack("<HH", h, w)
        out += struct.pack("<H", syntax.size)
        out += syntax.tobytes()
        out += struct.pack("<I", len(z_blob))
        out += z_blob
        for blob in blobs:
            out += struct.pack("<I", len(blob))
            out += blob
        return bytes(out)

    # --------------------------- batched + host-overlapped codec path

    def compress_batch(self, xs: jax.Array) -> List[bytes]:
        """Compress B same-sized images through ONE batched device pipeline.

        Device work (transforms, hyper, slice μ/σ) runs batched — one
        dispatch per stage instead of per image — and the host rANS encodes
        are submitted to a worker thread as soon as each slice's symbols
        land, overlapping entropy coding with the remaining device compute
        (SURVEY §7.8 "pipelined host coding").
        """
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.model.cfg
        assert not self.is_ns and not self.is_entro, (
            "batched path covers the charm slice models"
        )
        b, h, w, _ = xs.shape
        xs, _ = pad_to_multiple(xs, 64)

        z3 = self._analyze(xs)
        z_sym16, z_hat = self._z_enc(z3)
        scales, means = self._hyper_decode(z_hat)
        if cfg.syntax != "none":
            syntax_dev = self._syntax(z3)

        # dispatch ALL slice steps before any host fetch — device compute
        # and the (bandwidth-bound) int16/uint8 fetches overlap
        y_slices = jnp.split(z3, cfg.num_slices, axis=-1)
        supports: List[jax.Array] = []
        steps = []
        for si in range(cfg.num_slices):
            sup = (
                supports[: cfg.max_support_slices]
                if cfg.max_support_slices >= 0
                else supports
            )
            sym16, idx, y_hat = self._enc_step[si](
                means, scales, tuple(sup), y_slices[si]
            )
            steps.append((sym16, idx))
            supports.append(y_hat)

        if cfg.syntax != "none":
            syntax = np.asarray(syntax_dev)[:, 0, 0].astype(np.int16)
        else:
            syntax = np.zeros((b, 0), np.int16)

        with ThreadPoolExecutor(max_workers=1) as pool:
            z_sym = np.asarray(z_sym16)
            z_jobs = [
                pool.submit(self.z_coder.encode_symbols, z_sym[i : i + 1])
                for i in range(b)
            ]
            slice_jobs = [[] for _ in range(b)]
            for sym16, idx in steps:
                sym_np, idx_np = np.asarray(sym16), np.asarray(idx)
                for i in range(b):
                    slice_jobs[i].append(
                        pool.submit(
                            self.y_coder.encode_indexed,
                            sym_np[i : i + 1], idx_np[i : i + 1],
                        )
                    )

            return [
                self._pack(
                    h, w, syntax[i], z_jobs[i].result(),
                    [f.result() for f in slice_jobs[i]],
                )
                for i in range(b)
            ]

    def decompress_batch(self, blobs: List[bytes]) -> jax.Array:
        """Decode B same-sized bitstreams through batched device passes.

        The slice ping-pong is inherently sequential (slice i's μ/σ need
        decoded slices < i) but batching across images amortizes every
        device dispatch B-fold; host rANS decodes run between device steps.
        """
        cfg = self.model.cfg
        b = len(blobs)
        heads = [self._parse_header(d) for d in blobs]
        orig_h, orig_w = heads[0][1], heads[0][2]
        assert all(
            (hh[1], hh[2]) == (orig_h, orig_w) for hh in heads
        ), "decompress_batch needs same-sized bitstreams"
        h, w = padded_size(orig_h, orig_w, 64)

        z_shape = (1, h // 64, w // 64, self.z_coder.medians.shape[0])
        z_syms, syns, offs = [], [], []
        for data, hd in zip(blobs, heads):
            off = hd[0]
            syn = hd[3]
            (z_len,) = struct.unpack_from("<I", data, off)
            off += 4
            z_blob = data[off : off + z_len]
            off += z_len
            z_syms.append(self.z_coder.decode_symbols(z_blob, z_shape))
            syns.append(syn)
            offs.append(off)
        z_hat = self._z_dec(
            jnp.asarray(np.concatenate(z_syms, axis=0).astype(np.int16))
        )
        scales, means = self._hyper_decode(z_hat)

        supports: List[jax.Array] = []
        for si in range(cfg.num_slices):
            sup = (
                supports[: cfg.max_support_slices]
                if cfg.max_support_slices >= 0
                else supports
            )
            idx_dev, mu, msup = self._dec_idx[si](means, scales, tuple(sup))
            idx = np.asarray(idx_dev)
            syms = []
            for i in range(b):
                (blen,) = struct.unpack_from("<I", blobs[i], offs[i])
                offs[i] += 4
                blob = blobs[i][offs[i] : offs[i] + blen]
                offs[i] += blen
                syms.append(
                    self.y_coder.decode_indexed(blob, idx[i : i + 1])
                )
            y_hat = self._dec_apply[si](
                msup, mu, jnp.asarray(np.concatenate(syms).astype(np.int16))
            )
            supports.append(y_hat)

        y_full = jnp.concatenate(supports, axis=-1)
        m_len = syns[0].size
        syn = (
            jnp.asarray(np.stack(syns).astype(np.float32)).reshape(b, 1, 1, -1)
            if m_len
            else None
        )
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

    def _ns_wavefront(self, h2_np, y_int=None, stream=None):
        """Run the wavefront schedule over the content latent on DEVICE.

        Encode mode (``y_int`` given): all T steps are dispatched
        back-to-back (the values scattered into the context plane come
        from the known ``y_int``, so nothing in the loop waits on a
        fetch); one bulk fetch of the (T, 2, P, C) accumulator yields
        every group's rounded means and rANS row indexes.  Decode mode
        (``stream`` given): the same jitted step runs once per group —
        the only host work between steps is the rANS decode of that
        group's symbols.  Both modes execute the *identical* executable
        on identical inputs, so μ/σ (and hence the coded indexes) agree
        bit-for-bit between encoder and decoder by construction.

        Returns ``(mu_round, idx, y_all, plane)`` where ``mu_round``/
        ``idx`` are int32 arrays flattened in wavefront order.
        """
        cfg = self.model.cfg
        c = cfg.N - cfg.M
        hy, wy = h2_np.shape[0], h2_np.shape[1]
        groups = wavefront_groups(hy, wy)
        T = len(groups)
        p_max = max(len(g[0]) for g in groups)
        OOB = -(10 ** 6)  # padded scatter rows: dropped (mode='drop')

        def pad_rc(a):
            return np.pad(
                a.astype(np.int32) + 3, (0, p_max - len(a)),
                constant_values=OOB,
            )

        cur_rs = [pad_rc(ps) for ps, _ in groups]
        cur_cs = [pad_rc(qs) for _, qs in groups]

        hpad = jnp.asarray(
            np.pad(h2_np, ((3, 3), (3, 3), (0, 0))).astype(np.float32)
        )
        ypad = jnp.zeros((hy + 6, wy + 6, c), jnp.float32)
        acc = jnp.zeros((T, 2, p_max, c), jnp.int32)

        zero_rc = np.full((p_max,), OOB, np.int32)
        zero_vals = np.zeros((p_max, c), np.float32)

        def vals_of(t, decoded):
            ps, qs = groups[t]
            v = (
                y_int[ps, qs, :].astype(np.float32)
                if y_int is not None
                else decoded
            )
            return np.pad(v, ((0, p_max - len(ps)), (0, 0)))

        ints = []
        prev_vals = None
        for t in range(T):
            ypad, acc, step_out = self._ns_step(
                ypad, acc, hpad,
                zero_rc if t == 0 else cur_rs[t - 1],
                zero_rc if t == 0 else cur_cs[t - 1],
                zero_vals if t == 0 else prev_vals,
                cur_rs[t], cur_cs[t], t,
            )
            n = len(groups[t][0])
            if stream is not None:
                out = np.asarray(step_out)  # (2, P, C) — the step's fetch
                sym = stream.decode(out[1, :n].astype(np.int32))
                vals = sym.reshape(n, c) + out[0, :n]
                ints.append(vals)
                prev_vals = vals_of(t, vals.astype(np.float32))
            else:
                ints.append(y_int[groups[t][0], groups[t][1], :])
                prev_vals = vals_of(t, None)
        # final group's values enter the plane here (decode needs them)
        ypad = self._ns_scatter(ypad, cur_rs[-1], cur_cs[-1], prev_vals)

        out_all = np.asarray(acc)  # encode: the single bulk fetch
        mu_all = np.concatenate(
            [out_all[t, 0, : len(ps)] for t, (ps, _) in enumerate(groups)]
        )
        idx_all = np.concatenate(
            [out_all[t, 1, : len(ps)] for t, (ps, _) in enumerate(groups)]
        )
        y_all = np.concatenate(ints, axis=0)
        plane = np.asarray(ypad)[3 : 3 + hy, 3 : 3 + wy, :]
        return mu_all, idx_all, y_all, plane

    def _compress_ns(self, x: jax.Array, h: int, w: int) -> bytes:
        cfg = self.model.cfg
        z3 = self._analyze(x)
        z2 = self._ns_ha(z3)
        z2_int = np.asarray(jnp.round(z2)).astype(np.int32)
        scales_z2 = np.broadcast_to(self.z2_sigma, z2_int.shape)
        blob_z2 = self.z2_coder.encode_symbols(z2_int, scales_z2)

        h2 = self._ns_hs(jnp.asarray(z2_int, jnp.float32))
        syn_int = np.asarray(self._ns_syntax_vec(z3)).astype(np.int32)
        mu_s, sg_s = self._ns_syntax_params(h2)
        blob_syn = self.mu_coder.encode_ints(
            syn_int.reshape(-1),
            np.asarray(mu_s, np.float32).reshape(-1),
            np.asarray(sg_s, np.float32).reshape(-1),
        )

        content = z3[..., cfg.M :]
        y_int = np.asarray(jnp.round(content)).astype(np.int32)[0]
        mu_round, idx_all, y_all, _ = self._ns_wavefront(
            np.asarray(h2, np.float32)[0], y_int=y_int
        )
        blob_y = self.mu_coder.codec.encode(
            (y_all.astype(np.int64) - mu_round).astype(np.int32), idx_all
        )

        return self._pack(
            h, w, np.zeros((0,), np.int16), blob_z2, [blob_syn, blob_y]
        )

    def _decompress_ns(self, data, off, orig_h, orig_w, h, w):
        cfg = self.model.cfg
        (z_len,) = struct.unpack_from("<I", data, off)
        off += 4
        z_blob = data[off : off + z_len]
        off += z_len
        z_shape = (1, h // 64, w // 64, cfg.N)
        scales_z2 = np.broadcast_to(self.z2_sigma, z_shape)
        z2_int = (
            self.z2_coder.codec.decode(
                z_blob, self.z2_coder.scale_indexes(scales_z2)
            )
            .reshape(z_shape)
            .astype(np.float32)
        )
        h2 = self._ns_hs(jnp.asarray(z2_int))

        (s_len,) = struct.unpack_from("<I", data, off)
        off += 4
        s_blob = data[off : off + s_len]
        off += s_len
        mu_s, sg_s = self._ns_syntax_params(h2)
        syn_int = self.mu_coder.decode_ints(
            s_blob,
            np.asarray(mu_s, np.float32).reshape(-1),
            np.asarray(sg_s, np.float32).reshape(-1),
        )

        (y_len,) = struct.unpack_from("<I", data, off)
        off += 4
        y_blob = data[off : off + y_len]
        stream = self.mu_coder.codec.stream_decoder(y_blob)
        _, _, _, plane = self._ns_wavefront(
            np.asarray(h2, np.float32)[0], stream=stream
        )
        stream.finish()

        content = jnp.asarray(plane[None], jnp.float32)
        syn = jnp.asarray(syn_int, jnp.float32).reshape(1, 1, 1, -1)
        rec = self._synthesize(content, syn)
        return rec[:, :orig_h, :orig_w, :]

    # --------------------------------------- entroformer (2-pass) coding

    def _anchor_mask(self, yh, yw, c):
        from ..layers.entroformer import checkerboard_masks

        anchor, _ = checkerboard_masks(yh, yw)
        return np.broadcast_to(anchor[None, :, :, None], (1, yh, yw, c))

    def _compress_entro(self, z3, scales, means) -> List[bytes]:
        _, yh, yw, c = z3.shape
        mask = self._anchor_mask(yh, yw, c)

        mu1, s1 = self._entro(jnp.zeros_like(z3), scales, means)
        sym1 = np.asarray(jnp.round(z3 - mu1)).astype(np.int32)
        blob1 = self.y_coder.encode_symbols(
            sym1[mask], np.asarray(s1)[mask]
        )
        y_hat1 = jnp.asarray(
            (sym1.astype(np.float32) + np.asarray(mu1)) * mask
        )

        mu2, s2 = self._entro(y_hat1, scales, means)
        sym2 = np.asarray(jnp.round(z3 - mu2)).astype(np.int32)
        blob2 = self.y_coder.encode_symbols(
            sym2[~mask], np.asarray(s2)[~mask]
        )
        return [blob1, blob2]

    def _decompress_entro(self, data, off, z_hat, syntax, h, w):
        scales, means = self._hyper_decode(z_hat)
        c = self.model.cfg.N
        yh, yw = h // 16, w // 16
        mask = self._anchor_mask(yh, yw, c)

        (b1,) = struct.unpack_from("<I", data, off)
        off += 4
        blob1 = data[off : off + b1]
        off += b1
        (b2,) = struct.unpack_from("<I", data, off)
        off += 4
        blob2 = data[off : off + b2]

        mu1, s1 = self._entro(
            jnp.zeros((1, yh, yw, c), jnp.float32), scales, means
        )
        sym1 = self.y_coder.codec.decode(
            blob1, self.y_coder.scale_indexes(np.asarray(s1)[mask])
        )
        y1 = np.zeros((1, yh, yw, c), np.float32)
        y1[mask] = sym1.astype(np.float32) + np.asarray(mu1)[mask]
        y_hat1 = jnp.asarray(y1)

        mu2, s2 = self._entro(y_hat1, scales, means)
        sym2 = self.y_coder.codec.decode(
            blob2, self.y_coder.scale_indexes(np.asarray(s2)[~mask])
        )
        y_full = np.asarray(y1)
        y_full[~mask] = sym2.astype(np.float32) + np.asarray(mu2)[~mask]

        syn = (
            jnp.asarray(syntax).reshape(1, 1, 1, -1) if syntax.size else None
        )
        return self._synthesize(jnp.asarray(y_full), syn)

    # ------------------------------------------------------------- decode

    def decompress(self, data: bytes) -> jax.Array:
        cfg = self.model.cfg
        off, orig_h, orig_w, syn16 = self._parse_header(data)
        h, w = padded_size(orig_h, orig_w, 64)
        if self.is_ns:
            # NS codes its syntax vector; the header field is empty
            return self._decompress_ns(data, off, orig_h, orig_w, h, w)
        m_len = syn16.size
        syntax = syn16.astype(np.float32)
        (z_len,) = struct.unpack_from("<I", data, off)
        off += 4
        z_blob = data[off : off + z_len]
        off += z_len

        zh, zw = h // 64, w // 64  # z is at /64 of the input
        z_shape = (1, zh, zw, self.z_coder.medians.shape[0])
        z_sym = self.z_coder.decode_symbols(z_blob, z_shape)
        z_hat = self._z_dec(jnp.asarray(z_sym.astype(np.int16)))
        if self.is_entro:
            rec = self._decompress_entro(data, off, z_hat, syntax, h, w)
            return rec[:, :orig_h, :orig_w, :]
        scales, means = self._hyper_decode(z_hat)

        supports: List[jax.Array] = []
        for i in range(cfg.num_slices):
            (blen,) = struct.unpack_from("<I", data, off)
            off += 4
            blob = data[off : off + blen]
            off += blen
            sup = supports[: cfg.max_support_slices] if cfg.max_support_slices >= 0 else supports
            idx_dev, mu, msup = self._dec_idx[i](means, scales, tuple(sup))
            sym = self.y_coder.decode_indexed(blob, np.asarray(idx_dev))
            y_hat = self._dec_apply[i](
                msup, mu, jnp.asarray(sym.astype(np.int16))
            )
            supports.append(y_hat)

        y_hat_full = jnp.concatenate(supports, axis=-1)
        syn = (
            jnp.asarray(syntax).reshape(1, 1, 1, -1) if m_len else None
        )
        return self._synthesize(y_hat_full, syn)[:, :orig_h, :orig_w, :]
