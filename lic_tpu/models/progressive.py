"""Progressive (scalable) bitstreams for the ChARM slice family.

Wires ``lic_tpu.coding.tritplane.TritPlaneCoder`` to a trained model —
the capability the reference's standalone ``model/Trit_Plane.py:25-95``
script gestures at (BASELINE.json config #5): ONE encoded stream that
decodes at MANY rate points.

Scheme (slice-major trit planes):

* the hyper stream z is the always-present base layer (factorized-prior
  rANS, identical to ``ChannelCoder``'s z path);
* each ChARM slice's integer residuals ``r_i = round(y_i − μ_i)`` are
  written in balanced ternary, MSB plane first, one rANS blob per plane;
* the stream orders blobs slice-major: slice 0's planes, then slice 1's…

Truncating after ANY plane boundary decodes consistently:

* fully-received slices reproduce the encoder's ŷ exactly, so the next
  slice's μ (which conditions on decoded slices) matches the encoder;
* the partially-received slice fills missing LSB digits with their
  midpoint (0 in balanced ternary) — its ŷ degrades gracefully;
* slices after the cut received nothing: their ŷ = μ + LRP, where μ is
  computed from the decoded prefix — deterministic on both sides (a cut
  inside slice i means slices > i consumed zero stream data, so encoder/
  decoder never need to agree on their reconstructions mid-stream).

Rate overhead vs the non-progressive coder comes from the per-plane
static frequency tables standing in for the per-element Gaussian model —
the price of scalability (DPICT, CVPR'22, models per-digit probabilities
from σ; a future refinement).
"""

from __future__ import annotations

import struct
from functools import partial
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import zlib

from ..coding.codec import FactorizedCoder
from ..coding.tritplane import (
    GaussianTritCoder,
    TritPlaneCoder,
    num_planes_for,
)
from ..data.pad import pad_to_multiple
from .codec import CodecModel
from .compress import _DECODABLE, Z_RANGE

MAGIC_P = b"LTCP"


class ProgressiveCoder:
    """Scalable multi-rate bitstream over a trained ChARM model."""

    def __init__(
        self,
        model: CodecModel,
        params: Any,
        name: str = "",
        digit_model: str = "gaussian",
    ):
        cfg = model.cfg
        if cfg.family != "charm" or cfg.context == "entroformer":
            raise ValueError("progressive coding covers the ChARM slice family")
        if cfg.hyper not in _DECODABLE:
            raise ValueError(
                f"hyper path '{cfg.hyper}' is not decodable (see "
                "lic_tpu.models.compress); progressive streams need a "
                "decodable base layer"
            )
        self.model = model
        self.params = params = jax.device_put(params)
        self.name = (name or cfg.family) + "+prog"

        ap = lambda method: partial(
            jax.jit(lambda p, *a: model.apply({"params": p}, *a, method=method)),
            params,
        )
        self._analyze = ap(CodecModel.analyze)
        self._syntax = ap(CodecModel.syntax_from_latent)
        self._hyper_decode = ap(CodecModel.hyper_decode)
        # the slice index selects modules — it must be STATIC under jit
        self._eparams = partial(
            jax.jit(
                lambda p, m, s, sup, i: model.apply(
                    {"params": p}, m, s, sup, i,
                    method=CodecModel.charm_entropy_params,
                ),
                static_argnums=(4,),
            ),
            params,
        )
        self._lrp = partial(
            jax.jit(
                lambda p, msup, y, i: model.apply(
                    {"params": p}, msup, y, i,
                    method=CodecModel.charm_apply_lrp,
                ),
                static_argnums=(3,),
            ),
            params,
        )
        self._synthesize = ap(CodecModel.synthesize)

        medians = model.apply({"params": params}, method=CodecModel.eb_medians)
        pmf = model.apply(
            {"params": params}, -Z_RANGE, Z_RANGE - 1,
            method=CodecModel.eb_pmf_table,
        )
        self.z_coder = FactorizedCoder(
            np.asarray(pmf), np.asarray(medians), -Z_RANGE
        )
        self.digest = zlib.crc32(self.z_coder.codec.cdfs.tobytes()) & 0xFFFFFFFF
        med = jnp.asarray(np.asarray(medians), jnp.float32)

        def z_enc_impl(p, z3):
            z = model.apply({"params": p}, z3, method=CodecModel.hyper_encode)
            sym = jnp.round(z - med)
            return sym.astype(jnp.int16), sym + med

        self._z_enc = partial(jax.jit(z_enc_impl), params)
        self._z_dec = jax.jit(lambda s16: s16.astype(jnp.float32) + med)
        # 'gaussian' = DPICT-style per-element digit models from the σ both
        # ends already know (34% plane-payload reduction measured on
        # synthetic N(0,σ) residuals); 'static' = per-plane tables.
        if digit_model not in ("static", "gaussian"):
            raise ValueError(f"unknown digit_model {digit_model!r}")
        self.digit_model = digit_model
        self.trit = TritPlaneCoder()
        self.gauss = GaussianTritCoder() if digit_model == "gaussian" else None

    # ----------------------------------------------------------- encode

    def compress(self, x: jax.Array) -> bytes:
        """x: (1, H, W, 3) in [−1, 1] → progressive container."""
        cfg = self.model.cfg
        b, h, w, _ = x.shape
        assert b == 1, "one image per bitstream"
        x, _ = pad_to_multiple(x, 64)

        z3 = self._analyze(x, None)
        z_sym16, z_hat = self._z_enc(z3)
        z_blob = self.z_coder.encode_symbols(np.asarray(z_sym16))
        if cfg.syntax != "none":
            syntax = np.asarray(self._syntax(z3))[0, 0, 0].astype(np.int16)
        else:
            syntax = np.zeros((0,), np.int16)

        scales, means = self._hyper_decode(z_hat)
        y_slices = jnp.split(z3, cfg.num_slices, axis=-1)
        supports: List[jax.Array] = []
        slice_blobs: List[List[bytes]] = []
        for i in range(cfg.num_slices):
            sup = (
                supports[: cfg.max_support_slices]
                if cfg.max_support_slices >= 0
                else supports
            )
            mu, sigma, msup = self._eparams(means, scales, tuple(sup), i)
            sym = np.asarray(jnp.round(y_slices[i] - mu)).astype(np.int64)
            k = num_planes_for(int(np.abs(sym).max(initial=1)))
            if self.digit_model == "gaussian":
                sg = np.maximum(np.asarray(sigma, np.float64), 0.04)
                slice_blobs.append(
                    self.gauss.encode(sym.reshape(-1), sg.reshape(-1), k)
                )
            else:
                slice_blobs.append(self.trit.encode(sym.reshape(-1), k))
            y_hat = self._lrp(
                msup, jnp.asarray(sym, jnp.float32).reshape(mu.shape) + mu, i
            )
            supports.append(y_hat)

        return self._pack(h, w, syntax, z_blob, slice_blobs)

    def _pack(self, h, w, syntax, z_blob, slice_blobs) -> bytes:
        out = bytearray()
        out += MAGIC_P
        name = self.name.encode("utf-8")[:255]
        out += struct.pack("<B", len(name))
        out += name
        out += struct.pack("<I", self.digest)
        out += struct.pack("<B", 1 if self.digit_model == "gaussian" else 0)
        out += struct.pack("<HH", h, w)
        out += struct.pack("<H", syntax.size)
        out += syntax.astype("<i2").tobytes()
        out += struct.pack("<I", len(z_blob))
        out += z_blob
        out += struct.pack("<B", len(slice_blobs))
        for planes in slice_blobs:
            out += struct.pack("<B", len(planes))
            for blob in planes:
                out += struct.pack("<I", len(blob))
                out += blob
        return bytes(out)

    # ----------------------------------------------------------- decode

    def parse(self, data: bytes):
        """→ (h, w, syntax, z_blob, [[plane blobs]…], base_bytes) where
        ``base_bytes`` counts everything except the plane payloads."""
        if data[:4] != MAGIC_P:
            raise ValueError("bad magic — not an LTCP progressive bitstream")
        off = 4
        (nlen,) = struct.unpack_from("<B", data, off)
        off += 1
        name = data[off : off + nlen].decode("utf-8")
        off += nlen
        (digest,) = struct.unpack_from("<I", data, off)
        off += 4
        if name != self.name:
            raise ValueError(f"bitstream for '{name}', coder is '{self.name}'")
        if digest != self.digest:
            raise ValueError("weights digest mismatch")
        (dm,) = struct.unpack_from("<B", data, off)
        off += 1
        want = 1 if self.digit_model == "gaussian" else 0
        if dm != want:
            raise ValueError(
                f"bitstream digit model {dm} != coder digit model {want}"
            )
        h, w = struct.unpack_from("<HH", data, off)
        off += 4
        (m,) = struct.unpack_from("<H", data, off)
        off += 2
        syntax = np.frombuffer(data, "<i2", count=m, offset=off).copy()
        off += 2 * m
        (zl,) = struct.unpack_from("<I", data, off)
        off += 4
        z_blob = data[off : off + zl]
        off += zl
        (ns,) = struct.unpack_from("<B", data, off)
        off += 1
        base_bytes = off
        slice_blobs = []
        for _ in range(ns):
            (k,) = struct.unpack_from("<B", data, off)
            off += 1
            base_bytes += 1
            planes = []
            for _ in range(k):
                (bl,) = struct.unpack_from("<I", data, off)
                off += 4
                planes.append(data[off : off + bl])
                off += bl
                base_bytes += 4
            slice_blobs.append(planes)
        return h, w, syntax, z_blob, slice_blobs, base_bytes

    def truncation_points(self, data: bytes) -> List[Tuple[int, int]]:
        """All (planes_total, payload_bytes_used) prefixes, plane-granular,
        slice-major — the x-axis of the RD staircase."""
        _, _, _, _, slice_blobs, base = self.parse(data)
        pts, used, n = [(0, base)], base, 0
        for planes in slice_blobs:
            for blob in planes:
                used += len(blob)
                n += 1
                pts.append((n, used))
        return pts

    def decompress(
        self, data: bytes, max_planes: Optional[int] = None
    ) -> jax.Array:
        """Decode using at most ``max_planes`` plane blobs (slice-major
        count; None = all). Every prefix is a valid reconstruction."""
        cfg = self.model.cfg
        h, w, syntax, z_blob, slice_blobs, _ = self.parse(data)
        hp = -(-h // 64) * 64
        wp = -(-w // 64) * 64
        hy, wy = hp // 16, wp // 16
        per_ch = cfg.N // cfg.num_slices

        z_sym = self.z_coder.decode_symbols(
            z_blob, (1, hy // 4, wy // 4, cfg.N)
        )
        z_hat = self._z_dec(jnp.asarray(z_sym, jnp.int16))
        scales, means = self._hyper_decode(z_hat)

        budget = max_planes if max_planes is not None else sum(
            len(p) for p in slice_blobs
        )
        supports: List[jax.Array] = []
        for i in range(cfg.num_slices):
            sup = (
                supports[: cfg.max_support_slices]
                if cfg.max_support_slices >= 0
                else supports
            )
            mu, sigma, msup = self._eparams(means, scales, tuple(sup), i)
            planes = slice_blobs[i]
            k = len(planes)
            take = max(0, min(k, budget))
            budget -= take
            n = hy * wy * per_ch
            if self.digit_model == "gaussian":
                sg = np.maximum(np.asarray(sigma, np.float64), 0.04)
                sym = self.gauss.decode(planes[:take], n, sg.reshape(-1), k)
            else:
                sym = self.trit.decode(planes[:take], n, k)
            y_hat = self._lrp(
                msup,
                jnp.asarray(sym, jnp.float32).reshape(mu.shape) + mu,
                i,
            )
            supports.append(y_hat)

        y_full = jnp.concatenate(supports, axis=-1)
        syn = (
            jnp.asarray(syntax.astype(np.float32)).reshape(1, 1, 1, -1)
            if syntax.size
            else None
        )
        rec = self._synthesize(y_full, syn)
        return rec[:, :h, :w, :]
