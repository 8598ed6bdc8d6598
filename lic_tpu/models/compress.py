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

Bitstream layout (little-endian):
  magic 'LTC1' | u8 preset-id-len + name | u16 H | u16 W | i16 syntax[M]
  | u32 z_len | z blob | per slice: u32 len | blob
"""

from __future__ import annotations

import struct
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.codec import FactorizedCoder, GaussianCoder
from .codec import CodecModel

MAGIC = b"LTC1"
Z_RANGE = 128  # factorized-prior symbol support: [-128, 127] rel. medians

_DECODABLE = ("classic_dual", "elic")


class ChannelCoder:
    """Owns the jitted sub-passes + rANS coders for one (model, params)."""

    def __init__(self, model: CodecModel, params: Any):
        if model.cfg.hyper not in _DECODABLE:
            raise ValueError(
                f"hyper path '{model.cfg.hyper}' is not decodable: the "
                "reference feeds encoder-side activations into its hyper "
                "decoder (see lic_tpu.models.compress docstring); use a "
                "'classic_dual' or 'elic' preset for real bitstreams"
            )
        if model.cfg.family != "charm":
            raise ValueError(
                "bitstream pipeline currently covers the charm family; the "
                "neural_syntax spatial-context model requires position-"
                "sequential decoding (future work)"
            )
        self.model = model
        self.params = params

        ap = lambda method: partial(
            jax.jit(
                lambda p, *a: model.apply({"params": p}, *a, method=method)
            ),
            params,
        )
        self._analyze = ap(CodecModel.analyze)
        self._hyper_encode = ap(CodecModel.hyper_encode)
        self._hyper_decode = ap(CodecModel.hyper_decode)
        self._syntax = ap(CodecModel.syntax_from_latent)
        self._synthesize = ap(CodecModel.synthesize)
        self._entropy_params = {}
        self._lrp = {}
        for i in range(model.cfg.num_slices):
            self._entropy_params[i] = partial(
                jax.jit(
                    lambda p, m, s, sup, i=i: model.apply(
                        {"params": p}, m, s, sup, i,
                        method=CodecModel.charm_entropy_params,
                    )
                ),
                params,
            )
            self._lrp[i] = partial(
                jax.jit(
                    lambda p, ms, yh, i=i: model.apply(
                        {"params": p}, ms, yh, i,
                        method=CodecModel.charm_apply_lrp,
                    )
                ),
                params,
            )

        medians = model.apply({"params": params}, method=CodecModel.eb_medians)
        pmf = model.apply(
            {"params": params}, -Z_RANGE, Z_RANGE - 1,
            method=CodecModel.eb_pmf_table,
        )
        self.z_coder = FactorizedCoder(
            np.asarray(pmf), np.asarray(medians), -Z_RANGE
        )
        self.y_coder = GaussianCoder()

    # ------------------------------------------------------------- encode

    def compress(self, x: jax.Array) -> bytes:
        """x: (1, H, W, 3) in [−1, 1], H/W multiples of 64."""
        cfg = self.model.cfg
        b, h, w, _ = x.shape
        assert b == 1, "one image per bitstream"

        z3 = self._analyze(x)
        z = np.asarray(self._hyper_encode(z3))
        z_blob = self.z_coder.encode(z)
        z_hat = jnp.asarray(
            np.round(z - self.z_coder.medians) + self.z_coder.medians
        )
        scales, means = self._hyper_decode(z_hat)

        if cfg.syntax != "none":
            syntax = np.asarray(self._syntax(z3))[0, 0, 0].astype(np.int16)
        else:
            syntax = np.zeros((0,), np.int16)

        y_slices = np.split(np.asarray(z3), cfg.num_slices, axis=-1)
        supports: List[jax.Array] = []
        blobs: List[bytes] = []
        for i in range(cfg.num_slices):
            sup = supports[: cfg.max_support_slices] if cfg.max_support_slices >= 0 else supports
            mu, sigma, mean_support = self._entropy_params[i](
                means, scales, tuple(sup)
            )
            mu_np = np.asarray(mu)
            blobs.append(
                self.y_coder.encode(y_slices[i], mu_np, np.asarray(sigma))
            )
            symbols = np.round(y_slices[i] - mu_np)
            y_hat = jnp.asarray(symbols + mu_np, jnp.float32)
            y_hat = self._lrp[i](mean_support, y_hat)
            supports.append(y_hat)

        out = bytearray()
        out += MAGIC
        out += struct.pack("<HH", h, w)
        out += struct.pack("<H", syntax.size)
        out += syntax.tobytes()
        out += struct.pack("<I", len(z_blob))
        out += z_blob
        for blob in blobs:
            out += struct.pack("<I", len(blob))
            out += blob
        return bytes(out)

    # ------------------------------------------------------------- decode

    def decompress(self, data: bytes) -> jax.Array:
        cfg = self.model.cfg
        off = 0
        assert data[:4] == MAGIC, "bad magic"
        off = 4
        h, w = struct.unpack_from("<HH", data, off)
        off += 4
        (m_len,) = struct.unpack_from("<H", data, off)
        off += 2
        syntax = np.frombuffer(data, np.int16, m_len, off).astype(np.float32)
        off += m_len * 2
        (z_len,) = struct.unpack_from("<I", data, off)
        off += 4
        z_blob = data[off : off + z_len]
        off += z_len

        zh, zw = h // 64, w // 64  # z is at /64 of the input
        z_shape = (1, zh, zw, self.z_coder.medians.shape[0])
        z_hat = jnp.asarray(self.z_coder.decode(z_blob, z_shape))
        scales, means = self._hyper_decode(z_hat)

        supports: List[jax.Array] = []
        for i in range(cfg.num_slices):
            (blen,) = struct.unpack_from("<I", data, off)
            off += 4
            blob = data[off : off + blen]
            off += blen
            sup = supports[: cfg.max_support_slices] if cfg.max_support_slices >= 0 else supports
            mu, sigma, mean_support = self._entropy_params[i](
                means, scales, tuple(sup)
            )
            y_hat = self.y_coder.decode(blob, np.asarray(mu), np.asarray(sigma))
            y_hat = self._lrp[i](mean_support, jnp.asarray(y_hat, jnp.float32))
            supports.append(y_hat)

        y_hat_full = jnp.concatenate(supports, axis=-1)
        syn = (
            jnp.asarray(syntax).reshape(1, 1, 1, -1) if m_len else None
        )
        return self._synthesize(y_hat_full, syn)
