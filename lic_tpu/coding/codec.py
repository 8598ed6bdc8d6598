"""Bitstream primitives on top of the rANS core.

``CodecCoder`` owns the quantized-CDF tables for the two entropy-model
kinds the codecs use and exposes symbol-level encode/decode:

* factorized prior  — one CDF row per channel, from
  ``EntropyBottleneck.pmf_table`` (device) quantized on host;
* conditional Gaussian — one CDF row per entry of a 64-point log-spaced
  scale table (the standard CompressAI ``get_scale_table`` grid, 0.11..256),
  symbols coded as ``round(y − μ)`` with per-position scale indexes.

The full model-level ``compress()``/``decompress()`` pipelines (including
the sequential ChARM slice decode) live in ``lic_tpu.models.compress``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from .rans import RansCodec, pmf_to_quantized_cdf

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(
    smin: float = SCALES_MIN, smax: float = SCALES_MAX, levels: int = SCALES_LEVELS
) -> np.ndarray:
    """Log-spaced scale grid (CompressAI-standard)."""
    return np.exp(np.linspace(math.log(smin), math.log(smax), levels))


try:
    from scipy.special import erf as _erf
except ImportError:  # scipy-less host: vectorize math.erf (exact, slower)
    _erf = np.vectorize(math.erf, otypes=[np.float64])


def _gaussian_pmf(scale: float, radius: int, mean: float = 0.0) -> np.ndarray:
    erf = _erf
    xs = np.arange(-radius, radius + 1, dtype=np.float64) - mean
    upper = 0.5 * (1 + erf((xs + 0.5) / (scale * math.sqrt(2))))
    lower = 0.5 * (1 + erf((xs - 0.5) / (scale * math.sqrt(2))))
    return np.maximum(upper - lower, 0.0)


def scale_table_indexes(table: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Index of the smallest table scale >= scale (lower-bounded) — the
    ONE host implementation; the device mirror is
    ``models.compress._dev_scale_idx`` and must stay bit-identical."""
    s = np.maximum(scales, table[0])
    return (
        np.searchsorted(table, s - 1e-9)
        .clip(0, len(table) - 1)
        .astype(np.int32)
    )


class GaussianCoder:
    """rANS coder over the scale-table grid for (y − μ) residuals."""

    def __init__(self, scale_table: Optional[np.ndarray] = None, radius: int = 64):
        self.scale_table = (
            np.asarray(scale_table) if scale_table is not None else get_scale_table()
        )
        self.radius = radius
        rows = []
        for s in self.scale_table:
            pmf = _gaussian_pmf(float(s), radius)
            # honest tail mass: do NOT renormalize the truncated pmf —
            # pmf_to_quantized_cdf assigns 1−Σpmf to the escape slot, so a
            # σ=64 row keeps its true ~31% out-of-range mass (~1.7 bits/
            # escape) instead of squeezing it into 1e-4 (~13 bits/escape).
            # The 0.9999 factor only guarantees a nonzero escape slot for
            # tiny σ (same construction as FactorizedCoder).
            rows.append(pmf_to_quantized_cdf(np.clip(pmf, 0.0, 1.0) * 0.9999))
        self.codec = RansCodec(
            np.stack(rows), np.full(len(rows), -radius, np.int32)
        )

    def scale_indexes(self, scales: np.ndarray) -> np.ndarray:
        """Index of the smallest table scale >= scale (lower-bounded)."""
        return scale_table_indexes(self.scale_table, scales)

    def encode(self, y: np.ndarray, means: np.ndarray, scales: np.ndarray) -> bytes:
        symbols = np.round(y - means).astype(np.int32)
        return self.codec.encode(symbols, self.scale_indexes(scales))

    def encode_symbols(self, symbols: np.ndarray, scales: np.ndarray) -> bytes:
        """Encode pre-computed integer residual symbols (e.g. rounded on
        device so they bit-match the jitted forward)."""
        return self.codec.encode(
            symbols.astype(np.int32), self.scale_indexes(scales)
        )

    def encode_indexed(self, symbols: np.ndarray, indexes: np.ndarray) -> bytes:
        """Encode with pre-computed scale-table indexes (computed on device
        so only small integer tensors cross the host link — the wire-
        efficient path; the decoder must derive identical indexes)."""
        return self.codec.encode(
            symbols.astype(np.int32), indexes.astype(np.int32)
        )

    def decode_indexed(self, data: bytes, indexes: np.ndarray) -> np.ndarray:
        """Decode to raw int32 symbols given pre-computed table indexes."""
        return self.codec.decode(data, indexes.astype(np.int32)).reshape(
            indexes.shape
        )

    def decode(
        self, data: bytes, means: np.ndarray, scales: np.ndarray
    ) -> np.ndarray:
        symbols = self.codec.decode(data, self.scale_indexes(scales))
        return symbols.reshape(means.shape).astype(np.float32) + means


class GaussianMuCoder:
    """rANS coder for *integer-grid* symbols under N(μ, σ) with non-integer μ.

    The neural-syntax family reconstructs with plain ``round(y)`` (integers),
    not CompressAI's ``round(y − μ) + μ``, so the coded alphabet is the
    integer grid and the model mean sits at a fractional offset
    δ = μ − round(μ) ∈ [−0.5, 0.5).  CDF rows are binned by
    (scale index × δ bin); coding against the nearest δ-bin center costs
    ≲ (1/(2·n_delta)/σ)²/2 nats/symbol — negligible at n_delta=16.

    Symbols: ``s = y_int − round(μ)``; reconstruction ``y_int = s + round(μ)``.
    """

    def __init__(
        self,
        scale_table: Optional[np.ndarray] = None,
        radius: int = 64,
        n_delta: int = 16,
    ):
        self.scale_table = (
            np.asarray(scale_table) if scale_table is not None else get_scale_table()
        )
        self.radius = radius
        self.n_delta = n_delta
        centers = (np.arange(n_delta) + 0.5) / n_delta - 0.5
        rows = []
        for s in self.scale_table:
            for d in centers:
                pmf = _gaussian_pmf(float(s), radius, mean=float(d))
                # honest tail mass — see GaussianCoder
                rows.append(
                    pmf_to_quantized_cdf(np.clip(pmf, 0.0, 1.0) * 0.9999)
                )
        self.codec = RansCodec(
            np.stack(rows), np.full(len(rows), -radius, np.int32)
        )

    def indexes(self, scales: np.ndarray, means: np.ndarray) -> np.ndarray:
        si = scale_table_indexes(self.scale_table, scales)
        delta = means - np.round(means)  # [-0.5, 0.5]
        dj = np.clip(
            np.floor((delta + 0.5) * self.n_delta), 0, self.n_delta - 1
        )
        return (si * self.n_delta + dj).astype(np.int32)

    def encode_ints(
        self, y_int: np.ndarray, means: np.ndarray, scales: np.ndarray
    ) -> bytes:
        sym = y_int.astype(np.int64) - np.round(means).astype(np.int64)
        return self.codec.encode(
            sym.astype(np.int32), self.indexes(scales, means)
        )

    def decode_ints(
        self, data: bytes, means: np.ndarray, scales: np.ndarray
    ) -> np.ndarray:
        sym = self.codec.decode(data, self.indexes(scales, means))
        return sym.reshape(means.shape) + np.round(means).astype(np.int32)


class FactorizedCoder:
    """rANS coder for the factorized prior: one CDF row per channel."""

    def __init__(self, pmf_table: np.ndarray, medians: np.ndarray, offset: int):
        """pmf_table: (C, S) from ``EntropyBottleneck.pmf_table(min_sym,
        max_sym)``; offset = min_sym; medians: (C,)."""
        rows = [
            pmf_to_quantized_cdf(np.clip(p, 0, 1) * 0.9999) for p in pmf_table
        ]
        self.codec = RansCodec(
            np.stack(rows), np.full(len(rows), offset, np.int32)
        )
        self.medians = np.asarray(medians, np.float32)

    def encode(self, z: np.ndarray) -> bytes:
        """z: (B, H, W, C) — symbols are round(z − median) per channel."""
        symbols = np.round(z - self.medians).astype(np.int32)
        return self.encode_symbols(symbols)

    def encode_symbols(self, symbols: np.ndarray) -> bytes:
        c = symbols.shape[-1]
        indexes = np.broadcast_to(np.arange(c, dtype=np.int32), symbols.shape)
        return self.codec.encode(
            symbols.astype(np.int32), np.ascontiguousarray(indexes)
        )

    def decode_symbols(self, data: bytes, shape: Tuple[int, ...]) -> np.ndarray:
        """Decode to raw int32 symbols (medians not re-added)."""
        c = shape[-1]
        indexes = np.broadcast_to(np.arange(c, dtype=np.int32), shape)
        return self.codec.decode(data, np.ascontiguousarray(indexes)).reshape(
            shape
        )

    def decode(self, data: bytes, shape: Tuple[int, ...]) -> np.ndarray:
        symbols = self.decode_symbols(data, shape)
        return symbols.astype(np.float32) + self.medians


class CodecCoder:
    """Bundle of the two coders, built from a trained model's tables."""

    def __init__(
        self,
        gaussian: Optional[GaussianCoder] = None,
        factorized: Optional[FactorizedCoder] = None,
    ):
        self.gaussian = gaussian or GaussianCoder()
        self.factorized = factorized
