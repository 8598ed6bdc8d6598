"""Progressive (scalable) multi-rate coding: trit planes + rank coding.

Two capabilities in the reference's orbit are realized here:

1. **Trit-plane progressive latent coding** — the scalable-bitstream
   capability that ``model/Trit_Plane.py`` gestures at (BASELINE.json
   config #5).  Integer latent residuals are written in balanced ternary,
   MSB plane first; each plane is rANS-coded with its own (transmitted)
   frequency table.  Truncating the stream after any plane yields a valid
   lower-rate reconstruction (missing digits reconstruct to their
   conditional midpoint, i.e. 0 in balanced ternary).

2. **Differential + frequency-rank substitution coding** — the literal
   transform the reference script performs on image channels
   (``model/Trit_Plane.py:25-50``, with its decode bug fixed: the rank
   mapping is inverted through the *inverse* dictionary on decode).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .rans import RansCodec, pmf_to_quantized_cdf


# --------------------------------------------------------------- trit planes

def num_planes_for(max_abs: int) -> int:
    """Planes needed so balanced ternary covers [−max_abs, max_abs]."""
    k, cover = 1, 1
    while cover < max_abs:
        k += 1
        cover = (3 ** k - 1) // 2
    return k


def to_balanced_ternary(symbols: np.ndarray, k: int) -> np.ndarray:
    """(N,) ints → (k, N) digits ∈ {−1, 0, 1}, MSB first."""
    s = symbols.astype(np.int64).copy()
    digits = np.zeros((k, s.size), np.int8)
    for i in range(k - 1, -1, -1):  # LSB first
        r = ((s + 1) % 3) - 1  # balanced remainder
        digits[i] = r
        s = (s - r) // 3
    assert np.all(s == 0), "symbols exceed trit-plane range"
    return digits


def from_balanced_ternary(digits: np.ndarray) -> np.ndarray:
    """(k, N) digits (MSB first) → (N,) ints."""
    k = digits.shape[0]
    out = np.zeros(digits.shape[1], np.int64)
    for i in range(k):
        out = out * 3 + digits[i]
    return out


class TritPlaneCoder:
    """Progressive coder over integer symbol arrays."""

    def encode(self, symbols: np.ndarray, num_planes: int) -> List[bytes]:
        """Returns one blob per plane (MSB first).  Each blob embeds its
        3-entry frequency table (12 bytes) + rANS payload."""
        digits = to_balanced_ternary(symbols.reshape(-1), num_planes)
        blobs = []
        for p in range(num_planes):
            plane = digits[p] + 1  # {0,1,2}
            counts = np.bincount(plane, minlength=3).astype(np.float64)
            pmf = (counts + 1) / (counts.sum() + 3)
            cdf = pmf_to_quantized_cdf(pmf * 0.9999)
            codec = RansCodec(cdf[None], np.asarray([0], np.int32))
            payload = codec.encode(
                plane.astype(np.int32), np.zeros(plane.size, np.int32)
            )
            header = counts.astype(np.uint32).astype("<u4").tobytes()
            blobs.append(header + payload)
        return blobs

    def decode(
        self, blobs: Sequence[bytes], n: int, num_planes: int
    ) -> np.ndarray:
        """Decode however many planes are available; missing LSB planes
        reconstruct as digit 0 (midpoint)."""
        digits = np.zeros((num_planes, n), np.int8)
        for p, blob in enumerate(blobs[:num_planes]):
            counts = np.frombuffer(blob[:12], "<u4").astype(np.float64)
            pmf = (counts + 1) / (counts.sum() + 3)
            cdf = pmf_to_quantized_cdf(pmf * 0.9999)
            codec = RansCodec(cdf[None], np.asarray([0], np.int32))
            plane = codec.decode(blob[12:], np.zeros(n, np.int32))
            digits[p] = (plane - 1).astype(np.int8)
        return from_balanced_ternary(digits)


# ------------------------------------------- σ-modeled per-digit trit coding

class GaussianTritCoder:
    """DPICT-style progressive trit coding with per-element digit models.

    The residual ``r = round(y − μ)`` is discretized ``N(0, σ)`` and σ is
    known to BOTH ends before any digit is read (it comes from the hyper
    prior + already-decoded slices).  At a plane with scale ``t = 3^(m−1)``
    and prefix center ``c`` (the value implied by the digits decoded so
    far), the digit splits the current interval into three cells whose
    exact Gaussian masses (with the ±½ continuity correction) are

        P(d) = Φ((c + (d + ½)·t)/σ) − Φ((c + (d − ½)·t)/σ),  d ∈ {−1,0,1}

    i.e. a function of only ``q = c/t`` and ``b = t/σ``.  Both ends bin
    (q, b) into a fixed static grid and look the 3-way CDF up — nothing is
    transmitted (the per-plane static tables of :class:`TritPlaneCoder`
    are the fallback this improves on; reference capability:
    ``model/Trit_Plane.py:25-95`` + DPICT CVPR'22).

    Sign symmetry halves the q grid: for c < 0 the digit pmf mirrors, so
    encode |q| and flip the digit's sign bit through the symbol mapping.
    """

    QBINS = 48        # |q| ∈ [0, 1.625] linear  (|c| ≤ (3^m−1)/2 ⇒ |q| < 1.5+)
    BBINS = 64        # b  ∈ [2⁻⁸, 2⁸] geometric
    QMAX = 1.625

    def __init__(self):
        from scipy.special import ndtr  # torch-free Φ; scipy ships in-image

        qs = (np.arange(self.QBINS) + 0.5) / self.QBINS * self.QMAX
        bs = np.exp2(np.linspace(-8, 8, self.BBINS))
        q, b = np.meshgrid(qs, bs, indexing="ij")      # (QBINS, BBINS)
        edges = [(q + (d - 0.5)) * b for d in (-1, 0, 1, 2)]
        cdf_pts = [ndtr(e) for e in edges]
        pmf = np.stack(
            [cdf_pts[i + 1] - cdf_pts[i] for i in range(3)], axis=-1
        )  # (QBINS, BBINS, 3) masses of d = −1, 0, +1
        # far-tail contexts can carry ~zero total mass — floor BEFORE
        # normalizing so no row divides by (or casts) a NaN
        pmf = np.maximum(pmf, 1e-9)
        pmf = pmf / pmf.sum(-1, keepdims=True)
        rows = np.stack(
            [pmf_to_quantized_cdf(p * 0.9999) for p in pmf.reshape(-1, 3)]
        )
        self.cdfs = rows
        self.codec = RansCodec(
            rows, np.zeros(rows.shape[0], np.int32)
        )

    def _ctx(self, c: np.ndarray, t: float, sigma: np.ndarray):
        """Context row ids + sign flips for prefix centers c at scale t."""
        b = t / np.maximum(sigma, 1e-9)
        bb = np.clip(
            np.round((np.log2(b) + 8) / 16 * (self.BBINS - 1)), 0,
            self.BBINS - 1,
        ).astype(np.int64)
        q = c / t
        flip = q < 0
        qb = np.clip(
            (np.abs(q) / self.QMAX * self.QBINS).astype(np.int64), 0,
            self.QBINS - 1,
        )
        return qb * self.BBINS + bb, flip

    def encode(
        self, symbols: np.ndarray, sigma: np.ndarray, num_planes: int
    ) -> List[bytes]:
        digits = to_balanced_ternary(symbols.reshape(-1), num_planes)
        sigma = sigma.reshape(-1).astype(np.float64)
        c = np.zeros(digits.shape[1], np.float64)
        blobs = []
        for p in range(num_planes):
            t = float(3 ** (num_planes - 1 - p))
            ctx, flip = self._ctx(c, t, sigma)
            d = digits[p].astype(np.int32)
            sym = np.where(flip, -d, d) + 1
            blobs.append(
                self.codec.encode(sym.astype(np.int32), ctx.astype(np.int32))
            )
            c = c + digits[p] * t
        return blobs

    def decode(
        self, blobs: Sequence[bytes], n: int, sigma: np.ndarray,
        num_planes: int,
    ) -> np.ndarray:
        sigma = sigma.reshape(-1).astype(np.float64)
        c = np.zeros(n, np.float64)
        digits = np.zeros((num_planes, n), np.int8)
        for p in range(num_planes):
            t = float(3 ** (num_planes - 1 - p))
            if p < len(blobs):
                ctx, flip = self._ctx(c, t, sigma)
                sym = self.codec.decode(blobs[p], ctx.astype(np.int32))
                d = (sym - 1).astype(np.int8)
                digits[p] = np.where(flip, -d, d)
            c = c + digits[p] * t
        return from_balanced_ternary(digits)


# ------------------------------------------------- differential rank coding

def diff_encode(channel: np.ndarray) -> np.ndarray:
    """Row-wise differential encoding (first element kept)."""
    out = channel.astype(np.int16).copy()
    out[1:] = channel[1:].astype(np.int16) - channel[:-1].astype(np.int16)
    return out


def diff_decode(diff: np.ndarray) -> np.ndarray:
    return np.cumsum(diff.astype(np.int64), axis=0)


def rank_encode(data: np.ndarray) -> Tuple[np.ndarray, Dict[int, int]]:
    """Map values to their frequency rank (most frequent → 0).  Returns
    (ranks, value→rank dict); decode uses the inverted dict."""
    flat = data.reshape(-1)
    freq = Counter(flat.tolist())
    ordered = [v for v, _ in freq.most_common()]
    table = {v: i for i, v in enumerate(ordered)}
    ranks = np.asarray([table[v] for v in flat.tolist()], np.int64)
    return ranks.reshape(data.shape), table


def rank_decode(ranks: np.ndarray, table: Dict[int, int]) -> np.ndarray:
    inv = {i: v for v, i in table.items()}
    flat = ranks.reshape(-1)
    return np.asarray([inv[int(r)] for r in flat.tolist()], np.int64).reshape(
        ranks.shape
    )
