"""ctypes binding + CDF quantization for the C++ rANS core.

Build-on-first-use: ``rans.cpp`` is compiled to a shared object next to
this file with g++ -O3 (no pybind11 in the image; plain C ABI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence, Tuple

import numpy as np

_PRECISION = 16
_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rans.cpp")
_SO = os.path.join(_HERE, "_rans.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    # compile to a temp path and os.rename (atomic on POSIX): concurrent
    # processes racing the build must never CDLL a half-written .so
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(
            f"rans.cpp compile failed:\n{e.stderr.decode(errors='replace')}"
        ) from e
    os.replace(tmp, _SO)


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO)) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.rans_encode_indexed.restype = ctypes.c_long
        lib.rans_encode_indexed.argtypes = [
            i32p, i32p, ctypes.c_long, u32p, ctypes.c_long, i32p,
            u8p, ctypes.c_long,
        ]
        lib.rans_build_lut.restype = None
        lib.rans_build_lut.argtypes = [
            u32p, ctypes.c_long, ctypes.c_long, u16p,
        ]
        lib.rans_decode_indexed.restype = ctypes.c_long
        lib.rans_decode_indexed.argtypes = [
            u8p, ctypes.c_long, i32p, ctypes.c_long, u32p, ctypes.c_long,
            i32p, u16p, i32p,
        ]
        lib.rans_stream_create.restype = ctypes.c_void_p
        lib.rans_stream_create.argtypes = [u8p, ctypes.c_long]
        lib.rans_stream_decode.restype = ctypes.c_long
        lib.rans_stream_decode.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_long, u32p, ctypes.c_long,
            i32p, u16p, i32p,
        ]
        lib.rans_stream_finish.restype = ctypes.c_long
        lib.rans_stream_finish.argtypes = [ctypes.c_void_p]
        lib.rans_stream_destroy.restype = None
        lib.rans_stream_destroy.argtypes = [ctypes.c_void_p]
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.rans16_encode_lanes.restype = ctypes.c_long
        lib.rans16_encode_lanes.argtypes = [
            i32p, i32p, i64p, ctypes.c_long, u32p, ctypes.c_long, i32p,
            u16p, ctypes.c_long, i32p,
        ]
        lib.rans16_decode_lanes.restype = ctypes.c_long
        lib.rans16_decode_lanes.argtypes = [
            u16p, i64p, i32p, i64p, ctypes.c_long, u32p, ctypes.c_long,
            i32p, i32p,
        ]
        lib.rans16i_encode.restype = ctypes.c_long
        lib.rans16i_encode.argtypes = [
            i32p, i32p, i64p, ctypes.c_long, ctypes.c_long,
            u32p, ctypes.c_long, i32p, u16p, ctypes.c_long,
        ]
        lib.rans16i_decode.restype = ctypes.c_long
        lib.rans16i_decode.argtypes = [
            u16p, ctypes.c_long, i32p, i64p, ctypes.c_long, ctypes.c_long,
            u32p, ctypes.c_long, i32p, i32p,
        ]
        _LIB = lib
        return lib


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = _PRECISION) -> np.ndarray:
    """Quantize a PMF to a monotone integer CDF summing to 2^precision.

    Every in-table slot AND the trailing escape slot get frequency >= 1;
    deficits/surpluses are settled against the largest bins.
    pmf: (S,) probabilities over the in-table symbols.  Returns (S + 2,)
    cdf with cdf[0] = 0, cdf[-1] = 2^precision (S in-table slots + escape).
    """
    pmf = np.asarray(pmf, np.float64)
    s = pmf.size
    total = 1 << precision
    # reserve escape mass = max(remaining tail mass, tiny)
    tail = max(1.0 - pmf.sum(), 0.0) + 1e-9
    scaled = np.concatenate([pmf, [tail]])
    scaled = scaled / scaled.sum() * total
    freqs = np.maximum(np.round(scaled).astype(np.int64), 1)
    # fix total
    diff = total - freqs.sum()
    while diff != 0:
        if diff > 0:
            freqs[np.argmax(scaled - freqs)] += 1
            diff -= 1
        else:
            candidates = np.where(freqs > 1)[0]
            j = candidates[np.argmin((scaled - freqs)[candidates])]
            freqs[j] -= 1
            diff += 1
    cdf = np.zeros(s + 2, np.uint32)
    cdf[1:] = np.cumsum(freqs).astype(np.uint32)
    assert cdf[-1] == total
    return cdf


class RansCodec:
    """Indexed-CDF rANS: every symbol selects a CDF row.

    rows: list/array of quantized CDFs with identical length ``row_len``
    (pad shorter rows by repeating the final value and moving their escape
    slot accordingly is NOT done here — callers build same-sized rows).
    offsets: per-row integer value of in-table slot 0.
    """

    def __init__(self, cdf_rows: np.ndarray, offsets: np.ndarray):
        self.cdfs = np.ascontiguousarray(cdf_rows, np.uint32)
        assert self.cdfs.ndim == 2
        self.row_len = self.cdfs.shape[1]
        self.offsets = np.ascontiguousarray(offsets, np.int32)
        assert self.offsets.shape[0] == self.cdfs.shape[0]
        # First-level decode LUT (cum >> 8 → slot): replaces the per-symbol
        # binary search with one lookup + a short in-bucket scan (the 1-vCPU
        # host's rANS decode is a measured ~0.26 s of the batch roundtrip).
        self.lut = np.empty((self.cdfs.shape[0], 256), np.uint16)
        _lib().rans_build_lut(
            self.cdfs, self.cdfs.shape[0], self.row_len, self.lut
        )

    def encode(self, symbols: np.ndarray, indexes: np.ndarray) -> bytes:
        symbols = np.ascontiguousarray(symbols.reshape(-1), np.int32)
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        assert symbols.shape == indexes.shape
        self._check_indexes(indexes)
        cap = symbols.size * 16 + 1024
        out = np.empty(cap, np.uint8)
        n = _lib().rans_encode_indexed(
            symbols, indexes, symbols.size, self.cdfs, self.row_len,
            self.offsets, out, cap,
        )
        if n < 0:
            raise RuntimeError("rANS encode overflow")
        return out[:n].tobytes()

    def decode(self, data: bytes, indexes: np.ndarray) -> np.ndarray:
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        self._check_indexes(indexes)
        buf = np.frombuffer(data, np.uint8)
        buf = np.ascontiguousarray(buf)
        out = np.empty(indexes.size, np.int32)
        rc = _lib().rans_decode_indexed(
            buf, buf.size, indexes, indexes.size, self.cdfs, self.row_len,
            self.offsets, self.lut, out,
        )
        if rc < 0:
            raise ValueError(
                "corrupt or truncated rANS stream (final-state check failed)"
            )
        return out

    def _check_indexes(self, indexes: np.ndarray) -> None:
        """The binding is the memory-safety boundary: an out-of-range CDF
        row would make the C side read past cdfs/lut (segfault or garbage)
        instead of raising."""
        if indexes.size and (
            indexes.min() < 0 or indexes.max() >= self.cdfs.shape[0]
        ):
            raise IndexError(
                f"CDF row index out of range [0, {self.cdfs.shape[0]}): "
                f"min={indexes.min()}, max={indexes.max()}"
            )

    def stream_decoder(self, data: bytes) -> "RansStreamDecoder":
        """Incremental decoder over one continuous rANS state — for AR
        decodes where later indexes depend on earlier symbols."""
        return RansStreamDecoder(self, data)


class RansStreamDecoder:
    """Stateful slice-by-slice decoding against a parent ``RansCodec``'s
    tables.  ``decode(indexes)`` may be called repeatedly; ``finish()``
    verifies stream integrity (must be called to validate)."""

    def __init__(self, codec: RansCodec, data: bytes):
        self._codec = codec
        buf = np.ascontiguousarray(np.frombuffer(data, np.uint8))
        self._handle = _lib().rans_stream_create(buf, buf.size)

    def decode(self, indexes: np.ndarray) -> np.ndarray:
        if self._handle is None:
            raise RuntimeError("stream decoder already finished")
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        out = np.empty(indexes.size, np.int32)
        rc = _lib().rans_stream_decode(
            self._handle, indexes, indexes.size, self._codec.cdfs,
            self._codec.row_len, self._codec.offsets, self._codec.lut, out,
        )
        if rc < 0:
            _lib().rans_stream_destroy(self._handle)
            self._handle = None
            raise ValueError("corrupt or truncated rANS stream (overrun)")
        return out

    def finish(self) -> None:
        if self._handle is None:
            return
        rc = _lib().rans_stream_finish(self._handle)
        self._handle = None
        if rc != 0:
            raise ValueError(
                "corrupt or truncated rANS stream (final-state check failed)"
            )

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            _lib().rans_stream_destroy(self._handle)
            self._handle = None
