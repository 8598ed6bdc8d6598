"""Production serving layer: request batching over the codec pipeline.

The reference has no serving story (its eval loop rebuilds the model per
image, ``eval_net.py:90-91``).  On TPU the economics are different: the
compiled batched pipeline (`ChannelCoder.compress_batch` /
``decompress_batch``) amortizes every device dispatch B-fold, so the right
serving shape is *dynamic batching* — admit requests on any thread, group
them by padded image size (one compiled executable per size bucket), and
drive the device from ONE scheduler thread (single-TPU-process
discipline; host rANS already overlaps on a worker inside the coder).

Usage::

    svc = CodecService(model, params, name="source_net", max_batch=8)
    svc.start()
    fut = svc.submit_compress(img)          # (H, W, 3) float in [-1, 1]
    blob = fut.result()
    rec = svc.submit_decompress(blob).result()
    svc.stop()

Guarantees:

* requests of different sizes never share a batch (different padded
  shapes would recompile anyway);
* partial batches are PADDED to ``max_batch`` (results sliced) so every
  bucket uses one compiled executable — a fresh XLA compile on a live
  request would blow the latency bound by minutes on a small host;
* full batches produce bitstreams byte-identical to ``compress_batch``;
  a padded partial batch runs the same program at the same shape but may
  differ from the *single-image* coder in last-bit fp32 (and hence, at a
  round() boundary, in bytes) — streams are always self-consistently
  decodable, and any entropy-parameter divergence trips the decoder's
  stream-integrity check loudly;
* ``max_wait_ms`` bounds the extra latency batching may add under low
  load; a full bucket dispatches immediately.
"""

from __future__ import annotations

import struct
import threading
import time
from collections import defaultdict, deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Deque, Dict, List, Optional, Tuple

import numpy as np


@dataclass
class ServiceStats:
    requests: int = 0
    batches: int = 0
    errors: int = 0
    latencies_ms: Deque[float] = field(default_factory=lambda: deque(maxlen=4096))
    # guards the deque against the scheduler appending while a monitoring
    # thread snapshots (deque iteration raises on concurrent mutation)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record(self, n: int, latencies: List[float]) -> None:
        with self._lock:
            self.requests += n
            self.batches += 1
            self.latencies_ms.extend(latencies)

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            lat = sorted(self.latencies_ms)
            requests, batches, errors = self.requests, self.batches, self.errors
        pct = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0
        return {
            "requests": requests,
            "batches": batches,
            "errors": errors,
            "mean_batch": requests / batches if batches else 0.0,
            "p50_ms": pct(0.50),
            "p95_ms": pct(0.95),
        }


class _Req:
    __slots__ = ("kind", "payload", "future", "t0")

    def __init__(self, kind: str, payload: Any):
        self.kind = kind
        self.payload = payload
        self.future: Future = Future()
        self.t0 = time.perf_counter()


class CodecService:
    """Dynamic-batching codec server over one (model, params) pair."""

    def __init__(
        self,
        model,
        params,
        name: str = "",
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        max_queue: int = 256,
        rate: Optional[float] = None,
    ):
        from ..models.compress import ChannelCoder

        # one service serves one operating point; run several services
        # over the same (model, params) for several rates — the jitted
        # sub-passes treat the rate as a traced scalar, so they share
        # one compiled executable
        self.coder = ChannelCoder(model, params, name=name, rate=rate)
        self.max_batch = int(max_batch)
        self.max_wait_ms = float(max_wait_ms)
        self.max_queue = int(max_queue)
        self.stats = ServiceStats()
        self._lock = threading.Condition()
        # one FIFO per (kind, size-bucket): different padded sizes compile
        # different executables and must not share a batch
        self._queues: Dict[Tuple, Deque[_Req]] = defaultdict(deque)
        self._pending = 0
        self._stopping = False
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------ admit

    def submit_compress(
        self, image: np.ndarray, rate: Optional[float] = None
    ) -> Future:
        """image: (H, W, 3) float32 in [−1, 1].  → Future[bytes].

        ``rate``: per-request gain-unit rate index (variable-rate models;
        e.g. from ``rate_control.solve_rate_for_bpp``) — mixed rates share
        a batch, the gains broadcast per image on device."""
        img = np.asarray(image, np.float32)
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) image, got {img.shape}")
        if rate is not None and not self.coder.has_gain:
            raise ValueError(
                "rate= was given but this model has no gain units"
            )
        return self._enqueue(
            ("c", img.shape[0], img.shape[1]),
            _Req("c", (img, None if rate is None else float(rate))),
        )

    def submit_decompress(self, blob: bytes) -> Future:
        """blob: one bitstream from this codec.  → Future[np.ndarray]."""
        h, w = self._blob_size(blob)
        return self._enqueue(("d", h, w), _Req("d", blob))

    def _blob_size(self, blob: bytes) -> Tuple[int, int]:
        _, h, w, _ = self.coder._parse_header(blob)
        return h, w

    def _enqueue(self, bucket: Tuple, req: _Req) -> Future:
        with self._lock:
            if self._stopping:
                raise RuntimeError("CodecService is stopped")
            if self._pending >= self.max_queue:
                raise RuntimeError(
                    f"CodecService queue full ({self.max_queue}) — backpressure"
                )
            self._queues[bucket].append(req)
            self._pending += 1
            self._lock.notify()
        return req.future

    # -------------------------------------------------------- scheduler

    def start(self) -> "CodecService":
        with self._lock:
            if self._thread is not None:
                return self
            self._stopping = False
            self._thread = threading.Thread(
                target=self._run, name="codec-service", daemon=True
            )
            self._thread.start()
        return self

    def stop(self, drain: bool = True) -> None:
        """Stop the service.  New admissions are rejected immediately.
        ``drain=True`` processes everything already queued first;
        ``drain=False`` fails queued requests with RuntimeError instead
        of leaving their futures unresolved forever."""
        with self._lock:
            self._stopping = True
            if not drain:
                for q in self._queues.values():
                    while q:
                        r = q.popleft()
                        self._pending -= 1
                        if not r.future.cancelled():
                            r.future.set_exception(
                                RuntimeError("CodecService stopped")
                            )
            self._lock.notify_all()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def warmup(self, sizes: List[Tuple[int, int]], batch: Optional[int] = None) -> None:
        """Precompile the pipeline for the given (H, W) buckets."""
        b = batch or self.max_batch
        for h, w in sizes:
            x = np.zeros((b, h, w, 3), np.float32)
            blobs = self.coder.compress_batch(self._to_device(x))
            self.coder.decompress_batch(blobs)

    @staticmethod
    def _to_device(x: np.ndarray):
        import jax.numpy as jnp

        return jnp.asarray(x)

    def _take_batch(self) -> Optional[List[_Req]]:
        """Called with the lock held.  Returns a full or timed-out bucket;
        when stopping, any non-empty bucket (the scheduler drains)."""
        now = time.perf_counter()
        best = None
        for bucket, q in self._queues.items():
            if not q:
                continue
            full = len(q) >= self.max_batch
            aged = (now - q[0].t0) * 1000.0 >= self.max_wait_ms
            if full or aged or self._stopping:
                if best is None or q[0].t0 < self._queues[best][0].t0:
                    best = bucket
        if best is None:
            return None
        q = self._queues[best]
        batch = [q.popleft() for _ in range(min(self.max_batch, len(q)))]
        self._pending -= len(batch)
        return batch

    def _next_deadline_s(self) -> float:
        """Called with the lock held: seconds until the oldest queued
        request ages out — a fixed max_wait_ms sleep would let dispatch
        latency reach ~2x the documented bound."""
        now = time.perf_counter()
        wait = self.max_wait_ms / 1000.0
        for q in self._queues.values():
            if q:
                wait = min(wait, self.max_wait_ms / 1000.0 - (now - q[0].t0))
        return max(wait, 1e-4)

    def _run(self) -> None:
        while True:
            with self._lock:
                batch = self._take_batch()
                if batch is None:
                    if self._stopping and self._pending == 0:
                        return
                    self._lock.wait(timeout=self._next_deadline_s())
                    continue
            self._process(batch)
            with self._lock:
                self._lock.notify_all()

    def _process(self, batch: List[_Req]) -> None:
        kind = batch[0].kind
        # every family is batched: charm slices / checkerboard via the
        # single-dispatch slice pass, the NS wavefront via its batched
        # scan (B images as independent rANS streams in one dispatch)
        # pad partial batches up to max_batch (repeat the last item, slice
        # results): every distinct batch size would otherwise be a new XLA
        # input shape and recompile the whole pipeline on a request that
        # was promised at most ~max_wait_ms of batching latency
        n = len(batch)
        pad = self.max_batch - n
        try:
            if kind == "c":
                imgs = [r.payload[0] for r in batch]
                rates = [r.payload[1] for r in batch]
                imgs += [imgs[-1]] * pad
                rates += [rates[-1]] * pad
                xs = self._to_device(np.stack(imgs))
                if any(rr is not None for rr in rates):
                    # mixed rate/None inside one batch: None means the
                    # coder's default operating point
                    rates = [
                        self.coder.rate if rr is None else rr
                        for rr in rates
                    ]
                    blobs = self.coder.compress_batch(xs, rates=rates)[:n]
                else:
                    blobs = self.coder.compress_batch(xs)[:n]
                for r, b in zip(batch, blobs):
                    self._resolve(r, b)
            else:
                payloads = [r.payload for r in batch]
                payloads += [payloads[-1]] * pad
                recs = np.asarray(
                    self.coder.decompress_batch(payloads)
                )[:n]
                for i, r in enumerate(batch):
                    self._resolve(r, recs[i])
            t1 = time.perf_counter()
            self.stats.record(n, [(t1 - r.t0) * 1000.0 for r in batch])
        except Exception as e:
            with self.stats._lock:
                self.stats.errors += n
            for r in batch:
                if not r.future.done() and not r.future.cancelled():
                    r.future.set_exception(e)

    @staticmethod
    def _resolve(req: _Req, value) -> None:
        # a caller may have cancelled the future while the batch computed;
        # set_result would raise InvalidStateError and poison the batch
        if not req.future.cancelled():
            req.future.set_result(value)
