"""Host-side image pipeline feeding device-resident batches.

Mirrors the reference training input (DIV2K folder glob + random 256-crop +
``x/127.5 − 1`` normalization, ``train_net_unet.py:24-51,92-101``) with a
TPU-shaped delivery: a background prefetch thread decodes and crops on host
while the device computes, and batches are transferred once per step
(``jax.device_put`` with optional sharding) — batched images stream straight
into HBM with no per-transform host round-trips.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover - PIL ships with torchvision here
    Image = None

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_images(path: str) -> List[str]:
    if os.path.isdir(path):
        files = []
        for ext in IMG_EXTS:
            files += glob.glob(os.path.join(path, f"*{ext}"))
            files += glob.glob(os.path.join(path, f"*{ext.upper()}"))
        return sorted(files)
    return sorted(glob.glob(path))


def load_image_uint8(path: str) -> np.ndarray:
    """(H, W, 3) uint8."""
    if Image is None:
        raise RuntimeError("PIL unavailable — cannot decode images")
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def normalize_pm1(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [−1, 1] (``train_net_unet.py:43-51``)."""
    return x.astype(np.float32) / 127.5 - 1.0


class ImageFolderDataset:
    """Folder of images with random crops for training."""

    def __init__(self, path: str, crop_size: int = 256):
        self.files = list_images(path)
        if not self.files:
            raise FileNotFoundError(f"no images under {path}")
        self.crop_size = crop_size

    def __len__(self) -> int:
        return len(self.files)

    def sample_crop(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        img = load_image_uint8(self.files[idx])
        c = self.crop_size
        h, w = img.shape[:2]
        while h < c or w < c:
            # tile-by-symmetric-pad images smaller than the crop; 'symmetric'
            # allows pad widths up to the full dim (unlike 'reflect', which
            # raises for images smaller than ~half the crop), and the loop
            # covers arbitrarily small inputs.
            img = np.pad(
                img,
                (
                    (0, min(h, max(0, c - h))),
                    (0, min(w, max(0, c - w))),
                    (0, 0),
                ),
                mode="symmetric",
            )
            h, w = img.shape[:2]
        top = int(rng.integers(0, h - c + 1))
        left = int(rng.integers(0, w - c + 1))
        return img[top : top + c, left : left + c]


def train_iterator(
    dataset: ImageFolderDataset,
    batch_size: int,
    seed: int = 0,
    num_threads: int = 4,
    prefetch: int = 4,
    sharding=None,
) -> Iterator:
    """Infinite iterator of device-resident (B, C, C, 3) float32 batches in
    [−1, 1].  Decoding/cropping runs in ``num_threads`` host threads; up to
    ``prefetch`` ready batches are queued ahead of the device."""
    import jax

    q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker(tid: int):
        rng = np.random.default_rng(seed * 1000 + tid)
        n = len(dataset)
        failures = 0
        while not stop.is_set():
            # a single corrupt/truncated image must NOT kill the worker
            # thread (exceptions would only reach threading's excepthook;
            # once every worker died, q.get() below would hang a multi-day
            # run forever).  Resample per item, give up loudly only if
            # nothing in the folder is readable.
            crops = []
            while len(crops) < batch_size and not stop.is_set():
                try:
                    crops.append(
                        normalize_pm1(
                            dataset.sample_crop(int(rng.integers(0, n)), rng)
                        )
                    )
                    failures = 0
                except Exception as e:  # noqa: BLE001 — skip bad files
                    failures += 1
                    if failures >= max(10 * n, 100):
                        import sys

                        print(
                            f"prefetch worker {tid}: {failures} consecutive "
                            f"unreadable samples, giving up: {e}",
                            file=sys.stderr,
                        )
                        return
            if len(crops) < batch_size:
                return  # stopping
            batch = np.stack(crops)
            # retry the SAME batch on a full queue — never discard decoded
            # host work (decode dominates on this 1-vCPU host)
            while not stop.is_set():
                try:
                    q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue

    threads = [
        threading.Thread(target=worker, args=(t,), daemon=True)
        for t in range(num_threads)
    ]
    for t in threads:
        t.start()

    try:
        while True:
            batch = q.get()
            if sharding is not None:
                yield jax.device_put(batch, sharding)
            else:
                yield jax.device_put(batch)
    finally:
        stop.set()


def synthetic_batches(
    batch_size: int, crop: int = 256, seed: int = 0
) -> Iterator[np.ndarray]:
    """Deterministic synthetic data for tests/benchmarks (no dataset on disk)."""
    rng = np.random.default_rng(seed)
    while True:
        yield rng.uniform(-1, 1, (batch_size, crop, crop, 3)).astype(np.float32)
