"""Offline analysis / visualization (SURVEY.md §2.6, Lx layer).

* ``analyze_data`` — tensor min/max + magnitude histogram printout
  (``model/Net_unet.py:62-70``).
* ``effective_receptive_field`` — ERF score matrix computed natively from
  input gradients (the reference only *renders* a pre-computed .npy,
  ``model/analyze.py``); ``erf_heatmap`` reproduces the log1p + quantile-
  normalized rendering as a numpy array (no hard-coded I/O paths).
* ``feature_map_stats`` / ``dump_feature_maps`` — per-channel feature-map
  export (the capability of ``model/visual_Feature*.py`` without the
  hard-coded absolute paths inside ``forward``; defect §8.4).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def analyze_data(x, name: str = "tensor", log_fn=print) -> dict:
    x = np.asarray(x)
    stats = {
        "min": float(x.min()),
        "max": float(x.max()),
        "mean": float(x.mean()),
        "std": float(x.std()),
        "hist": np.histogram(np.abs(x), bins=10)[0].tolist(),
    }
    log_fn(
        f"{name}: min={stats['min']:.4f} max={stats['max']:.4f} "
        f"mean={stats['mean']:.4f} std={stats['std']:.4f} |hist|={stats['hist']}"
    )
    return stats


def effective_receptive_field(
    fn: Callable[[jax.Array], jax.Array], x: jax.Array
) -> np.ndarray:
    """ERF score matrix: |d f_center / d x| summed over channels.

    ``fn`` maps (B, H, W, C) → (B, h, w, c) features; the gradient of the
    central feature activation w.r.t. the input gives the ERF.
    """

    def center_sum(inp):
        feats = fn(inp)
        ch, cw = feats.shape[1] // 2, feats.shape[2] // 2
        return jnp.sum(feats[:, ch, cw, :])

    g = jax.grad(center_sum)(x)
    return np.abs(np.asarray(g)).sum(axis=(0, 3))


def erf_heatmap(score: np.ndarray) -> np.ndarray:
    """log1p + quantile normalization of an ERF score matrix → [0, 1]
    heatmap (the rendering transform of ``model/analyze.py``)."""
    s = np.log1p(np.maximum(score, 0.0))
    hi = np.quantile(s, 0.999)
    return np.clip(s / max(hi, 1e-12), 0.0, 1.0)


def feature_map_stats(feats) -> dict:
    f = np.asarray(feats)
    return {
        "shape": tuple(f.shape),
        "per_channel_mean": f.mean(axis=tuple(range(f.ndim - 1))).tolist(),
        "per_channel_std": f.std(axis=tuple(range(f.ndim - 1))).tolist(),
    }


def dump_feature_maps(
    feats, out_dir: str, prefix: str = "feat", max_channels: int = 64
) -> int:
    """Write per-channel grayscale PNGs of (1, H, W, C) features.  Returns
    the number of files written.  No-ops gracefully without PIL."""
    try:
        from PIL import Image
    except Exception:
        return 0
    os.makedirs(out_dir, exist_ok=True)
    f = np.asarray(feats)[0]
    n = min(f.shape[-1], max_channels)
    for c in range(n):
        ch = f[..., c]
        lo, hi = ch.min(), ch.max()
        img = ((ch - lo) / max(hi - lo, 1e-12) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_dir, f"{prefix}_{c}.png"))
    return n


def dump_feature_heatmaps(
    feats,
    out_dir: str,
    prefix: str = "feat",
    max_channels: int = 16,
    cmap: str = "jet",
    annot_grid: bool = False,
) -> int:
    """Styled per-channel heatmap renders of (1, H, W, C) features — the
    colormapped/seaborn presentation of ``model/visual_Feature.py:51-162``
    (cv2 JET colormap dumps + seaborn heatmaps), without the hard-coded
    absolute output paths.  Uses seaborn when importable, falls back to
    bare matplotlib, and no-ops gracefully without either.  Returns the
    number of files written.

    ``annot_grid`` additionally writes one figure tiling the first
    ``max_channels`` channels (the reference's per-layer grid view).
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return 0
    try:
        import seaborn as sns
    except Exception:
        sns = None

    os.makedirs(out_dir, exist_ok=True)
    f = np.asarray(feats)[0]
    n = min(f.shape[-1], max_channels)
    for c in range(n):
        fig, ax = plt.subplots(figsize=(4, 3))
        if sns is not None:
            sns.heatmap(
                f[..., c], cmap=cmap, cbar=True,
                xticklabels=False, yticklabels=False, ax=ax,
            )
        else:
            im = ax.imshow(f[..., c], cmap=cmap)
            fig.colorbar(im, ax=ax)
            ax.set_xticks([])
            ax.set_yticks([])
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{prefix}_{c}_heat.png"), dpi=96)
        plt.close(fig)
    written = n
    if annot_grid and n:
        cols = int(np.ceil(np.sqrt(n)))
        rows = -(-n // cols)
        fig, axes = plt.subplots(
            rows, cols, figsize=(2.2 * cols, 1.8 * rows), squeeze=False
        )
        for c in range(rows * cols):
            ax = axes[c // cols][c % cols]
            if c < n:
                ax.imshow(f[..., c], cmap=cmap)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{prefix}_grid.png"), dpi=96)
        plt.close(fig)
        written += 1
    return written
