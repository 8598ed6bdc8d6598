"""Classical-codec anchor: JPEG RD points on the held-out eval image.

Gives the README RD table an honest reference line (the environment has
no Kodak set or pretrained LIC checkpoints to compare against).  Host-only.

Usage: python scripts/jpeg_anchor.py [image_path]
"""

import io
import os
import json
import sys

import numpy as np
from PIL import Image

DEFAULT = (
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
    "sample_data/grace_hopper.jpg"
)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    im = Image.open(path).convert("RGB")
    ref = np.asarray(im).astype(np.float64)
    h, w = ref.shape[:2]

    try:  # MS-SSIM via the framework's native implementation (CPU jit)
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import jax.numpy as jnp

        from lic_tpu.training.loss import ms_ssim

        def msssim(a, b):
            return round(float(ms_ssim(
                jnp.asarray(a[None] / 255.0, jnp.float32),
                jnp.asarray(b[None] / 255.0, jnp.float32),
                data_range=1.0,
            )), 5)
    except Exception:
        msssim = None

    rows = []
    for q in (5, 10, 20, 30, 50, 70, 85, 95):
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=q)
        rec = np.asarray(Image.open(buf).convert("RGB")).astype(np.float64)
        mse = float(np.mean((rec - ref) ** 2))
        row = {
            "quality": q,
            "bpp": round(buf.getbuffer().nbytes * 8 / (h * w), 4),
            "psnr_255": round(10 * np.log10(255.0 ** 2 / mse), 3),
        }
        if msssim is not None:
            row["msssim"] = msssim(rec, ref)
        rows.append(row)
    print(json.dumps({"image": path.rsplit("/", 1)[-1], "jpeg": rows}))


if __name__ == "__main__":
    main()
