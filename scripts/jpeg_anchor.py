"""Classical-codec anchor: JPEG RD points on the held-out eval image.

Gives the README RD table an honest reference line (the environment has
no Kodak set or pretrained LIC checkpoints to compare against).  Host-only.

Usage: python scripts/jpeg_anchor.py [image_path]
"""

import io
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
    rows = []
    for q in (5, 10, 20, 30, 50, 70, 85, 95):
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=q)
        rec = np.asarray(Image.open(buf).convert("RGB")).astype(np.float64)
        mse = float(np.mean((rec - ref) ** 2))
        rows.append({
            "quality": q,
            "bpp": round(buf.getbuffer().nbytes * 8 / (h * w), 4),
            "psnr_255": round(10 * np.log10(255.0 ** 2 / mse), 3),
        })
    print(json.dumps({"image": path.rsplit("/", 1)[-1], "jpeg": rows}))


if __name__ == "__main__":
    main()
