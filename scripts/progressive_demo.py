"""Progressive-bitstream RD staircase on a trained checkpoint.

Encodes the held-out image ONCE with the trit-plane progressive coder and
decodes at every plane-boundary truncation, printing the (bpp, PSNR)
staircase — the scalable multi-rate capability the reference's
``model/Trit_Plane.py`` gestures at, wired to a real trained model.

Usage: python scripts/progressive_demo.py \
           --ckpt rd_runs/v2_src_0.0130/params.npz --preset source_net \
           [--out rd_runs/v2_src_0.0130/progressive.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HELD_OUT = (
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
    "sample_data/grace_hopper.jpg"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--preset", default="source_net")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.data.datasets import load_image_uint8
    from lic_tpu.data.pad import pad_to_multiple
    from lic_tpu.models import build_model
    from lic_tpu.models.progressive import ProgressiveCoder
    from lic_tpu.utils.checkpoint import load_params

    model = build_model(args.preset)
    img = load_image_uint8(HELD_OUT).astype(np.float32) / 127.5 - 1.0
    x = jnp.asarray(img[None])
    x_init, _ = pad_to_multiple(x)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x_init, training=True,
    )
    params = load_params(args.ckpt, variables["params"])
    coder = ProgressiveCoder(model, params, name=args.preset)

    blob = coder.compress(x)
    pts = coder.truncation_points(blob)
    h, w = img.shape[:2]
    ref255 = np.round((np.asarray(x[0]) + 1.0) * 127.5)

    stairs = []
    # full staircase is |planes| decodes — sample every plane (≤ ~30)
    for n, used in pts:
        rec = np.asarray(coder.decompress(blob, max_planes=n))[0]
        dec255 = np.clip((rec + 1.0) * 127.5, 0, 255).round()
        mse = float(np.mean((dec255 - ref255) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / mse)
        stairs.append({
            "planes": n,
            "bytes": used,
            "bpp": round(used * 8 / (h * w), 4),
            "psnr_255": round(psnr, 3),
        })
        print(f"planes={n:3d} {stairs[-1]['bpp']:.4f} bpp "
              f"{stairs[-1]['psnr_255']:.2f} dB")

    result = {
        "preset": args.preset,
        "ckpt": args.ckpt,
        "image": "grace_hopper (held out)",
        "stream_bytes": len(blob),
        "staircase": stairs,
    }
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fd:
            json.dump(result, fd, indent=1)


if __name__ == "__main__":
    main()
