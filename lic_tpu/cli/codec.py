"""Compress / decompress CLI — real bitstreams to/from ``.ltc`` files.

Usage:
    python -m lic_tpu.cli.codec compress img.png out.ltc \
        --weight_path ckpt/final.npz --preset net_ga
    python -m lic_tpu.cli.codec decompress out.ltc rec.png \
        --weight_path ckpt/final.npz --preset net_ga
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lic_tpu bitstream codec")
    p.add_argument("command", choices=("compress", "decompress"))
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--weight_path", required=True)
    p.add_argument("--preset", default="net_ga")
    p.add_argument("--high", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.datasets import load_image_uint8
    from ..models import build_model
    from ..models.compress import ChannelCoder
    from ..utils.checkpoint import load_params

    model = build_model(args.preset, is_high=args.high)
    sample = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        sample, training=True,
    )
    params = load_params(args.weight_path, variables["params"])
    coder = ChannelCoder(model, params, name=args.preset)

    if args.command == "compress":
        img = load_image_uint8(args.input).astype(np.float32) / 127.5 - 1.0
        x = jnp.asarray(img[None])
        h, w = img.shape[:2]
        blob = coder.compress(x)  # pads to /64 internally
        with open(args.output, "wb") as fd:
            fd.write(blob)
        bpp = len(blob) * 8 / (h * w)
        print(f"{args.input} → {args.output}: {len(blob)} bytes ({bpp:.4f} bpp)")
    else:
        from PIL import Image

        with open(args.input, "rb") as fd:
            blob = fd.read()
        rec = np.asarray(coder.decompress(blob))[0]
        img = np.clip((rec + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(args.output)
        print(f"{args.input} → {args.output}: {img.shape[1]}x{img.shape[0]}")


if __name__ == "__main__":
    main()
