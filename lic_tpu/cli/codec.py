"""Compress / decompress CLI — real bitstreams to/from ``.ltc`` files.

Usage:
    python -m lic_tpu.cli.codec compress img.png out.ltc \
        --weight_path ckpt/final.npz --preset net_ga
    python -m lic_tpu.cli.codec decompress out.ltc rec.png \
        --weight_path ckpt/final.npz --preset net_ga

Directory batch mode (input AND output are directories): images are
grouped by size and driven through the batched device pipeline — one
dispatch per stage per size bucket instead of per file
(``compress_batch``/``decompress_batch``; ``--batch`` caps the bucket).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lic_tpu bitstream codec")
    p.add_argument("command", choices=("compress", "decompress"))
    p.add_argument("input", help="image/.ltc file, or a directory of them")
    p.add_argument("output", help="output file, or a directory (batch mode)")
    p.add_argument("--weight_path", required=True)
    p.add_argument("--preset", default="net_ga")
    p.add_argument("--high", action="store_true")
    p.add_argument("--post_processing", action="store_true",
                   help="build the model with the HAN post-processing tail "
                        "(required for phase-2 checkpoints)")
    p.add_argument("--batch", type=int, default=8,
                   help="max images per device batch in directory mode")
    p.add_argument("--rate", type=float, default=None,
                   help="gain-unit rate index (variable-rate presets; "
                        "continuous, e.g. 1.5 interpolates units 1 and 2)")
    p.add_argument("--target_bpp", type=float, default=None,
                   help="solve the gain-unit rate for this bitrate per "
                        "image (variable-rate presets; bisection on the "
                        "estimated bpp — overrides --rate)")
    p.add_argument("--progressive", action="store_true",
                   help="scalable trit-plane bitstream (ChARM presets): "
                        "one stream decodes at every plane-boundary "
                        "truncation (lic_tpu.models.progressive)")
    p.add_argument("--truncate_planes", type=int, default=None,
                   help="decompress using at most this many trit planes "
                        "(progressive streams; slice-major count)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    # persistent XLA compile cache: CLI invocations are separate
    # processes; without this every run pays multi-minute fresh
    # compiles on this host (round-5 finding: verify_cli spent
    # ~28 min in compiles the cache already knew)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.datasets import load_image_uint8
    from ..models import build_model
    from ..models.compress import ChannelCoder
    from ..utils.checkpoint import load_params

    model = build_model(
        args.preset, is_high=args.high, post_processing=args.post_processing
    )
    sample = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        sample, training=True,
    )
    params = load_params(args.weight_path, variables["params"])
    if args.progressive:
        from ..models.progressive import ProgressiveCoder

        coder = ProgressiveCoder(model, params, name=args.preset)
    else:
        coder = ChannelCoder(model, params, name=args.preset, rate=args.rate)

    import os

    if args.progressive and not os.path.isdir(args.input):
        _run_progressive(args, coder)
        return
    if os.path.isdir(args.input):
        _run_dir(args, coder, model, params)
        return

    if args.command == "compress":
        img = load_image_uint8(args.input).astype(np.float32) / 127.5 - 1.0
        x = jnp.asarray(img[None])
        h, w = img.shape[:2]
        rate = None
        if args.target_bpp is not None:
            from ..serving.rate_control import solve_rate_for_bpp

            rate, est = solve_rate_for_bpp(model, params, x, args.target_bpp)
            print(f"target {args.target_bpp} bpp → rate {rate:.3f} "
                  f"(estimated {est:.4f} bpp)")
        blob = coder.compress(x, rate=rate)  # pads to /64 internally
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


def _run_progressive(args, coder) -> None:
    """Single-file progressive compress/decompress (.ltcp streams)."""
    import numpy as np

    from ..data.datasets import load_image_uint8

    if args.command == "compress":
        import jax.numpy as jnp

        img = load_image_uint8(args.input).astype(np.float32) / 127.5 - 1.0
        x = jnp.asarray(img[None])
        blob = coder.compress(x)
        with open(args.output, "wb") as fd:
            fd.write(blob)
        h, w = img.shape[:2]
        pts = coder.truncation_points(blob)
        print(
            f"{args.input} → {args.output}: {len(blob)} bytes "
            f"({len(blob) * 8 / (h * w):.4f} bpp), {pts[-1][0]} planes; "
            "truncation points (planes → bpp): "
            + ", ".join(f"{p}→{b * 8 / (h * w):.3f}" for p, b in pts)
        )
    else:
        from PIL import Image

        with open(args.input, "rb") as fd:
            blob = fd.read()
        rec = np.asarray(coder.decompress(blob, max_planes=args.truncate_planes))[0]
        img = np.clip((rec + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(args.output)
        tag = "" if args.truncate_planes is None else (
            f" (truncated to {args.truncate_planes} planes)"
        )
        print(f"{args.input} → {args.output}: {img.shape[1]}x{img.shape[0]}{tag}")


def _run_dir(args, coder, model=None, params=None) -> None:
    """Directory batch mode: size-bucketed batched device pipeline."""
    import os
    from collections import defaultdict

    import jax.numpy as jnp
    import numpy as np

    from ..data.datasets import load_image_uint8

    os.makedirs(args.output, exist_ok=True)
    # the NS wavefront decodes per image through its own device scan
    batched = not coder.is_ns

    if args.command == "compress":
        exts = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")
        names = sorted(
            n for n in os.listdir(args.input) if n.lower().endswith(exts)
        )
        buckets = defaultdict(list)
        for n in names:
            img = (
                load_image_uint8(os.path.join(args.input, n))
                .astype(np.float32) / 127.5 - 1.0
            )
            buckets[img.shape[:2]].append((n, img))
        total_bits = total_px = 0
        for (h, w), items in buckets.items():
            for i in range(0, len(items), max(1, args.batch)):
                chunk = items[i : i + max(1, args.batch)]
                rates = None
                if args.target_bpp is not None:
                    from ..serving.rate_control import solve_rate_for_bpp

                    rates = [
                        solve_rate_for_bpp(
                            model, params, jnp.asarray(im[None]),
                            args.target_bpp,
                        )[0]
                        for _, im in chunk
                    ]
                if batched and len(chunk) > 1:
                    xs = jnp.asarray(np.stack([im for _, im in chunk]))
                    blobs = coder.compress_batch(xs, rates=rates)
                else:
                    blobs = [
                        coder.compress(
                            jnp.asarray(im[None]),
                            rate=None if rates is None else rates[k],
                        )
                        for k, (_, im) in enumerate(chunk)
                    ]
                for (n, _), blob in zip(chunk, blobs):
                    out = os.path.join(
                        args.output, os.path.splitext(n)[0] + ".ltc"
                    )
                    with open(out, "wb") as fd:
                        fd.write(blob)
                    total_bits += len(blob) * 8
                    total_px += h * w
                    print(f"{n} → {out}: {len(blob)} bytes "
                          f"({len(blob) * 8 / (h * w):.4f} bpp)")
        if total_px:
            print(f"avg: {total_bits / total_px:.4f} bpp over {len(names)} files")
    else:
        from PIL import Image

        names = sorted(
            n for n in os.listdir(args.input) if n.lower().endswith(".ltc")
        )
        buckets = defaultdict(list)
        for n in names:
            with open(os.path.join(args.input, n), "rb") as fd:
                blob = fd.read()
            _, h, w, _ = coder._parse_header(blob)
            buckets[(h, w)].append((n, blob))
        for (h, w), items in buckets.items():
            for i in range(0, len(items), max(1, args.batch)):
                chunk = items[i : i + max(1, args.batch)]
                if batched and len(chunk) > 1:
                    recs = np.asarray(
                        coder.decompress_batch([b for _, b in chunk])
                    )
                else:
                    recs = [
                        np.asarray(coder.decompress(b))[0] for _, b in chunk
                    ]
                for (n, _), rec in zip(chunk, recs):
                    img = np.clip((rec + 1.0) * 127.5, 0, 255).astype(np.uint8)
                    out = os.path.join(
                        args.output, os.path.splitext(n)[0] + ".png"
                    )
                    Image.fromarray(img).save(out)
                    print(f"{n} → {out}: {img.shape[1]}x{img.shape[0]}")


if __name__ == "__main__":
    main()
