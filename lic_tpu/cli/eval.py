"""Evaluation CLI — mirrors ``eval_net.py:202-254``'s flags; evaluates the
FULL image set (the reference evaluated a single hard-coded Kodak image,
``eval_net.py:31`` — defect §8.3, fixed).

Usage:
    python -m lic_tpu.cli.eval --data_path /data/kodak \
        --weight_path ckpt/final.npz --preset net_ga --lmbda 0.0067
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lic_tpu evaluator")
    p.add_argument("--data_path", required=True)
    p.add_argument("--weight_path", required=True)
    p.add_argument("--preset", default="net_ga")
    p.add_argument("--lmbda", type=float, default=0.0067,
                   help="finetune λ (reference default, eval_net.py:236)")
    p.add_argument("--high", action="store_true")
    p.add_argument("--post_processing", action="store_true")
    p.add_argument("--pre_processing", action="store_true",
                   help="content-adaptive per-image encoder finetuning")
    p.add_argument("--tune_iter", type=int, default=100)
    p.add_argument("--write_bitstreams", default="",
                   help="directory to write real rANS bitstreams (decodable "
                        "presets only)")
    p.add_argument("--rate", type=float, default=None,
                   help="gain-unit rate index for variable-rate presets "
                        "(continuous; None = unit 0)")
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

    from ..config import EvalConfig
    from ..evaluation import evaluate_folder
    from ..models import build_model
    from ..utils.checkpoint import load_params

    model = build_model(
        args.preset, is_high=args.high, post_processing=args.post_processing
    )
    if args.rate is not None and model.cfg.gain_units == 0:
        raise SystemExit(
            f"--rate given but preset '{args.preset}' has no gain units — "
            "it would be silently ignored (use a variable-rate preset)"
        )
    sample = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        sample, training=True,
    )
    params = load_params(args.weight_path, variables["params"])

    ec = EvalConfig(lmbda=args.lmbda, tune_iters=args.tune_iter,
                    rate=args.rate)
    evaluate_folder(
        model, params, args.data_path, ec, pre_processing=args.pre_processing
    )

    if args.write_bitstreams:
        import os

        from ..data.datasets import list_images, load_image_uint8
        from ..models.compress import ChannelCoder

        os.makedirs(args.write_bitstreams, exist_ok=True)
        coder = ChannelCoder(model, params, name=args.preset, rate=args.rate)
        for f in list_images(args.data_path):
            img = load_image_uint8(f).astype(np.float32) / 127.5 - 1.0
            blob = coder.compress(jnp.asarray(img[None]))
            out = os.path.join(
                args.write_bitstreams,
                os.path.splitext(os.path.basename(f))[0] + ".ltc",
            )
            with open(out, "wb") as fd:
                fd.write(blob)
            print(f"{f} → {out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
