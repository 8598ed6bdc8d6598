"""Content-adaptive encoding demo: the reference's per-image encoder
overfit (``eval_net.py:118-199``) on the held-out image, reporting the
before/after RD delta with REAL bitstreams.

Only g_a moves, so the tuned latents stay decodable with the untouched
decoder/entropy params — verified here by decoding the tuned bitstream.

Usage: python scripts/tune_demo.py --ckpt rd_runs/v2_flagship_0.0067/params.npz \
           --preset net_unet_ha_hs_dec --lmbda 0.0067 [--tune_iter 100]
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
    ap.add_argument("--preset", default="net_unet_ha_hs_dec")
    ap.add_argument("--lmbda", type=float, default=0.0067)
    ap.add_argument("--tune_iter", type=int, default=100)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.config import EvalConfig
    from lic_tpu.data.datasets import load_image_uint8
    from lic_tpu.evaluation import content_adaptive_finetune, evaluate_image
    from lic_tpu.models import build_model
    from lic_tpu.models.compress import ChannelCoder
    from lic_tpu.utils.checkpoint import load_params

    model = build_model(args.preset)
    img = load_image_uint8(HELD_OUT).astype(np.float32) / 127.5 - 1.0
    x = jnp.asarray(img[None])
    # evaluate_image / finetune / ChannelCoder all pad internally, but
    # model.init sees the raw tensor — a non-/64 image breaks the charm
    # slice concat at trace time, so init on the padded shape
    from lic_tpu.data.pad import pad_to_multiple

    x_init, _ = pad_to_multiple(x)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x_init, training=True,
    )
    params = load_params(args.ckpt, variables["params"])
    ec = EvalConfig(lmbda=args.lmbda, tune_iters=args.tune_iter)

    def rd(p, tag):
        r = evaluate_image(model, p, x, ec)
        coder = ChannelCoder(model, p, name=args.preset)
        blob = coder.compress(x)
        rec = np.asarray(coder.decompress(blob))
        ref = (np.asarray(x[0]) + 1.0) * 127.5
        dec = (rec[0] + 1.0) * 127.5
        psnr_dec = 10 * np.log10(255.0 ** 2 / np.mean((np.round(dec) - np.round(ref)) ** 2))
        out = {
            "bpp_estimated": round(float(r["bpp"]), 4),
            "psnr_255": round(float(r["psnr"]), 3),
            "bpp_real_bitstream": round(
                len(blob) * 8 / (img.shape[0] * img.shape[1]), 4
            ),
            "psnr_decoded": round(float(psnr_dec), 3),
        }
        print(tag, out)
        return out

    before = rd(params, "before tune:")
    tuned = content_adaptive_finetune(model, params, x, ec)
    after = rd(tuned, f"after {args.tune_iter} tune iters:")

    result = {
        "preset": args.preset,
        "lmbda": args.lmbda,
        "tune_iter": args.tune_iter,
        "image": "grace_hopper (held out)",
        "before": before,
        "after": after,
        "delta_psnr_decoded": round(
            after["psnr_decoded"] - before["psnr_decoded"], 3
        ),
        "delta_bpp_real": round(
            after["bpp_real_bitstream"] - before["bpp_real_bitstream"], 4
        ),
    }
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
