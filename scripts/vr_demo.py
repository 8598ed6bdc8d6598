"""Variable-rate checkpoint demo: everything VERDICT's "one checkpoint
vs four" claim needs, measured on trained weights.

On a trained ``source_net_vr`` checkpoint (gain units — the capability
that replaces the reference's one-~1k-line-file-per-λ workflow, e.g.
``/root/reference/model/Net_unet_005_5.py``) this:

1. evaluates the held-out image at every INTEGER rate AND at
   interpolated (continuous) rates with REAL bitstreams — the integer
   points replicate train_real's eval.json, the fractional ones show
   continuous rate interpolation actually lands between them;
2. solves ``--target_bpp`` by bisection (`solve_rate_for_bpp`) and
   round-trips the solved operating point through the bitstream path;
3. runs a mixed-rate ``CodecService`` batch — several requests at
   DIFFERENT rates sharing one dynamic batch — and verifies each
   request decodes back at its own rate's quality.

Usage: python scripts/vr_demo.py --ckpt rd_runs/v2_src_vr/params.npz \
           [--preset source_net_vr] [--out rd_runs/v2_src_vr/vr_demo.json]
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
    ap.add_argument("--preset", default="source_net_vr")
    ap.add_argument("--target_bpp", type=float, default=0.55)
    ap.add_argument("--image", default=HELD_OUT,
                    help="override the eval image (CPU smoke tests)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.data.datasets import load_image_uint8
    from lic_tpu.data.pad import pad_to_multiple
    from lic_tpu.models import build_model
    from lic_tpu.models.compress import ChannelCoder
    from lic_tpu.serving import CodecService, solve_rate_for_bpp
    from lic_tpu.utils.checkpoint import load_params

    model = build_model(args.preset)
    K = int(model.cfg.gain_units)
    img = load_image_uint8(args.image).astype(np.float32) / 127.5 - 1.0
    x = jnp.asarray(img[None])
    x_init, _ = pad_to_multiple(x)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x_init, training=True,
    )
    params = load_params(args.ckpt, variables["params"])
    npx = img.shape[0] * img.shape[1]
    ref255 = np.round((np.asarray(x[0]) + 1.0) * 127.5)

    def psnr(rec) -> float:
        dec = np.round((np.asarray(rec)[0] + 1.0) * 127.5)
        return float(10 * np.log10(255.0 ** 2 / np.mean((dec - ref255) ** 2)))

    coder = ChannelCoder(model, params, name=args.preset)

    def rd_at(rate: float) -> dict:
        blob = coder.compress(x, rate=rate)
        rec = coder.decompress(blob)  # rate rides the bitstream header
        out = {
            "rate": round(rate, 3),
            "bpp_real_bitstream": round(len(blob) * 8 / npx, 4),
            "psnr_decoded": round(psnr(rec), 3),
        }
        print("rate sweep:", out, flush=True)
        return out

    # 1. integer + interpolated operating points, one checkpoint
    rates = [float(k) for k in range(K)]
    rates += [0.5, K - 1.5]  # continuous interpolation between units
    sweep = [rd_at(r) for r in sorted(set(rates))]

    # 2. target-bpp bisection + real-bitstream roundtrip of the solution
    rate, est = solve_rate_for_bpp(
        model, params, x, args.target_bpp, tol=0.02, max_iters=16
    )
    blob = coder.compress(x, rate=rate)
    rec = coder.decompress(blob)
    target = {
        "target_bpp": args.target_bpp,
        "solved_rate": round(float(rate), 4),
        "bpp_estimated": round(float(est), 4),
        "bpp_real_bitstream": round(len(blob) * 8 / npx, 4),
        "psnr_decoded": round(psnr(rec), 3),
    }
    print("target-bpp:", target, flush=True)

    # 3. mixed-rate dynamic batch through CodecService: three crops of
    # the held-out image at three different rates in ONE service, then
    # decode each blob back (all crops share one shape bucket, so the
    # compress side genuinely batches mixed rates on device)
    crop = np.asarray(x[0, :256, :256, :])
    crops = [crop, crop[::-1].copy(), crop[:, ::-1].copy()]
    svc_rates = [0.0, (K - 1) / 2.0, float(K - 1)]
    svc = CodecService(model, params, name=args.preset, max_wait_ms=50.0)
    svc.start()
    try:
        futs = [
            svc.submit_compress(c, rate=r) for c, r in zip(crops, svc_rates)
        ]
        blobs = [f.result(timeout=600) for f in futs]
        dfuts = [svc.submit_decompress(b) for b in blobs]
        recs = [f.result(timeout=600) for f in dfuts]
        stats = svc.stats.snapshot()
    finally:
        svc.stop()
    mixed = []
    for c, r, b, rec in zip(crops, svc_rates, blobs, recs):
        c255 = np.round((c + 1.0) * 127.5)
        d255 = np.round((np.asarray(rec) + 1.0) * 127.5)
        mixed.append({
            "rate": round(r, 2),
            "bpp_real_bitstream": round(len(b) * 8 / (256 * 256), 4),
            "psnr_decoded": round(
                float(10 * np.log10(255.0 ** 2 / np.mean((d255 - c255) ** 2))), 3
            ),
        })
    print("mixed-rate service batch:", mixed, flush=True)
    bpps = [m["bpp_real_bitstream"] for m in mixed]
    assert bpps == sorted(bpps), (
        "mixed-rate batch: bpp must increase with the rate index"
    )

    result = {
        "preset": args.preset,
        "ckpt": args.ckpt,
        "gain_units": K,
        "image": os.path.basename(args.image),
        "rate_sweep": sweep,
        "target_bpp_solve": target,
        "mixed_rate_service": {"requests": mixed, "stats": stats},
    }
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
