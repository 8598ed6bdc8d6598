"""Stage-level timing of a preset's eval forward on the real device.

Times each sub-pass of the codec (g_a, hyper encode/decode, per-slice
entropy params, g_s + decode tail) plus the fused full forward, so
optimization effort goes where the milliseconds are (the round-2 analysis
in docs/PERF.md covered source_net only; the flagship's profile is
different — rich transforms, SWAtten, U-Net hyper).

Usage: python scripts/profile_flagship.py [--preset net_unet_ha_hs_dec]
       [--h 512] [--w 768] [--batch 8] [--dtype bf16]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x[0] if isinstance(x, tuple) else x)[0])


def _burst(f, *args, iters, repeats=3):
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        vals.append((time.perf_counter() - t0) / iters * 1e3)
    return statistics.median(vals)


def timeit(f, *args, iters=None, repeats=3):
    """TRUE per-iter ms via a two-point (10, 50) slope fit.

    A timing burst through the axon tunnel pays a ~35 ms flush/startup
    cost plus ~0.1 ms per dispatch (probe_conv_r5 harness-floor section),
    so single-burst timings at iters=10 overstate every stage by
    ~3.5 ms.  The slope between two burst sizes cancels the constant.
    """
    out = f(*args)
    fence(out)
    lo, hi = 10, 50
    t_lo = _burst(f, *args, iters=lo, repeats=repeats)
    t_hi = _burst(f, *args, iters=hi, repeats=repeats)
    return (t_hi * hi - t_lo * lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="net_unet_ha_hs_dec")
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=768)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = ap.parse_args()

    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.models import CodecModel, build_model
    from lic_tpu.utils.amp import bf16_params

    model = build_model(args.preset)
    cfg = model.cfg
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, (args.batch, args.h, args.w, 3)).astype(np.float32)
    )
    init = jax.jit(
        lambda k, xx: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
        )
    )
    params = init(jax.random.PRNGKey(0), x)["params"]
    if args.dtype == "bf16":
        params = bf16_params(params)
        x = x.astype(jnp.bfloat16)
    params = jax.device_put(params)

    ap_ = lambda method: jax.jit(
        lambda p, *a: model.apply({"params": p}, *a, method=method)
    )

    mp_batch = args.h * args.w * args.batch / 1e6
    print(f"preset={args.preset} {args.h}x{args.w} b{args.batch} {args.dtype}")

    analyze = ap_(CodecModel.analyze)
    z3 = analyze(params, x)
    t = timeit(analyze, params, x)
    print(f"  g_a (analyze):            {t:8.2f} ms")

    henc = ap_(CodecModel.hyper_encode)
    z = henc(params, z3)
    t = timeit(henc, params, z3)
    print(f"  hyper encode:             {t:8.2f} ms  (z {tuple(z.shape)})")

    hdec = ap_(CodecModel.hyper_decode)
    scales, means = hdec(params, z)
    t = timeit(hdec, params, z)
    print(f"  hyper decode:             {t:8.2f} ms")

    if cfg.syntax != "none":
        syn = ap_(CodecModel.syntax_from_latent)
        sv = syn(params, z3)
        t = timeit(syn, params, z3)
        print(f"  syntax vector:            {t:8.2f} ms")
    else:
        sv = None

    # per-slice entropy params with realistic supports (slice index must be
    # STATIC — it selects modules; close over it like ChannelCoder does)
    y_slices = jnp.split(z3, cfg.num_slices, axis=-1)
    sup = []
    tot_ep = 0.0
    for i in range(cfg.num_slices):
        eparams_i = jax.jit(
            lambda p, m, sc, ss, i=i: model.apply(
                {"params": p}, m, sc, ss, i,
                method=CodecModel.charm_entropy_params,
            )
        )
        s = tuple(sup[: cfg.max_support_slices]) if cfg.max_support_slices >= 0 else tuple(sup)
        t = timeit(eparams_i, params, means, scales, s)
        tot_ep += t
        print(f"  slice {i} entropy params:   {t:8.2f} ms")
        sup.append(y_slices[i])

    synth = ap_(CodecModel.synthesize)
    t = timeit(synth, params, z3, sv)
    print(f"  g_s + tail (synthesize):  {t:8.2f} ms")

    @jax.jit
    def full(p, xx):
        out = model.apply({"params": p}, xx, training=False)
        return out.x_tilde, out.bpp

    t = timeit(full, params, x)
    print(f"  FULL eval forward:        {t:8.2f} ms  -> {mp_batch / (t / 1e3):6.1f} MP/s")


if __name__ == "__main__":
    main()
