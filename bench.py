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


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from lic_tpu.models import build_model

    h, w = 512, 768  # Kodak-sized
    model = build_model("source_net")
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
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

    # warmup / compile
    out = forward(params, x)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    mps = (h * w * iters) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "encode_decode_throughput",
                "value": round(mps, 3),
                "unit": "megapixels/sec/chip",
                "vs_baseline": round(mps / BASELINE_MPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
