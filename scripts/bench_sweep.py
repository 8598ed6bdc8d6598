"""Throughput sweep over batch size / dtype for the bench model.

Finds the best operating point for bench.py (the tunneled host adds heavy
variance — medians over repeats).  Usage:

    python scripts/bench_sweep.py [--batches 4,6,8,10,12] [--iters 10]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,6,8,10,12,16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--preset", default="source_net")
    args = ap.parse_args()

    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.models import build_model
    from lic_tpu.utils.amp import bf16_params

    h, w = 512, 768
    model = build_model(args.preset)

    for batch in [int(b) for b in args.batches.split(",")]:
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
        def forward(p, xx):
            out = model.apply({"params": p}, xx, training=False)
            return out.x_tilde, out.bpp

        mp_batch = h * w * batch / 1e6
        for tag, p, xx in (
            ("fp32", params, x),
            ("bf16", bf16_params(params), x.astype(jnp.bfloat16)),
        ):
            out = forward(p, xx); float(out[1])  # warmup; host-fetch fence
            vals = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = forward(p, xx)
                float(out[1])
                vals.append(mp_batch * args.iters / (time.perf_counter() - t0))
            print(
                f"batch {batch:3d} {tag}: median {statistics.median(vals):7.2f}"
                f"  max {max(vals):7.2f}  MP/s  {sorted(round(v,1) for v in vals)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
