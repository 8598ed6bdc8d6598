"""Multi-rate R-D sweep: train one model per λ and report the rate-
distortion curve — the reference's multi-λ workflow (λ flags +
``--high``; BASELINE.md operating points) as one driver.

Usage: python scripts/rd_sweep.py [preset] [steps_per_point]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lic_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

LAMBDAS = (0.0025, 0.0067, 0.0250, 0.0500)  # reference operating points


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "source_net"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    from scripts.train_sanity import structured_batch
    from lic_tpu.config import EvalConfig, TrainConfig
    from lic_tpu.evaluation import evaluate_image
    from lic_tpu.models import build_model
    from lic_tpu.training.train import create_state, make_optimizer, make_train_step

    model = build_model(preset)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(structured_batch(rng, b=8, size=256))
    test = jnp.asarray(structured_batch(np.random.default_rng(99), b=1, size=256))

    results = []
    for lmbda in LAMBDAS:
        tc = TrainConfig(lmbda=lmbda, lr=1e-4)
        opt = make_optimizer(tc, steps_per_epoch=10 ** 6)
        state = create_state(model, opt, batch, seed=0)
        step = jax.jit(make_train_step(model, tc, opt), donate_argnums=(0,))
        t0 = time.time()
        for _ in range(steps):
            state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        r = evaluate_image(model, state.params, test, EvalConfig())
        results.append((lmbda, r["bpp"], r["psnr"], r["msssim"]))
        print(
            f"λ={lmbda:<7g} bpp={r['bpp']:.4f} psnr={r['psnr']:.2f} "
            f"msssim={r['msssim']:.4f}  (train loss {loss:.3f}, "
            f"{time.time()-t0:.0f}s)",
            flush=True,
        )

    print("\nRD curve (bpp, PSNR):", flush=True)
    for lmbda, bpp, psnr, ms in results:
        print(f"  {bpp:.4f}\t{psnr:.2f}\t{ms:.4f}\t(λ={lmbda})", flush=True)
    # monotonicity check: higher λ → higher rate and quality
    bpps = [r[1] for r in results]
    psnrs = [r[2] for r in results]
    mono = all(b2 >= b1 * 0.9 for b1, b2 in zip(bpps, bpps[1:])) and all(
        p2 >= p1 - 0.5 for p1, p2 in zip(psnrs, psnrs[1:])
    )
    print(f"monotone RD: {mono}", flush=True)


if __name__ == "__main__":
    main()
