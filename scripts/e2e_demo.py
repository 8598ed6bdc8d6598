"""End-to-end demo on real hardware: train briefly → evaluate → emit a real
rANS bitstream → decode → verify reconstruction parity and real-vs-estimated
bpp.  The full workflow of the reference (train_net_unet.py + eval_net.py)
plus the bitstream capability it never had.

Usage: python scripts/e2e_demo.py [steps]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lic_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300

    from scripts.train_sanity import structured_batch
    from lic_tpu.config import EvalConfig, TrainConfig
    from lic_tpu.evaluation import evaluate_image
    from lic_tpu.models import build_model
    from lic_tpu.models.compress import ChannelCoder
    from lic_tpu.training.train import create_state, make_optimizer, make_train_step

    model = build_model("source_net")
    tc = TrainConfig(lmbda=0.01, lr=1e-4)
    opt = make_optimizer(tc, steps_per_epoch=1000)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(structured_batch(rng, b=8, size=256))
    state = create_state(model, opt, batch, seed=0)
    step = jax.jit(make_train_step(model, tc, opt), donate_argnums=(0,))

    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, batch)
        if i % 50 == 0:
            print(
                f"step {i}: loss={float(metrics['loss']):.3f} "
                f"bpp={float(metrics['bpp']):.3f} mse={float(metrics['mse']):.5f}",
                flush=True,
            )
    print(f"trained {steps} steps in {time.time()-t0:.0f}s", flush=True)

    # held-out structured image
    test = jnp.asarray(structured_batch(np.random.default_rng(99), b=1, size=256))
    r = evaluate_image(model, state.params, test, EvalConfig())
    print(
        f"eval: bpp={r['bpp']:.4f} psnr={r['psnr']:.2f}dB "
        f"msssim={r['msssim']:.4f} t={r['seconds']:.3f}s",
        flush=True,
    )

    coder = ChannelCoder(model, state.params)
    blob = coder.compress(test)
    rec = np.asarray(coder.decompress(blob))
    rec2 = np.asarray(coder.decompress(blob))
    real_bpp = len(blob) * 8 / (256 * 256)
    out = model.apply({"params": state.params}, test, training=False)
    fwd = np.asarray(out.x_tilde)
    # decode must be bit-deterministic; vs the monolithic jitted forward,
    # XLA fuses the stand-alone decode programs differently, so μ can move
    # by 1 ulp and flip symbols at .5 boundaries — assert closeness in PSNR.
    assert np.array_equal(rec, rec2), "decode is non-deterministic"
    diff_mse = float(np.mean((rec - fwd) ** 2))
    diff_psnr = 10 * np.log10(4.0 / max(diff_mse, 1e-12))
    print(
        f"bitstream: {len(blob)} bytes → real_bpp={real_bpp:.4f} "
        f"(estimated {float(out.bpp):.4f}); decode-vs-forward "
        f"psnr={diff_psnr:.1f}dB maxdiff={np.abs(rec-fwd).max():.4g}",
        flush=True,
    )
    assert diff_psnr > 35.0, "decoded reconstruction diverged from forward"
    assert real_bpp < float(out.bpp) * 1.25 + 0.3, "real bpp far off estimate"
    print("E2E_OK", flush=True)


if __name__ == "__main__":
    main()
