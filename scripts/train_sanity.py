"""Training sanity run on real hardware: overfit structured synthetic images
and verify the R-D loss and reconstruction quality improve.

Usage: python scripts/train_sanity.py [preset] [steps]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lic_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def structured_batch(rng, b=8, size=256):
    """Piecewise-smooth synthetic images (gradients + rectangles + noise)."""
    xs = np.linspace(-1, 1, size, dtype=np.float32)
    imgs = np.zeros((b, size, size, 3), np.float32)
    for i in range(b):
        gx, gy = rng.uniform(-1, 1, 2)
        imgs[i] = (gx * xs[None, :, None] + gy * xs[:, None, None]) * 0.5
        for _ in range(6):
            x0, y0 = rng.integers(0, size - 40, 2)
            w, h = rng.integers(20, 100, 2)
            col = rng.uniform(-1, 1, 3)
            imgs[i, y0 : y0 + h, x0 : x0 + w] = col
        imgs[i] += rng.normal(0, 0.02, (size, size, 3))
    return np.clip(imgs, -1, 1)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "source_net"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120

    from lic_tpu.config import TrainConfig
    from lic_tpu.models import build_model
    from lic_tpu.training.train import create_state, make_optimizer, make_train_step

    model = build_model(preset)
    tc = TrainConfig(lmbda=0.01, lr=1e-4, batch_size=8, crop_size=256)
    opt = make_optimizer(tc, steps_per_epoch=1000)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(structured_batch(rng))
    t0 = time.time()
    state = create_state(model, opt, batch, seed=0)
    print(f"init {time.time()-t0:.1f}s", flush=True)

    step = jax.jit(make_train_step(model, tc, opt), donate_argnums=(0,))
    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, batch)
        if i % 20 == 0 or i == steps - 1:
            print(
                f"step {i:4d} loss={float(metrics['loss']):9.4f} "
                f"bpp={float(metrics['bpp']):7.4f} "
                f"mse={float(metrics['mse']):8.6f} "
                f"psnr(pm1)={-10*np.log10(max(float(metrics['mse']),1e-9))/1:5.2f} "
                f"t={time.time()-t0:6.1f}s",
                flush=True,
            )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
