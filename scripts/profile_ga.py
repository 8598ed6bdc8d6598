"""Stage-level timing of the RICH analysis transform (the flagship's g_a
measured at 104.8 ms of the forward — scripts/profile_flagship.py).

Times each stage standalone at its in-model shape so the 104.8 ms gets an
itemized bill.  Run on the real device.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timeit(f, *args, iters=10, repeats=3):
    out = f(*args)
    fence(out)
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        vals.append((time.perf_counter() - t0) / iters * 1e3)
    return statistics.median(vals)


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.layers import (
        GDN,
        Conv2d,
        ResidualBlockWithStride,
        ResidualBottleneck,
        WinNoShiftAttention,
    )
    from lic_tpu.utils.amp import bf16_params

    rng = np.random.default_rng(0)
    n = 192

    def stage(name, module, shape, dtype=jnp.bfloat16):
        x = jnp.asarray(
            rng.standard_normal((8,) + shape).astype(np.float32)
        ).astype(dtype)
        params = module.init(jax.random.PRNGKey(0), x)["params"]
        params = bf16_params(params)
        f = jax.jit(lambda p, xx: module.apply({"params": p}, xx))
        t = timeit(f, params, x)
        print(f"  {name:34s} {t:8.2f} ms")
        return t

    print("rich g_a stage bill @512x768 b8 bf16 (shapes as in-model):")
    tot = 0.0
    tot += stage("rb0 x1  RB(3) @512x768", ResidualBottleneck(3), (512, 768, 3))
    tot += stage("rbs0    RBS(3->192 s2) @512x768",
                 ResidualBlockWithStride(n, 2), (512, 768, 3))
    tot += stage("gdn0    GDN(192) @256x384", GDN(n), (256, 384, n))
    tot += stage("down1   conv5s2 @256x384",
                 Conv2d(n, kernel_size=5, stride=2, padding=(1, 2, 1, 2)),
                 (256, 384, n))
    tot += stage("gdn1    GDN(192) @128x192", GDN(n), (128, 192, n))
    tot += stage("wam0    WAM(ws8,ss4) @128x192",
                 WinNoShiftAttention(n, 8, 8, 4), (128, 192, n))
    tot += stage("rb1 x1  RB(192) @128x192", ResidualBottleneck(n), (128, 192, n))
    tot += stage("rbs1    RBS(192 s2) @128x192",
                 ResidualBlockWithStride(n, 2), (128, 192, n))
    tot += stage("gdn2    GDN(192) @64x96", GDN(n), (64, 96, n))
    tot += stage("down3   conv5s2 @64x96",
                 Conv2d(n, kernel_size=5, stride=2, padding=(1, 2, 1, 2)),
                 (64, 96, n))
    tot += stage("wam1    WAM(ws4,ss2) @32x48",
                 WinNoShiftAttention(n, 8, 4, 2), (32, 48, n))
    print(f"  {'sum (rb0/rb1 counted once of 3)':34s} {tot:8.2f} ms")

    # ---- wam0 internals @128x192 (the 52 ms hotspot) -----------------
    from lic_tpu.layers import ResidualBlock, WinBasedAttention

    print("wam0 internals @128x192 b8 bf16:")
    stage("conv3x3 192ch (130.5 GF)",
          Conv2d(n, kernel_size=3, padding=1), (128, 192, n))
    stage("conv7x7 192ch (710 GF)",
          Conv2d(n, kernel_size=7, padding=3), (128, 192, n))
    stage("conv1x1 192ch (14.5 GF)",
          Conv2d(n, kernel_size=1), (128, 192, n))
    stage("ResidualBlock(192) x1 of 6",
          ResidualBlock(n), (128, 192, n))
    stage("WinBasedAttention ws8 ss4 x1 of 4",
          WinBasedAttention(dim=n, num_heads=8, window_size=8, shift_size=4),
          (128, 192, n))


if __name__ == "__main__":
    main()
