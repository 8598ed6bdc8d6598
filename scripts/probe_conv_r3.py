"""TPU probe: why do the flagship's 192-ch stride-1 convs run at ~32 TF/s?

The round-2 lowering search measured dense stride-1 convs at ~80 TF/s, but
profile_ga shows conv3x3 192ch @128x192 b8 at 4.06 ms = 32 TF/s.  This
sweeps spatial/batch shapes, dtypes and alternative lowerings (flattened
1x1-as-matmul bound, explicit im2col matmul) to find the efficient regime
for the wam0-stage convs.  Run via the rd_runs queue.
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

    rng = np.random.default_rng(0)

    def conv_fn(k, stride=1):
        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        return jax.jit(f)

    print("conv3x3 192->192 sweep (bf16, fp32 accum):")
    for (b, h, w) in [(8, 128, 192), (8, 256, 384), (32, 128, 192),
                      (1, 128, 192), (8, 64, 96)]:
        x = jnp.asarray(
            rng.standard_normal((b, h, w, 192)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wgt = jnp.asarray(
            rng.standard_normal((3, 3, 192, 192)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        ms = timeit(conv_fn(3), x, wgt)
        gf = 2 * 9 * 192 * 192 * b * h * w / 1e9
        print(f"  b{b:2d} {h}x{w}: {ms:7.2f} ms  {gf/ms:6.1f} TF/s", flush=True)
        del x, wgt
        jax.clear_caches()

    print("conv3x3 192->192 @8x128x192, bf16 accum (no preferred fp32):")
    x = jnp.asarray(
        rng.standard_normal((8, 128, 192, 192)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wgt = jnp.asarray(
        rng.standard_normal((3, 3, 192, 192)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    f_bf = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    ms = timeit(f_bf, x, wgt)
    print(f"  {ms:7.2f} ms  {130.6/ms:6.1f} TF/s")

    jax.clear_caches()
    print("1x1-as-matmul bound (same MACs as one of 9 taps x 9):", flush=True)
    xm = x.reshape(-1, 192)
    wm = jnp.asarray(
        rng.standard_normal((192, 9 * 192)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    f_mm = jax.jit(
        lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    )
    ms = timeit(f_mm, xm, wm)
    gf = 2 * xm.shape[0] * 192 * 9 * 192 / 1e9
    print(f"  matmul (196608,192)x(192,1728): {ms:7.2f} ms  {gf/ms:6.1f} TF/s")

    print("explicit im2col (9 shifted views concat) + matmul:")

    def im2col_conv(x, w):  # w: (3,3,192,192)
        b, h, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, i : i + h, j : j + ww, :] for i in range(3) for j in range(3)
        ]
        a = jnp.concatenate(cols, axis=-1).reshape(-1, 9 * c)
        return jnp.dot(
            a, w.reshape(9 * c, -1), preferred_element_type=jnp.float32
        )

    f_ic = jax.jit(im2col_conv)
    ms = timeit(f_ic, x, wgt)
    print(f"  {ms:7.2f} ms  {130.6/ms:6.1f} TF/s")

    print("conv7x7 192->192 @8x128x192 (the wam0 7x7, 710 GF):")
    w7 = jnp.asarray(
        rng.standard_normal((7, 7, 192, 192)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)
    ms = timeit(conv_fn(7), x, w7)
    print(f"  XLA: {ms:7.2f} ms  {710.0/ms:6.1f} TF/s")


if __name__ == "__main__":
    main()
