"""Round-3 lowering probes on the real device.

Measures the two new conv lowerings against round-2's best:

1. narrow-input (C_in=3) entry conv 5x5/s2 @512x768: XLA strided vs
   im2col (``conv.py::_conv_im2col``) — the MXU-starved 6.7 ms stage.
2. wide conv5s2 stages (192->192 @256x384, @128x192): XLA strided vs
   Pallas v1 (XLA phase-split prep) vs Pallas v2 (fused DMA gather).

Fenced timing (host fetch of a scalar depending on the output — see
docs/PERF.md "Measurement integrity").
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


def timeit(f, *args, iters=10, repeats=5):
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
    from jax import lax

    from lic_tpu.layers.conv import _conv_im2col, _norm_padding
    from lic_tpu.layers.pallas_conv import conv5s2_pallas, conv5s2_pallas_v2

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def xla_conv(x, k, stride=2, padding=(1, 2, 1, 2)):
        return lax.conv_general_dilated(
            x, k, (stride, stride), _norm_padding(padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    xla_j = jax.jit(xla_conv, static_argnames=())
    im2col_j = jax.jit(
        lambda x, k: _conv_im2col(x, k, 2, (1, 2, 1, 2))
    )

    from lic_tpu.layers.s2d_conv import conv5s2_s2d

    s2d_j = jax.jit(conv5s2_s2d)

    print("== l1 entry conv 3->192 @512x768 b8 (bf16) ==")
    x = jnp.asarray(
        rng.standard_normal((8, 512, 768, 3)).astype(np.float32)
    ).astype(dt)
    k = jnp.asarray(
        rng.standard_normal((5, 5, 3, 192)).astype(np.float32) * 0.05
    ).astype(dt)
    gf = 2 * 8 * 256 * 384 * 25 * 3 * 192 / 1e9
    t = timeit(lambda: xla_j(x, k))
    print(f"  XLA strided : {t:7.2f} ms  {gf / t:6.1f} TF/s")
    t = timeit(lambda: im2col_j(x, k))
    print(f"  im2col      : {t:7.2f} ms  {gf / t:6.1f} TF/s")
    t = timeit(lambda: s2d_j(x, k))
    print(f"  s2d 3x3     : {t:7.2f} ms  {gf / t:6.1f} TF/s")
    from lic_tpu.layers.s2d_conv import conv_s2d_im2col

    s2i_j = jax.jit(conv_s2d_im2col)
    t = timeit(lambda: s2i_j(x, k))
    print(f"  s2d+im2col  : {t:7.2f} ms  {gf / t:6.1f} TF/s")

    # rbs0 entry: 3x3/s2 3->192 @512x768 (rich transforms)
    k3 = jnp.asarray(
        rng.standard_normal((3, 3, 3, 192)).astype(np.float32) * 0.05
    ).astype(dt)
    gf3 = 2 * 8 * 256 * 384 * 9 * 3 * 192 / 1e9
    xla3_j = jax.jit(
        lambda xx, kk: jax.lax.conv_general_dilated(
            xx, kk, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    print("== rbs0 conv 3x3/s2 3->192 @512x768 b8 (bf16) ==")
    t = timeit(lambda: xla3_j(x, k3))
    print(f"  XLA strided : {t:7.2f} ms  {gf3 / t:6.1f} TF/s")
    t = timeit(lambda: s2i_j(x, k3))
    print(f"  s2d+im2col  : {t:7.2f} ms  {gf3 / t:6.1f} TF/s")

    for (h, w) in [(256, 384), (128, 192)]:
        print(f"== conv5s2 192->192 @{h}x{w} b8 (bf16) ==")
        x = jnp.asarray(
            rng.standard_normal((8, h, w, 192)).astype(np.float32)
        ).astype(dt)
        k = jnp.asarray(
            rng.standard_normal((5, 5, 192, 192)).astype(np.float32) * 0.05
        ).astype(dt)
        gf = 2 * 8 * (h // 2) * (w // 2) * 25 * 192 * 192 / 1e9
        t = timeit(lambda: xla_j(x, k))
        print(f"  XLA strided : {t:7.2f} ms  {gf / t:6.1f} TF/s")
        t = timeit(lambda: conv5s2_pallas(x, k))
        print(f"  pallas v1   : {t:7.2f} ms  {gf / t:6.1f} TF/s")
        try:
            t = timeit(lambda: conv5s2_pallas_v2(x, k))
            print(f"  pallas v2   : {t:7.2f} ms  {gf / t:6.1f} TF/s")
        except Exception as e:
            print(f"  pallas v2   : FAILED {type(e).__name__}: {e}")

    # ---- tiny-channel stages (the flagship g_a entry stack) ----------
    from lic_tpu.layers import ResidualBottleneck
    from lic_tpu.layers.conv import set_tiny_conv

    x3 = jnp.asarray(
        rng.standard_normal((8, 512, 768, 3)).astype(np.float32)
    ).astype(dt)
    rb = ResidualBottleneck(3)
    rb_params = rb.init(jax.random.PRNGKey(0), x3)["params"]

    def run_rb(tag):
        f = jax.jit(lambda p, xx: rb.apply({"params": p}, xx))
        t = timeit(lambda: f(rb_params, x3))
        print(f"  RB(3) @512x768 {tag:12s}: {t:7.2f} ms")
        return f(rb_params, x3)

    print("== ResidualBottleneck(3) @512x768 b8 (bf16) ==")
    # tiny-conv defaults ON since dcf7398 — force it OFF for the baseline
    # row, or both rows silently trace the same lowering
    set_tiny_conv(False)
    ref_rb = run_rb("xla")
    try:
        set_tiny_conv(True)
        got_rb = run_rb("tiny-lower")
        rel = float(
            jnp.max(jnp.abs(got_rb.astype(jnp.float32) - ref_rb.astype(jnp.float32)))
        )
        print(f"  tiny-lower max abs err: {rel:.2e}")
    finally:
        set_tiny_conv(False)

    # correctness spot-check of v2 on device
    x = jnp.asarray(
        rng.standard_normal((2, 64, 96, 192)).astype(np.float32)
    ).astype(dt)
    k = jnp.asarray(
        rng.standard_normal((5, 5, 192, 192)).astype(np.float32) * 0.05
    ).astype(dt)
    try:
        ref = np.asarray(xla_j(x, k), np.float32)
        got = np.asarray(conv5s2_pallas_v2(x, k), np.float32)
        rel = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"v2 on-device rel err vs XLA: {rel:.2e}")
    except Exception as e:
        print(f"v2 on-device check FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
