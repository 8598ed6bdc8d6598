"""Microbenchmark matrix for the strided-conv lowering options (TPU).

Times the dominant g_a/g_s stages of the bench model (source_net @ 768x512,
batch 8, bf16) under each candidate lowering, plus the raw MXU matmul
ceiling for the same FLOPs.  Decides where the Pallas effort should go.

Run ON the TPU host (sitecustomize preloads platform=axon):
    python scripts/perf_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    DN = ("NHWC", "HWIO", "NHWC")
    B, H, W, C = 8, 256, 384, 192  # layer-2 of g_a for 512x768 input
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    k5 = jnp.asarray(rng.standard_normal((5, 5, C, C)) * 0.01, dt)

    def timeit(name, fn, *args, iters=10, repeats=3):
        f = jax.jit(fn)
        out = f(*args)
        fence = np.asarray(jax.device_get(jnp.ravel(out)[0]))
        best = 1e9
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*args)
            float(jnp.ravel(out)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return name, best

    results = []

    # ---- A: XLA strided conv (current path) ----
    def conv_strided(x, k):
        return lax.conv_general_dilated(
            x, k, (2, 2), ((1, 2), (1, 2)), dimension_numbers=DN
        )

    results.append(timeit("A conv5s2 strided", conv_strided, x, k5))
    out_ref = jax.jit(conv_strided)(x, k5)
    Ho, Wo = out_ref.shape[1], out_ref.shape[2]
    flops = 2 * B * Ho * Wo * 25 * C * C

    # ---- B: s2d lowering ----
    from lic_tpu.layers.s2d_conv import conv5s2_s2d

    results.append(timeit("B conv5s2 s2d", conv5s2_s2d, x, k5))

    # ---- C: 4-phase polyphase dense convs ----
    def conv5s2_poly(x, k):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = None
        for rh in range(2):
            for rw in range(2):
                ph = xp[:, rh::2, rw::2, :]
                sub = k[rh::2, rw::2]
                y = lax.conv_general_dilated(
                    ph, sub, (1, 1), "VALID", dimension_numbers=DN
                )[:, :Ho, :Wo, :]
                acc = y if acc is None else acc + y
        return acc

    results.append(timeit("C conv5s2 polyphase", conv5s2_poly, x, k5))

    # ---- D: MXU ceiling — same FLOPs as matmuls ----
    M = B * Ho * Wo
    a = jnp.asarray(rng.standard_normal((M, C)), dt)
    w1 = jnp.asarray(rng.standard_normal((C, C)) * 0.01, dt)

    def mm25(a, w):
        acc = jnp.zeros((M, C), dt)
        for _ in range(25):
            acc = acc + jnp.dot(a, w, preferred_element_type=jnp.bfloat16)
        return acc

    name, t = timeit("D 25x matmul ceiling", mm25, a, w1)
    results.append((name, t))

    # big-K single matmul, same FLOPs (im2col shape)
    a2 = jnp.asarray(rng.standard_normal((M, 25 * C)), dt)
    w2 = jnp.asarray(rng.standard_normal((25 * C, C)) * 0.01, dt)

    def mm_bigk(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.bfloat16)

    results.append(timeit("E bigK matmul ceiling", mm_bigk, a2, w2))

    # ---- F/G: deconv stage (in 128x192 -> out 256x384) ----
    xd = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, C)), dt)

    from lic_tpu.layers.polyphase import conv_transpose2d_polyphase

    def deconv_poly(x, k):
        return conv_transpose2d_polyphase(x, k, 2, 3, 1)

    results.append(timeit("F deconv5s2 polyphase", deconv_poly, xd, k5))

    def deconv_dilated(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=DN,
        )

    results.append(timeit("G deconv5s2 dilated", deconv_dilated, xd, k5))

    # ---- H: first layer 3->192 at full res (bandwidth check) ----
    x0 = jnp.asarray(rng.standard_normal((B, 512, 768, 3)), dt)
    k0 = jnp.asarray(rng.standard_normal((5, 5, 3, C)) * 0.1, dt)
    results.append(
        timeit("H conv5s2 3->192 fullres", conv_strided, x0, k0)
    )

    # ---- I: dense 3x3 192->192 reference speed at same out res ----
    x3 = jnp.asarray(rng.standard_normal((B, Ho, Wo, C)), dt)
    k3 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.01, dt)

    def conv3s1(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
        )

    results.append(timeit("I conv3s1 dense", conv3s1, x3, k3))

    print(f"\nshapes: in {x.shape} out {out_ref.shape}; conv FLOPs {flops/1e9:.1f} G")
    for name, t in results:
        f = flops
        if name.startswith("H"):
            f = 2 * B * 256 * 384 * 25 * 3 * C
        if name.startswith("I"):
            f = 2 * B * Ho * Wo * 9 * C * C
        print(f"  {name:28s} {t*1e3:8.3f} ms   {f/t/1e12:7.1f} TF/s")


if __name__ == "__main__":
    main()
