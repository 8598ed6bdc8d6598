"""Probe 3: Pallas conv5s2 kernel + subpel-lowered deconv vs current bests."""

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

    from lic_tpu.layers.pallas_conv import conv5s2_pallas
    from lic_tpu.layers.polyphase import (
        conv_transpose2d_polyphase,
        conv_transpose2d_subpel,
    )

    DN = ("NHWC", "HWIO", "NHWC")
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    B = 8

    def timeit(name, fn, *args, iters=10, repeats=3, flops=None):
        f = jax.jit(fn)
        out = f(*args)
        float(jnp.ravel(out)[0])
        best = 1e9
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*args)
            float(jnp.ravel(out)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        tf = f" {flops/best/1e12:7.1f} TF/s" if flops else ""
        print(f"  {name:34s} {best*1e3:8.3f} ms{tf}", flush=True)
        return best

    C = 192

    # ---- mid conv5s2 (layer-2 shape) ----
    for (Hm, Wm, tag) in [(256, 384, "l2"), (128, 192, "l3"), (512, 768, "l1s")]:
        cin = 3 if tag == "l1s" else C
        xm = jnp.asarray(rng.standard_normal((B, Hm, Wm, cin)), dt)
        km = jnp.asarray(rng.standard_normal((5, 5, cin, C)) * 0.02, dt)
        fl = 2 * B * (Hm // 2) * (Wm // 2) * 25 * cin * C

        def strided(x, k):
            return lax.conv_general_dilated(
                x, k, (2, 2), ((1, 2), (1, 2)), dimension_numbers=DN
            )

        timeit(f"{tag} conv5s2 strided", strided, xm, km, flops=fl)
        timeit(f"{tag} conv5s2 PALLAS", conv5s2_pallas, xm, km, flops=fl)

    # ---- deconvs: subpel vs polyphase vs dilated ----
    cases = [
        ("mid192", 128, 192, C, C, 2, 1),
        ("last16", 256, 384, C, 16, 3, 1),
    ]
    for (tag, Hd, Wd, cin, cout, p, op) in cases:
        xd = jnp.asarray(rng.standard_normal((B, Hd, Wd, cin)), dt)
        kd = jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * 0.02, dt)
        fl = 2 * B * (Hd * 2) * (Wd * 2) * (25 / 4) * cin * cout
        pad_lo, pad_hi = 5 - 1 - p, 5 - 1 - p + op

        def dilated(x, k, pl_=pad_lo, ph_=pad_hi):
            return lax.conv_general_dilated(
                x, k, (1, 1), ((pl_, ph_), (pl_, ph_)), lhs_dilation=(2, 2),
                dimension_numbers=DN,
            )

        timeit(f"{tag} deconv dilated", dilated, xd, kd, flops=fl)
        timeit(
            f"{tag} deconv polyphase",
            lambda x, k, p_=p, o_=op: conv_transpose2d_polyphase(x, k, 2, p_, o_),
            xd, kd, flops=fl,
        )
        timeit(
            f"{tag} deconv SUBPEL",
            lambda x, k, p_=p, o_=op: conv_transpose2d_subpel(x, k, 2, p_, o_),
            xd, kd, flops=fl,
        )


if __name__ == "__main__":
    main()
