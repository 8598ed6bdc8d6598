"""Probe 2: targeted lowerings for the three slow spots found by probe 1.

1. g_a layer-1 (3->192, full res): im2col->matmul vs s2d vs strided conv.
2. g_s last deconv (192->16, full res out): dilated vs polyphase vs
   phase-matmul + pixel shuffle.
3. mid conv5s2 (192->192): per-tap matmul with phase pre-split (XLA).
4. mid deconv5s2 (192->192): dilated vs phase-matmul.
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

    # ---------------- 1. layer-1: (8,512,768,3) -> (8,256,384,192)
    H, W, C = 512, 768, 192
    x0 = jnp.asarray(rng.standard_normal((B, H, W, 3)), dt)
    k0 = jnp.asarray(rng.standard_normal((5, 5, 3, C)) * 0.1, dt)
    fl1 = 2 * B * (H // 2) * (W // 2) * 25 * 3 * C

    def l1_strided(x, k):
        return lax.conv_general_dilated(
            x, k, (2, 2), ((1, 2), (1, 2)), dimension_numbers=DN
        )

    timeit("1a l1 strided conv", l1_strided, x0, k0, flops=fl1)

    def l1_im2col(x, k):
        # pad like ((1,2),(1,2)); gather 25 strided taps as channels
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        cols = [
            xp[:, a : a + H : 2, b : b + W : 2, :]
            for a in range(5)
            for b in range(5)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (B, H/2, W/2, 75)
        return jnp.einsum(
            "bhwk,ko->bhwo", patches, k.reshape(75, -1),
            preferred_element_type=jnp.bfloat16,
        )

    timeit("1b l1 im2col matmul", l1_im2col, x0, k0, flops=fl1)

    def l1_s2d_im2col(x, k):
        # s2d the image once (3->12ch at half res), then 3x3 im2col matmul
        from lic_tpu.layers.s2d_conv import conv5s2_s2d

        return conv5s2_s2d(x, k)

    timeit("1c l1 s2d conv", l1_s2d_im2col, x0, k0, flops=fl1)

    # ---------------- 2. last deconv: (8,256,384,192) -> (8,512,768,16)
    xl = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, C)), dt)
    kl = jnp.asarray(rng.standard_normal((5, 5, C, 16)) * 0.02, dt)
    fl2 = 2 * B * H * W * (25 / 4) * C * 16

    def dl_dilated(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=DN,
        )

    timeit("2a lastdeconv dilated", dl_dilated, xl, kl, flops=fl2)

    from lic_tpu.layers.polyphase import conv_transpose2d_polyphase

    def dl_poly(x, k):
        return conv_transpose2d_polyphase(x, k, 2, 3, 1)

    timeit("2b lastdeconv polyphase", dl_poly, xl, kl, flops=fl2)

    def dl_phase_mm(x, k):
        # all 4 phases as ONE matmul producing 64 channels, then shuffle.
        # phase r uses taps a = (pad_lo - r) % 2 + 2j; pad_lo = 5-1-3 = 1
        hp, wp = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        # per phase: taps and input offsets (from polyphase derivation)
        outs = []
        for rh in range(2):
            for rw in range(2):
                taps_h = list(range((1 - rh) % 2, 5, 2))
                taps_w = list(range((1 - rw) % 2, 5, 2))
                offs_h = [(rh - 1 + a) // 2 + 1 for a in taps_h]
                offs_w = [(rw - 1 + a) // 2 + 1 for a in taps_w]
                cols = [
                    xp[:, oh : oh + hp, ow : ow + wp, :]
                    for oh in offs_h
                    for ow in offs_w
                ]
                pat = jnp.concatenate(cols, axis=-1)
                sub = jnp.stack(
                    [k[a, b_] for a in taps_h for b_ in taps_w]
                ).reshape(-1, 16)
                outs.append(
                    jnp.einsum(
                        "bhwk,ko->bhwo", pat, sub,
                        preferred_element_type=jnp.bfloat16,
                    )
                )
        ph = jnp.stack(outs, axis=3).reshape(B, hp, wp, 2, 2, 16)
        ph = ph.transpose(0, 1, 3, 2, 4, 5)
        return ph.reshape(B, hp * 2, wp * 2, 16)

    timeit("2c lastdeconv phase-matmul", dl_phase_mm, xl, kl, flops=fl2)

    # ---------------- 3. mid conv5s2 192->192 via per-tap matmul
    Hm, Wm = 256, 384
    xm = jnp.asarray(rng.standard_normal((B, Hm, Wm, C)), dt)
    km = jnp.asarray(rng.standard_normal((5, 5, C, C)) * 0.01, dt)
    fl3 = 2 * B * (Hm // 2) * (Wm // 2) * 25 * C * C

    def mid_phase_mm(x, k):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        hp2, wp2 = (Hm + 4) // 2, (Wm + 4) // 2
        phases = xp.reshape(B, hp2, 2, wp2, 2, C).transpose(0, 2, 4, 1, 3, 5)
        ho, wo = Hm // 2, Wm // 2
        acc = None
        for a in range(5):
            jh, rh = (a + 1) // 2, (a + 1) % 2
            for b_ in range(5):
                jw, rw = (b_ + 1) // 2, (b_ + 1) % 2
                sl = phases[:, rh, rw, jh : jh + ho, jw : jw + wo, :]
                y = jnp.einsum(
                    "bhwc,co->bhwo", sl, k[a, b_],
                    preferred_element_type=jnp.bfloat16,
                )
                acc = y if acc is None else acc + y
        return acc

    timeit("3a mid conv phase-matmul", mid_phase_mm, xm, km, flops=fl3)

    def mid_strided(x, k):
        return lax.conv_general_dilated(
            x, k, (2, 2), ((1, 2), (1, 2)), dimension_numbers=DN
        )

    timeit("3b mid conv strided (ref)", mid_strided, xm, km, flops=fl3)

    # ---------------- 4. mid deconv 192->192 via phase-matmul
    xd = jnp.asarray(rng.standard_normal((B, Hm // 2, Wm // 2, C)), dt)
    fl4 = 2 * B * Hm * Wm * (25 / 4) * C * C

    def mid_deconv_phase_mm(x, k):
        hp, wp = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        outs = []
        for rh in range(2):
            for rw in range(2):
                taps_h = list(range((1 - rh) % 2, 5, 2))
                taps_w = list(range((1 - rw) % 2, 5, 2))
                offs_h = [(rh - 1 + a) // 2 + 1 for a in taps_h]
                offs_w = [(rw - 1 + a) // 2 + 1 for a in taps_w]
                acc = None
                for ti, oh in zip(taps_h, offs_h):
                    for tj, ow in zip(taps_w, offs_w):
                        sl = xp[:, oh : oh + hp, ow : ow + wp, :]
                        y = jnp.einsum(
                            "bhwc,co->bhwo", sl, k[ti, tj],
                            preferred_element_type=jnp.bfloat16,
                        )
                        acc = y if acc is None else acc + y
                outs.append(acc)
        ph = jnp.stack(outs, axis=3).reshape(B, hp, wp, 2, 2, C)
        ph = ph.transpose(0, 1, 3, 2, 4, 5)
        return ph.reshape(B, hp * 2, wp * 2, C)

    timeit("4a mid deconv phase-matmul", mid_deconv_phase_mm, xd, km, flops=fl4)

    def mid_deconv_dilated(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=DN,
        )

    timeit("4b mid deconv dilated (ref)", mid_deconv_dilated, xd, km, flops=fl4)


if __name__ == "__main__":
    main()
