"""Round-5 probe E: packed-conv kernel rev 2 (dot_general, no per-tap
reshape copies) vs XLA at the wam0 shapes; plus the up3 deconv lowerings.

Run via the rd_runs queue.
"""

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    float(leaf.reshape(-1)[0].astype("float32"))


def slope(f, *args):
    out = f(*args)
    fence(out)

    def burst(n):
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(*args)
            fence(out)
            vals.append((time.perf_counter() - t0) / n * 1e3)
        return statistics.median(vals)

    t_lo, t_hi = burst(10), burst(50)
    return (t_hi * 50 - t_lo * 10) / 40


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.layers.pallas_conv_s1 import convk_s1_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 128, 192, 192)), jnp.bfloat16)

    def conv_fn(k):
        p = k // 2

        @jax.jit
        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return f

    for k in (3, 7):
        w = jnp.asarray(rng.standard_normal((k, k, 192, 192)) * 0.05, jnp.bfloat16)
        ref = conv_fn(k)(x, w)
        got = convk_s1_pallas(x, w)
        relerr = float(
            jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
            / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
        )
        t_x = slope(conv_fn(k), x, w)
        t_p = slope(functools.partial(convk_s1_pallas, act=None), x, w)
        gf = {3: 130.5, 7: 710.4}[k]
        print(
            f"conv{k}x{k}: XLA {t_x:5.2f} ms ({gf/t_x:.0f} TF/s)   "
            f"PACKED-v2 {t_p:5.2f} ms ({gf/t_p:.0f} TF/s)   relerr {relerr:.2e}",
            flush=True,
        )

    # fused ResidualBlock epilogue
    w1 = jnp.asarray(rng.standard_normal((3, 3, 192, 192)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 192, 192)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((192,)) * 0.1, jnp.bfloat16)

    @jax.jit
    def rb_xla(x, w1, w2, b1):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        y = jax.nn.leaky_relu(y)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        return jax.nn.leaky_relu(y) + x

    @jax.jit
    def rb_packed(x, w1, w2, b1):
        y = convk_s1_pallas(x, w1, b1, act="leaky_relu")
        return convk_s1_pallas(y, w2, b1, act="leaky_relu", residual=True)

    t_x = slope(rb_xla, x, w1, w2, b1)
    t_p = slope(rb_packed, x, w1, w2, b1)
    print(f"ResidualBlock: XLA {t_x:5.2f} ms   PACKED-v2 {t_p:5.2f} ms", flush=True)

    # ---- up3 deconv lowerings: 192 -> 16, 256x384 -> 512x768 ------------
    y = jnp.asarray(rng.standard_normal((8, 256, 384, 192)), jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((5, 5, 192, 16)) * 0.05, jnp.bfloat16)

    from lic_tpu.models.transforms import _Up5

    up = _Up5(16)
    pvar = up.init(jax.random.PRNGKey(0), y)
    pvar = jax.tree.map(lambda a: a.astype(jnp.bfloat16), pvar)
    f_up = jax.jit(lambda p, v: up.apply(p, v))
    t_cur = slope(f_up, pvar, y)
    print(f"up3 current (polyphase default): {t_cur:5.2f} ms", flush=True)

    # subpixel: 3x3 conv 192->64 at low res + depth_to_space(2)
    w_sp = jnp.asarray(rng.standard_normal((3, 3, 192, 64)) * 0.05, jnp.bfloat16)

    @jax.jit
    def up_subpel(v, w):
        o = jax.lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, wd_, c = o.shape
        o = o.reshape(b, h, wd_, 2, 2, c // 4)
        o = o.transpose(0, 1, 3, 2, 4, 5)
        return o.reshape(b, h * 2, wd_ * 2, c // 4)

    t_sp = slope(up_subpel, y, w_sp)
    print(f"up3 subpel conv3x3->d2s ceiling: {t_sp:5.2f} ms  "
          "(different arch — ceiling only)", flush=True)


if __name__ == "__main__":
    main()
