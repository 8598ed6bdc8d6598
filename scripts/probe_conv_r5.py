"""Round-5 probe A: separate the tunnel/dispatch floor from true op cost.

Every prior per-op probe (profile_ga, probe_conv_r3, probe_attn_sol) timed
ops with ``iters=10`` and ONE fence — through the axon tunnel the fence RTT
plus dispatch-feed cost amortizes to ~2.5-3.4 ms/iter, which is the same
order as the ops being measured.  Before building the K-packed conv kernel
(docs/PERF.md round-4 recipe) this probe pins down:

  1. the harness floor: trivial op + pure memcpy at iters 10/50/200 —
     the per-iter slope between iters levels is the TRUE op cost, the
     intercept is the floor;
  2. TRUE XLA costs at the wam0 shapes: conv3x3/conv7x7/conv1x1/
     ResidualBlock/conv5s2 via two-point (10, 50) slope;
  3. the K-packed matmul CEILING: the 9 lo-passes(K=128) + 6 paired
     hi-passes(K=128) contraction as pure XLA matmuls — what the Pallas
     kernel could at best approach;
  4. same ceiling for 7x7 (49 lo + 28 pairs).

Run via the rd_runs queue (holds the TPU flock).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _fence(out):
    # On the tunneled platform `block_until_ready` returns before execution
    # completes (docs/PERF.md measurement-integrity note); a host fetch of a
    # scalar that depends on the last output is the only reliable fence
    # (device programs execute in-order).
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0].astype("float32"))


def timed(f, *args, iters):
    out = f(*args)
    _fence(out)
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _fence(out)
        vals.append((time.perf_counter() - t0) / iters * 1e3)
    return statistics.median(vals)


def slope(f, *args, lo=10, hi=50):
    """True per-iter ms from a two-point fit: (T_hi*hi - T_lo*lo)/(hi-lo)."""
    t_lo = timed(f, *args, iters=lo)
    t_hi = timed(f, *args, iters=hi)
    true = (t_hi * hi - t_lo * lo) / (hi - lo)
    return t_lo, t_hi, true


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- 1. harness floor -------------------------------------------------
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_triv = jax.jit(lambda x: x + 1.0)
    for it in (10, 50, 200):
        print(f"  trivial add, iters={it}: {timed(f_triv, tiny, iters=it):.3f} ms/iter", flush=True)

    big = jnp.zeros((8, 128, 192, 576), jnp.bfloat16)  # 226 MB
    f_copy = jax.jit(lambda x: x * jnp.bfloat16(1.0000001))
    for it in (10, 50):
        ms = timed(f_copy, big, iters=it)
        gbs = 2 * big.size * 2 / ms / 1e6
        print(f"  memcpy 226MB r+w, iters={it}: {ms:.3f} ms ({gbs:.0f} GB/s)", flush=True)

    # --- 2. true XLA costs at wam0 shapes (b8 128x192 C192) ---------------
    def conv_fn(stride=1):
        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return jax.jit(f)

    x = jnp.asarray(rng.standard_normal((8, 128, 192, 192)), jnp.bfloat16)
    for k, gf in ((1, 14.5), (3, 130.5), (7, 710.4)):
        w = jnp.asarray(rng.standard_normal((k, k, 192, 192)) * 0.05, jnp.bfloat16)
        t10, t50, true = slope(conv_fn(), x, w)
        print(f"  conv{k}x{k} @8x128x192: i10 {t10:.2f}  i50 {t50:.2f}  TRUE {true:.2f} ms  {gf/true:.0f} TF/s", flush=True)

    # ResidualBlock as jitted block (2 conv3x3 + lrelu + skip)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 192, 192)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 192, 192)) * 0.05, jnp.bfloat16)

    @jax.jit
    def rb(x, w1, w2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.leaky_relu(y)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.leaky_relu(y) + x

    t10, t50, true = slope(rb, x, w1, w2)
    print(f"  ResidualBlock @8x128x192: i10 {t10:.2f}  i50 {t50:.2f}  TRUE {true:.2f} ms", flush=True)

    # conv5s2 at down1 shape
    x2 = jnp.asarray(rng.standard_normal((8, 256, 384, 192)), jnp.bfloat16)
    w5 = jnp.asarray(rng.standard_normal((5, 5, 192, 192)) * 0.05, jnp.bfloat16)
    t10, t50, true = slope(conv_fn(2), x2, w5)
    print(f"  conv5s2 @8x256x384: i10 {t10:.2f}  i50 {t50:.2f}  TRUE {true:.2f} ms  {362/true:.0f} TF/s", flush=True)

    # --- 3. K-packed matmul ceilings --------------------------------------
    m = 8 * 128 * 192
    xlo = jnp.asarray(rng.standard_normal((m, 128)), jnp.bfloat16)
    xw2 = jnp.asarray(rng.standard_normal((m, 128)), jnp.bfloat16)

    def packed_ceiling(n_lo, n_pair):
        ws_lo = [jnp.asarray(rng.standard_normal((128, 192)) * 0.05, jnp.bfloat16)
                 for _ in range(n_lo)]
        ws_hi = [jnp.asarray(rng.standard_normal((128, 192)) * 0.05, jnp.bfloat16)
                 for _ in range(n_pair)]

        @jax.jit
        def f(xlo, xw2, *ws):
            acc = jnp.zeros((m, 192), jnp.float32)
            for w in ws[:n_lo]:
                acc += jnp.dot(xlo, w, preferred_element_type=jnp.float32)
            for w in ws[n_lo:]:
                acc += jnp.dot(xw2, w, preferred_element_type=jnp.float32)
            return acc.astype(jnp.bfloat16)

        return slope(f, xlo, xw2, *(ws_lo + ws_hi))

    t10, t50, true = packed_ceiling(9, 6)
    print(f"  packed-3x3 ceiling (9 lo + 6 pair, K=128): TRUE {true:.2f} ms  {130.5/true:.0f} TF/s-equiv", flush=True)
    t10, t50, true = packed_ceiling(49, 28)
    print(f"  packed-7x7 ceiling (49 lo + 28 pair, K=128): TRUE {true:.2f} ms  {710.4/true:.0f} TF/s-equiv", flush=True)

    # reference: the padded 25-matmul D-variant rate at K=256
    xp = jnp.asarray(rng.standard_normal((m, 256)), jnp.bfloat16)

    def padded_ceiling(n):
        ws = [jnp.asarray(rng.standard_normal((256, 192)) * 0.05, jnp.bfloat16)
              for _ in range(n)]

        @jax.jit
        def f(x, *ws):
            acc = jnp.zeros((m, 192), jnp.float32)
            for w in ws:
                acc += jnp.dot(x, w, preferred_element_type=jnp.float32)
            return acc.astype(jnp.bfloat16)

        return slope(f, xp, *ws)

    t10, t50, true = padded_ceiling(9)
    print(f"  padded-3x3 ceiling (9 x K=256): TRUE {true:.2f} ms", flush=True)

    # --- 4. the K-packed Pallas kernel: silicon parity + timing -----------
    import functools

    from lic_tpu.layers.pallas_conv_s1 import convk_s1_pallas

    for k in (3, 7):
        w = jnp.asarray(rng.standard_normal((k, k, 192, 192)) * 0.05, jnp.bfloat16)
        ref = jax.jit(conv_fn())(x, w)
        got = convk_s1_pallas(x, w)
        relerr = float(
            jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
            / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
        )
        t10, t50, true = slope(
            functools.partial(convk_s1_pallas, act=None), x, w
        )
        gf = {3: 130.5, 7: 710.4}[k]
        print(
            f"  PACKED conv{k}x{k} @8x128x192: relerr {relerr:.2e}  "
            f"i10 {t10:.2f}  i50 {t50:.2f}  TRUE {true:.2f} ms  {gf/true:.0f} TF/s",
            flush=True,
        )

    # fused ResidualBlock epilogue (conv+bias+lrelu, conv+bias+lrelu+skip)
    bias1 = jnp.asarray(rng.standard_normal((192,)), jnp.bfloat16)

    @jax.jit
    def rb_packed(x, w1, w2, bias1):
        y = convk_s1_pallas(x, w1, bias1, act="leaky_relu")
        return convk_s1_pallas(y, w2, bias1, act="leaky_relu", residual=True)

    w1b = jnp.asarray(rng.standard_normal((3, 3, 192, 192)) * 0.05, jnp.bfloat16)
    w2b = jnp.asarray(rng.standard_normal((3, 3, 192, 192)) * 0.05, jnp.bfloat16)
    t10, t50, true = slope(rb_packed, x, w1b, w2b, bias1)
    print(f"  PACKED ResidualBlock @8x128x192: TRUE {true:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
