"""Round-5 probe D: lowerings for the narrow-channel g_a entry stack.

The rich g_a opens with 3× ResidualBottleneck at FULL 512×768 resolution
and C=3 (mid width 3//2 = 1).  In NHWC the channel dim is the TPU lane
dim, so C=3 pads 3→128 and the C=1 mid pads 1→128: every elementwise /
conv pass over the (8,512,768,·) tensors moves up to ~805 MB of padded
lanes instead of ~19 MB of payload.  Candidate fixes, all exact:

  A. NCHW residency: transpose once to (B,C,H,W) — lanes become W=768,
     sublanes H=512, fully dense; 1×1 convs are 3-plane lincombs, the
     3×3 a 9-shift stencil.  One transpose pair brackets the stack.
  B. im2col matmul for the rbs0 3→192 stride-2 conv (K=27 vs MXU-starved
     C_in=3 conv).
  C. W-fold: reshape (B,H,W,3) → (B,H,W/q, 3q) folding width into lanes
     (needs stencil rewrite — only ceiling-measured here via memcpy).

Run via the rd_runs queue.  Parity asserted vs the NHWC reference path.
"""

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

    rng = np.random.default_rng(0)
    B, H, W = 8, 512, 768
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.bfloat16)

    def gelu(v):
        return jax.nn.gelu(v)

    # shared weights for one bottleneck (C=3, mid=1)
    def rb_weights(key):
        k = np.random.default_rng(key)
        w1 = jnp.asarray(k.standard_normal((1, 1, 3, 1)) * 0.5, jnp.bfloat16)
        b1 = jnp.asarray(k.standard_normal((1,)) * 0.1, jnp.bfloat16)
        w2 = jnp.asarray(k.standard_normal((3, 3, 1, 1)) * 0.5, jnp.bfloat16)
        b2 = jnp.asarray(k.standard_normal((1,)) * 0.1, jnp.bfloat16)
        w3 = jnp.asarray(k.standard_normal((1, 1, 1, 3)) * 0.5, jnp.bfloat16)
        b3 = jnp.asarray(k.standard_normal((3,)) * 0.1, jnp.bfloat16)
        return (w1, b1, w2, b2, w3, b3)

    ws = [rb_weights(i) for i in range(3)]
    flat = [t for w in ws for t in w]

    def conv_nhwc(v, w, stride=1):
        # torch Conv2d semantics: symmetric padding (k-1)//2
        # (NOT XLA "SAME", which pads (0,1) at stride 2)
        p = (w.shape[0] - 1) // 2
        return jax.lax.conv_general_dilated(
            v, w, (stride, stride), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.jit
    def stack_nhwc(x, *flat):
        v = x
        for i in range(3):
            w1, b1, w2, b2, w3, b3 = flat[6 * i : 6 * i + 6]
            o = conv_nhwc(v, w1) + b1
            o = gelu(o)
            o = conv_nhwc(o, w2) + b2
            o = gelu(o)
            o = conv_nhwc(o, w3) + b3
            v = v + o
        return v

    @jax.jit
    def stack_nchw(x, *flat):
        v = jnp.transpose(x, (0, 3, 1, 2))  # (B,3,H,W)
        for i in range(3):
            w1, b1, w2, b2, w3, b3 = flat[6 * i : 6 * i + 6]
            o = jax.lax.conv_general_dilated(
                v, jnp.transpose(w1, (3, 2, 0, 1)), (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b1[None, :, None, None]
            o = gelu(o)
            o = jax.lax.conv_general_dilated(
                o, jnp.transpose(w2, (3, 2, 0, 1)), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b2[None, :, None, None]
            o = gelu(o)
            o = jax.lax.conv_general_dilated(
                o, jnp.transpose(w3, (3, 2, 0, 1)), (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b3[None, :, None, None]
            v = v + o
        return jnp.transpose(v, (0, 2, 3, 1))

    ref = stack_nhwc(x, *flat)
    got = stack_nchw(x, *flat)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    t_a = slope(stack_nhwc, x, *flat)
    t_b = slope(stack_nchw, x, *flat)
    print(f"rb0 stack NHWC: {t_a:7.2f} ms", flush=True)
    print(f"rb0 stack NCHW: {t_b:7.2f} ms   (maxabs dev {err:.2e})", flush=True)

    # memcpy ceiling for the dense payload (6 tensors r+w of 19 MB)
    dense = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    f_copy = jax.jit(lambda v: v * jnp.bfloat16(1.01))
    t_c = slope(f_copy, dense)
    print(f"dense 19MB pass ceiling: {t_c:7.3f} ms", flush=True)

    # rbs0 first conv: 3x3 stride-2, 3 -> 192
    w_s = jnp.asarray(rng.standard_normal((3, 3, 3, 192)) * 0.2, jnp.bfloat16)

    @jax.jit
    def conv_s2_nhwc(x, w):
        return conv_nhwc(x, w, stride=2)

    @jax.jit
    def conv_s2_im2col(x, w):
        # 9 stride-2 tap slices -> (B,H/2,W/2,27) @ (27,192).
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [
            xp[:, a : a + H : 2, b : b + W : 2, :]
            for a in range(3)
            for b in range(3)
        ]
        patch = jnp.concatenate(taps, axis=-1)
        return jax.lax.dot_general(
            patch, w.reshape(27, 192),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    r1 = conv_s2_nhwc(x, w_s)
    r2 = conv_s2_im2col(x, w_s)
    err2 = float(jnp.max(jnp.abs(r1.astype(jnp.float32) - r2.astype(jnp.float32))))
    t1 = slope(conv_s2_nhwc, x, w_s)
    t2 = slope(conv_s2_im2col, x, w_s)
    print(f"rbs0 conv3x3s2 3->192 NHWC:   {t1:7.2f} ms", flush=True)
    print(f"rbs0 conv3x3s2 3->192 im2col: {t2:7.2f} ms   (maxabs dev {err2:.2e})", flush=True)

    # combined: rb0 stack + first conv, best-of lowering in ONE jit
    @jax.jit
    def entry_best(x, *args):
        flat_w, w_s = args[:-1], args[-1]
        v = stack_nchw.__wrapped__(x, *flat_w)
        return conv_s2_im2col.__wrapped__(v, w_s)

    @jax.jit
    def entry_ref(x, *args):
        flat_w, w_s = args[:-1], args[-1]
        v = stack_nhwc.__wrapped__(x, *flat_w)
        return conv_s2_nhwc.__wrapped__(v, w_s)

    rr = entry_ref(x, *flat, w_s)
    rb = entry_best(x, *flat, w_s)
    err3 = float(jnp.max(jnp.abs(rr.astype(jnp.float32) - rb.astype(jnp.float32))))
    t3 = slope(entry_ref, x, *flat, w_s)
    t4 = slope(entry_best, x, *flat, w_s)
    print(f"entry (rb0x3+conv) NHWC ref:  {t3:7.2f} ms", flush=True)
    print(f"entry (rb0x3+conv) best:      {t4:7.2f} ms   (maxabs dev {err3:.2e})", flush=True)


if __name__ == "__main__":
    main()
