"""TPU probe: WBA speed-of-light decomposition at the wam0 shape.

The flagship bill after the fused kernel is wam0 ≈ 39 ms of the ~125 ms
forward; inside it 4× WinBasedAttention ≈ 5.3–7 ms each.  Paper math says
each WBA's ceiling is ~1 ms (qkv 0.22 ms MXU + proj 0.07 + ~1.4 ms HBM
round trips at 819 GB/s) — this probe measures every piece separately to
find where the remaining 4–5 ms actually sits:

  memcpy ceiling, qkv Dense alone, attention kernel alone on
  precomputed qkv, proj Dense alone, roll alone, WBA end-to-end
  (xla / pallas), the conv_a residual branch, c7x7, wam0 end-to-end.

Run via the rd_runs queue (serial TPU).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0].astype(jnp.float32))


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

    from lic_tpu.layers import WinBasedAttention, WinNoShiftAttention
    from lic_tpu.layers.blocks import ResidualBlock
    from lic_tpu.layers.pallas_attn import flatten_mask, wba_fused_apply
    from lic_tpu.layers.win_attention import (
        relative_position_index,
        set_pallas_attn,
        swin_shift_mask,
        window_partition,
        window_reverse,
    )

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    b, h, w, c = 8, 128, 192, 192
    nh, ws, ss = 8, 8, 4
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)).astype(dt)
    mp8 = b * h * w  # tokens

    rows = []

    def row(tag, ms, note=""):
        rows.append((tag, ms, note))
        print(f"  {tag:34s} {ms:8.3f} ms  {note}")

    # --- ceilings -------------------------------------------------------
    t = timeit(jax.jit(lambda a: a + 1), x)
    row("memcpy ceiling (x+1, 75 MB r+w)", t)

    wqkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32)
    ).astype(dt)
    t = timeit(jax.jit(lambda a, w_: jnp.dot(a.reshape(-1, c), w_)), x, wqkv)
    row("qkv matmul alone (196k,192)@(192,576)", t)

    wproj = jnp.asarray(
        rng.standard_normal((c, c)).astype(np.float32)
    ).astype(dt)
    t = timeit(jax.jit(lambda a, w_: jnp.dot(a.reshape(-1, c), w_)), x, wproj)
    row("proj matmul alone (196k,192)@(192,192)", t)

    t = timeit(jax.jit(lambda a: jnp.roll(a, (-ss, -ss), (1, 2))), x)
    row("roll alone", t)

    t = timeit(
        jax.jit(lambda a: window_reverse(window_partition(a, ws), ws, h, w)), x
    )
    row("window partition+reverse (xla)", t)

    # --- attention kernel alone on precomputed qkv ----------------------
    qkv = jnp.dot(x.reshape(-1, c), wqkv).reshape(b, h, w, 3 * c)
    bias = jnp.asarray(
        rng.standard_normal(((2 * ws - 1) ** 2, nh)).astype(np.float32) * 0.02
    )
    idx = relative_position_index(ws).reshape(-1)
    n = ws * ws
    rel_flat = (
        bias[idx].reshape(n, n, nh).transpose(0, 2, 1).reshape(n, nh * n)
    )

    t = timeit(
        jax.jit(
            lambda q: wba_fused_apply(
                q, rel_flat, None, None, ws=ws, nh=nh, interpret=False
            )
        ),
        qkv,
    )
    row("kernel alone, no mask (ss0)", t)

    mask_np = swin_shift_mask(h, w, ws, ss)
    flat = flatten_mask(mask_np, h // ws, w // ws, nh)
    t = timeit(
        jax.jit(
            lambda q: wba_fused_apply(
                q, rel_flat, flat, ("sol", h, w, ws, ss, nh),
                ws=ws, nh=nh, interpret=False,
            )
        ),
        qkv,
    )
    row("kernel alone, shift mask (ss4)", t)

    # --- module end-to-end, both paths ----------------------------------
    for tag, ssz in (("ss0", 0), ("ss4", ss)):
        mod = WinBasedAttention(dim=c, num_heads=nh, window_size=ws, shift_size=ssz)
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        params = jax.tree.map(lambda a: a.astype(dt), params)
        for mode, flag in (("xla", False), ("pallas", True)):
            set_pallas_attn(flag)
            f = jax.jit(lambda p, a, _m=mod: _m.apply({"params": p}, a))
            t = timeit(f, params, x)
            row(f"WBA {tag} e2e ({mode})", t)

    # --- conv branches ---------------------------------------------------
    import flax.linen as nn

    class ConvA(nn.Module):
        @nn.compact
        def __call__(self, a):
            for i in range(3):
                a = ResidualBlock(c, name=f"rb{i}")(a)
            return a

    mod = ConvA()
    params = jax.tree.map(
        lambda a: a.astype(dt), mod.init(jax.random.PRNGKey(0), x)["params"]
    )
    t = timeit(jax.jit(lambda p, a: mod.apply({"params": p}, a)), params, x)
    row("conv_a branch (3x ResidualBlock)", t, "SOL ~4 ms")

    from lic_tpu.layers.conv import Conv2d

    mod = Conv2d(c, kernel_size=7, padding=3)
    params = jax.tree.map(
        lambda a: a.astype(dt), mod.init(jax.random.PRNGKey(0), x)["params"]
    )
    t = timeit(jax.jit(lambda p, a: mod.apply({"params": p}, a)), params, x)
    row("c7x7 alone", t, "SOL ~3.6 ms")

    # --- wam0 end-to-end --------------------------------------------------
    set_pallas_attn(None)
    mod = WinNoShiftAttention(dim=c, num_heads=nh, window_size=ws, shift_size=ss)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
    t = timeit(jax.jit(lambda p, a: mod.apply({"params": p}, a)), params, x)
    row("wam0 e2e (pallas default)", t)

    print(f"\ntokens {mp8}, dtype bf16; see docs/PERF.md round-4 section")


if __name__ == "__main__":
    main()
