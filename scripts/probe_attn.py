"""TPU probe: fused Pallas W-MSA kernel vs XLA path.

Measures WinBasedAttention and the full WAM (WinNoShiftAttention) at the
flagship's in-model shapes, checks on-device parity, then times the flagship
full forward with the kernel on.  Run via the rd_runs queue (serial TPU).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(x):
    """block_until_ready does NOT fence on axon; host-fetch a scalar."""
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
    return statistics.median(vals), out


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.layers import WinBasedAttention, WinNoShiftAttention
    from lic_tpu.layers.win_attention import set_pallas_attn
    from lic_tpu.utils.amp import bf16_params

    rng = np.random.default_rng(0)
    n = 192

    def bench_mod(name, module, shape, dtype=jnp.bfloat16):
        x = jnp.asarray(
            rng.standard_normal((8,) + shape).astype(np.float32)
        ).astype(dtype)
        params = module.init(jax.random.PRNGKey(0), x)["params"]
        # σ=0.01 keeps the 192-ch conv chain contractive (σ=0.05 compounds
        # to ~1e6 variance through the b-branch and NaNs the bf16 parity
        # check) while still exercising the zero-init proj weights.
        params = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32) * 0.01
            ),
            params,
        )
        params = bf16_params(params) if dtype == jnp.bfloat16 else params
        f = jax.jit(lambda p, xx: module.apply({"params": p}, xx))
        set_pallas_attn(False)
        t_xla, ref = timeit(f, params, x)
        set_pallas_attn(True)
        f2 = jax.jit(lambda p, xx: module.apply({"params": p}, xx))
        t_pal, got = timeit(f2, params, x)
        set_pallas_attn(True, fuse_proj=True)
        f3 = jax.jit(lambda p, xx: module.apply({"params": p}, xx))
        t_fp, got_fp = timeit(f3, params, x)
        set_pallas_attn(False, fuse_proj=False)
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        err_fp = float(
            jnp.max(jnp.abs(got_fp.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(
            f"  {name:36s} xla {t_xla:7.2f} ms   pallas {t_pal:7.2f} ms   "
            f"({t_xla / t_pal:4.2f}x)  relerr {err / scale:.2e}   "
            f"+fuse_proj {t_fp:7.2f} ms ({t_xla / t_fp:4.2f}x) "
            f"relerr {err_fp / scale:.2e}",
            flush=True,
        )
        del got_fp
        # free device buffers + donate executables between modules — the
        # probe previously OOM'd the chip accumulating every module's
        # params/activations plus two full-model compiles (ResourceExhausted
        # at the 19:42 run, chain7.log)
        del params, x, ref, got
        jax.clear_caches()

    print("WBA / WAM fused-attention probe b8 bf16:")
    bench_mod(
        "WBA ws8 ss0 @128x192",
        WinBasedAttention(dim=n, num_heads=8, window_size=8, shift_size=0),
        (128, 192, n),
    )
    bench_mod(
        "WBA ws8 ss4 @128x192",
        WinBasedAttention(dim=n, num_heads=8, window_size=8, shift_size=4),
        (128, 192, n),
    )
    bench_mod(
        "WAM ws8 ss4 @128x192 (wam0)",
        WinNoShiftAttention(n, 8, 8, 4),
        (128, 192, n),
    )
    bench_mod(
        "WAM ws4 ss2 @32x48 (wam1)",
        WinNoShiftAttention(n, 8, 4, 2),
        (32, 48, n),
    )

    # flagship end-to-end with the kernel on
    from lic_tpu.models import build_model

    for preset in ["net_unet_ha_hs_dec", "net_ga"]:
        model = build_model(preset)
        x = jnp.asarray(
            rng.standard_normal((8, 512, 768, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)
        params = jax.jit(
            lambda k, xx, m=model: m.init(
                {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
            )
        )(jax.random.PRNGKey(0), x)["params"]
        params = bf16_params(params)

        # NOTE: two DISTINCT function objects — jax.jit(f) twice on the
        # same f shares one executable cache, so the second timing would
        # silently reuse the first compile and never see the pallas flag
        # (which is read at trace time).
        def fwd_xla(p, xx, m=model):
            return m.apply({"params": p}, xx, training=False).x_tilde

        def fwd_pal(p, xx, m=model):
            return m.apply({"params": p}, xx, training=False).x_tilde

        def fwd_fp(p, xx, m=model):
            return m.apply({"params": p}, xx, training=False).x_tilde

        set_pallas_attn(False)
        t_xla, _ = timeit(jax.jit(fwd_xla), params, x, iters=5)
        set_pallas_attn(True)
        t_pal, _ = timeit(jax.jit(fwd_pal), params, x, iters=5)
        set_pallas_attn(True, fuse_proj=True)
        t_fp, _ = timeit(jax.jit(fwd_fp), params, x, iters=5)
        set_pallas_attn(False, fuse_proj=False)
        mp = 8 * 512 * 768 / 1e6
        print(
            f"  {preset:24s} fwd: xla {t_xla:7.2f} ms ({mp / t_xla * 1e3:6.1f}"
            f" MP/s)  pallas {t_pal:7.2f} ms ({mp / t_pal * 1e3:6.1f} MP/s)"
            f"  +fuse_proj {t_fp:7.2f} ms ({mp / t_fp * 1e3:6.1f} MP/s)",
            flush=True,
        )
        del params, x
        jax.clear_caches()


if __name__ == "__main__":
    main()
