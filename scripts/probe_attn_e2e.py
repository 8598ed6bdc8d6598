"""TPU probe: localize where the fused W-MSA kernel's standalone win goes.

probe_attn.py (chain7.log 17:04) measured wam0 standalone at 66.8 ms XLA vs
38.5 ms Pallas (1.73x), yet the flagship full forward was unchanged
(183.9 -> 182.8 ms) even though the traced program provably contains the
pallas_calls (8 of them).  Hypothesis: the custom call breaks XLA fusion
around the four WBAs (layout transitions / rematerialized operands) and the
in-context cost eats the in-kernel win.  This probe A/Bs at increasing
scope to find the break-even point:

  A. wam0 alone              (reproduce the standalone 1.73x)
  B. gdn -> wam0 -> rb -> rbs (wam0 with real producers/consumers)
  C. full rich g_a           (the 119 ms stage bill)
  D. flagship full forward   (the 183 ms E2E)

Run via the rd_runs queue (serial TPU, flock held by the runner).
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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from lic_tpu.layers import (
        GDN,
        ResidualBlockWithStride,
        ResidualBottleneck,
        WinNoShiftAttention,
    )
    from lic_tpu.layers.win_attention import set_pallas_attn
    from lic_tpu.models.transforms import AnalysisTransform
    from lic_tpu.utils.amp import bf16_params

    rng = np.random.default_rng(0)
    n = 192

    def ab(name, module, shape, iters=10, init_input=None):
        """Time module.apply with the fused kernel off vs on.

        Params come from the real initializer (GDN reparams must stay in
        their valid domain — probe_attn's random-leaf replacement is what
        NaN'd its WAM parity check)."""
        x = jnp.asarray(
            rng.standard_normal((8,) + shape).astype(np.float32)
        ).astype(jnp.bfloat16)
        xi = x if init_input is None else init_input
        params = jax.jit(
            lambda k, xx, m=module: m.init(
                {"params": k, "noise": jax.random.PRNGKey(1)}, xx
            )
        )(jax.random.PRNGKey(0), xi.astype(jnp.float32))["params"]
        params = bf16_params(params)

        def f_xla(p, xx, m=module):
            return m.apply({"params": p}, xx)

        def f_pal(p, xx, m=module):
            return m.apply({"params": p}, xx)

        set_pallas_attn(False)
        t0, ref = timeit(jax.jit(f_xla), params, x, iters=iters)
        set_pallas_attn(True)
        t1, got = timeit(jax.jit(f_pal), params, x, iters=iters)
        set_pallas_attn(False)
        ref32 = ref.astype(jnp.float32)
        got32 = got.astype(jnp.float32)
        finite = bool(jnp.all(jnp.isfinite(ref32)) & jnp.all(jnp.isfinite(got32)))
        err = float(jnp.max(jnp.abs(got32 - ref32)))
        scale = float(jnp.max(jnp.abs(ref32))) + 1e-9
        print(
            f"  {name:34s} xla {t0:7.2f} ms   pallas {t1:7.2f} ms   "
            f"({t0 / t1:4.2f}x)  relerr {err / scale:.2e}"
            f"{'' if finite else '  [NON-FINITE]'}",
            flush=True,
        )
        del params, x, ref, got, ref32, got32
        jax.clear_caches()

    print("fused W-MSA scope sweep b8 bf16:")

    # A. wam0 alone
    ab("A wam0 WAM(ws8,ss4) @128x192", WinNoShiftAttention(n, 8, 8, 4),
       (128, 192, n))

    # B. wam0 with its real producers/consumers fused around it
    class Ctx(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = GDN(n, name="gdn1")(x)
            x = WinNoShiftAttention(n, 8, 8, 4, name="wam0")(x)
            for i in range(3):
                x = ResidualBottleneck(n, name=f"rb1_{i}")(x)
            x = ResidualBlockWithStride(n, 2, name="rbs1")(x)
            return x

    ab("B gdn+wam0+3rb+rbs1 @128x192", Ctx(), (128, 192, n))

    # C. the full rich analysis transform (stage bill: ~119 ms XLA)
    ab("C rich g_a @512x768", AnalysisTransform(n, variant="rich"),
       (512, 768, 3), iters=5)

    # D. flagship full forward
    from lic_tpu.models import build_model

    model = build_model("net_unet_ha_hs_dec")
    x = jnp.asarray(
        rng.standard_normal((8, 512, 768, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = jax.jit(
        lambda k, xx: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
        )
    )(jax.random.PRNGKey(0), x)["params"]
    params = bf16_params(params)

    def fwd_xla(p, xx):
        return model.apply({"params": p}, xx, training=False).x_tilde

    def fwd_pal(p, xx):
        return model.apply({"params": p}, xx, training=False).x_tilde

    set_pallas_attn(False)
    t0, _ = timeit(jax.jit(fwd_xla), params, x, iters=5)
    set_pallas_attn(True)
    t1, _ = timeit(jax.jit(fwd_pal), params, x, iters=5)
    set_pallas_attn(False)
    mp = 8 * 512 * 768 / 1e6
    print(
        f"  {'D flagship fwd @512x768':34s} xla {t0:7.2f} ms ({mp / t0 * 1e3:6.1f}"
        f" MP/s)  pallas {t1:7.2f} ms ({mp / t1 * 1e3:6.1f} MP/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
