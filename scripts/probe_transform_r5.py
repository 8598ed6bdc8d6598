"""Round-5 probe C: per-step marginal cost of the rich g_a / g_s.

The floor-corrected stage profile (chain7.log 00:06) puts 113 of the
flagship's 124 ms in the two transforms (g_a 59.8, g_s+tail 53.3).  This
probe times CUMULATIVE PREFIXES of the rich step sequences (the
``prefix`` knob on Analysis/SynthesisTransform — single source of truth
with the real model) with the two-point slope fit, so each step's
marginal cost is measured inside its true fusion context.

Run via the rd_runs queue (holds the TPU flock).
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

    from lic_tpu.models import build_model
    from lic_tpu.models.transforms import AnalysisTransform, SynthesisTransform
    from lic_tpu.utils.amp import bf16_params

    model = build_model("net_unet_ha_hs_dec")
    cfg = model.cfg
    rng = np.random.default_rng(0)
    print(f"flagship cfg: N={cfg.N} M={cfg.M} transform={cfg.transform}",
          flush=True)

    def sweep(mod_cls, kwargs, x, names):
        prev = 0.0
        for k in range(1, len(names) + 1):
            mod = mod_cls(**kwargs, prefix=k)
            params = mod.init(jax.random.PRNGKey(0), x)["params"]
            params = bf16_params(params)
            f = jax.jit(lambda p, xx, m=mod: m.apply({"params": p}, xx))
            t = slope(f, params, x)
            print(f"  +{names[k-1]:8s}: cum {t:7.2f} ms   delta {t - prev:7.2f} ms",
                  flush=True)
            prev = t

    x = jnp.asarray(
        rng.uniform(-1, 1, (8, 512, 768, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ga_names = [n for n, _ in AnalysisTransform(cfg.N, "rich").rich_steps()]
    print("g_a (rich) @8x512x768x3 bf16:", flush=True)
    sweep(AnalysisTransform, dict(N=cfg.N, variant="rich"), x, ga_names)

    gs_out = cfg.M if (cfg.syntax != "none" and cfg.syntax_decoder) else 3
    y = jnp.asarray(
        rng.standard_normal((8, 32, 48, cfg.N)).astype(np.float32)
    ).astype(jnp.bfloat16)
    gs = SynthesisTransform(cfg.N, gs_out, "rich")
    gs_names = [n for n, _ in gs.rich_steps()]
    print(f"g_s (rich) @8x32x48x{cfg.N} -> {gs_out}ch bf16:", flush=True)
    sweep(
        SynthesisTransform,
        dict(N=cfg.N, out_channels=gs_out, variant="rich"),
        y, gs_names,
    )


if __name__ == "__main__":
    main()
