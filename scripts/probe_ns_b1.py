"""Round-5 probe B: where does the B=1 neural-syntax wavefront decode go?

The batched path amortizes a per-step floor the single-image path pays in
full (BENCH r4: 1.45 MP/s B=8 vs 0.31 B=1).  The scan body has a clean
internal split: encode mode (use_stream=0) runs the SAME context head but
skips the whole rANS drain behind one lax.cond — so

    t(decode scan) − t(encode scan)  =  the serial drain bill
    t(encode scan)                   =  context head + scatter/gather bill

Also times the end-to-end compress/decompress and reports per-wavefront
numbers.  Run via the rd_runs queue.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _fence(out):
    # block_until_ready does not fence on the tunneled platform
    # (docs/PERF.md); fetch a scalar that depends on the last output.
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "reshape")]
    if leaves:
        float(leaves[-1].reshape(-1)[0].astype("float32"))


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.models import build_model
    from lic_tpu.models.compress import ChannelCoder

    rng = np.random.default_rng(0)
    model = build_model("neural_syntax")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 512, 768, 3)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )["params"]
    coder = ChannelCoder(model, params, name="neural_syntax")

    blob = coder.compress(x)                      # warm/compile
    rec = coder.decompress(blob)
    jax.block_until_ready(rec)
    print(f"stream {len(blob)} bytes", flush=True)

    for label, f in (
        ("compress  ", lambda: coder.compress(x)),
        ("decompress", lambda: coder.decompress(blob)),
    ):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f()
            _fence(out)
            ts.append(time.perf_counter() - t0)
        mp = 512 * 768 / 1e6
        print(f"  {label}: {min(ts)*1e3:7.1f} ms  ({mp/min(ts):.3f} MP/s)", flush=True)

    # isolate the wavefront scan: encode mode vs decode mode
    hy, wy = 512 // 16, 768 // 16
    fn, groups, n_lanes, p_max, c = coder._ns_scan(hy, wy, batch=1)
    T = len(groups)
    print(f"T={T} wavefronts, p_max={p_max}, c={c}, lanes={n_lanes}", flush=True)

    z3 = coder._analyze(x)
    z2 = coder._ns_ha(z3)
    h2 = coder._ns_hs(jnp.round(z2))
    n_sym = hy * wy * c
    payload = jnp.zeros((1, n_sym + 4 * n_lanes), jnp.int32)
    y_known = jnp.round(z3[..., model.cfg.M:]).astype(jnp.int32)

    for label, flag in (("encode-mode scan (head only)", 0),
                        ("decode-mode scan (head+drain)", 1)):
        out = fn(h2, payload, y_known, jnp.int32(flag))   # compile
        _fence(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(h2, payload, y_known, jnp.int32(flag))
            _fence(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(
            f"  {label}: {best*1e3:7.1f} ms total, {best/T*1e6:7.0f} us/wavefront",
            flush=True,
        )


if __name__ == "__main__":
    main()
