"""TPU probe: itemized codec-path timing (round 4) for the two slowest
AR families — entroformer checkerboard and the (newly batched) neural-
syntax wavefront coder.

Times each stage separately so the next optimization targets the real
bottleneck: device passes (context transformers / wavefront scan), host
rANS encodes/decodes, and the end-to-end roundtrips bench.py reports as
entro_codec_mps / ns_codec_mps.  Run via the rd_runs queue.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timer():
    def t(f, reps=3):
        f()  # warm
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            vals.append(time.perf_counter() - t0)
        return statistics.median(vals) * 1e3

    return t


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _bench_batch
    from lic_tpu.models import build_model
    from lic_tpu.models.compress import ChannelCoder
    from lic_tpu.utils.checkpoint import load_params

    t = timer()

    # ================= entroformer checkerboard (B=8, 768x512) ========
    h, w, b = 512, 768, 8
    model = build_model("entroformer_cb")
    x = jnp.asarray(_bench_batch(b, h, w))
    init = jax.jit(
        lambda k, xx: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
        )
    )
    params = init(jax.random.PRNGKey(0), x)["params"]
    ckpt = "rd_runs/v2_entro_0.0067/params.npz"
    if os.path.exists(ckpt):
        params = load_params(ckpt, params)
        print("entro: trained ckpt")
    coder = ChannelCoder(model, params, name="entroformer_cb")

    z3 = coder._analyze(x)
    _ = float(jnp.ravel(z3)[0])
    print(f"entro analyze:        {t(lambda: float(jnp.ravel(coder._analyze(x))[0])):8.1f} ms")
    z_sym16, z_hat = coder._z_enc(z3)
    _ = float(jnp.ravel(z_hat)[0])

    def enc_pass():
        s, r, *_ = coder._slices_pass(
            z_hat, z3, jnp.zeros((b, 2 * coder.charm_lanes), jnp.int32),
            jnp.int32(0),
        )
        return float(jnp.ravel(s)[0])

    print(f"entro enc pass:       {t(enc_pass):8.1f} ms")
    sym_dev, rows_dev, *_ = coder._slices_pass(
        z_hat, z3, jnp.zeros((b, 2 * coder.charm_lanes), jnp.int32),
        jnp.int32(0),
    )
    sym_np, rows_np = np.asarray(sym_dev), np.asarray(rows_dev)
    counts = coder._charm_step_counts(z3.shape[1], z3.shape[2])

    def host_enc():
        return [
            coder.lane_codec.encode(
                sym_np[i], rows_np[i], counts, coder.charm_lanes
            )
            for i in range(b)
        ]

    print(f"entro host lane-enc:  {t(host_enc):8.1f} ms")
    blobs = coder.compress_batch(x)
    print(f"entro compress_batch: {t(lambda: coder.compress_batch(x)):8.1f} ms")
    rec = coder.decompress_batch(blobs)
    _ = float(jnp.ravel(rec)[0])
    print(f"entro decomp_batch:   {t(lambda: float(jnp.ravel(coder.decompress_batch(blobs))[0])):8.1f} ms")

    def roundtrip():
        bl = coder.compress_batch(x)
        return float(jnp.ravel(coder.decompress_batch(bl))[0])

    ms = t(roundtrip)
    print(f"entro roundtrip:      {ms:8.1f} ms  -> {b*h*w/1e6/(ms/1e3):.3f} MP/s")

    # ================= neural-syntax wavefront (B=8, 256x384) =========
    nh, nw = 256, 384
    ns_model = build_model("neural_syntax")
    xs8 = x[:, :nh, :nw]
    ns_init = jax.jit(
        lambda k, xx: ns_model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
        )
    )
    ns_params = ns_init(jax.random.PRNGKey(0), xs8)["params"]
    ns = ChannelCoder(ns_model, ns_params, name="neural_syntax")

    z3 = ns._analyze(xs8)
    _ = float(jnp.ravel(z3)[0])
    print(f"ns analyze:           {t(lambda: float(jnp.ravel(ns._analyze(xs8))[0])):8.1f} ms")
    z2 = ns._ns_ha(z3)
    z2_int = np.asarray(jnp.round(z2)).astype(np.int32)
    h2 = ns._ns_hs(jnp.asarray(z2_int, jnp.float32))
    _ = float(jnp.ravel(h2)[0])
    print(f"ns ha+hs:             {t(lambda: float(jnp.ravel(ns._ns_hs(ns._ns_ha(ns._analyze(xs8))))[0])):8.1f} ms")

    content = z3[..., ns.model.cfg.M:]
    y_int = np.asarray(jnp.round(content)).astype(np.int32)
    hy, wy = y_int.shape[1], y_int.shape[2]
    fn, groups, n_lanes, p_max, c = ns._ns_scan(hy, wy, batch=b)
    h2_dev = jnp.asarray(np.asarray(h2, np.float32))
    y_dev = jnp.asarray(y_int)
    dummy = jnp.zeros((b, 2 * n_lanes), jnp.int32)

    def enc_scan():
        res, rows, *_ = fn(h2_dev, dummy, y_dev, jnp.int32(0))
        return float(jnp.ravel(res)[0])

    print(f"ns enc scan (B={b}):    {t(enc_scan):8.1f} ms   (T={len(groups)}, "
          f"p_max={p_max}, lanes={n_lanes})")

    blobs8 = ns.compress_batch(xs8)
    print(f"ns compress_batch:    {t(lambda: ns.compress_batch(xs8)):8.1f} ms")
    rec = ns.decompress_batch(blobs8)
    _ = float(jnp.ravel(rec)[0])
    print(f"ns decomp_batch:      {t(lambda: float(jnp.ravel(ns.decompress_batch(blobs8))[0])):8.1f} ms")

    def ns_roundtrip():
        bl = ns.compress_batch(xs8)
        return float(jnp.ravel(ns.decompress_batch(bl))[0])

    ms = t(ns_roundtrip)
    print(f"ns roundtrip (B={b}):   {ms:8.1f} ms  -> {b*nh*nw/1e6/(ms/1e3):.3f} MP/s")

    # single-image comparison (the round-3 accounting)
    xs1 = xs8[:1]
    blob1 = ns.compress(xs1)
    rec1 = ns.decompress(blob1)
    _ = float(jnp.ravel(rec1)[0])

    def ns_rt1():
        bl = ns.compress(xs1)
        return float(jnp.ravel(ns.decompress(bl))[0])

    ms = t(ns_rt1)
    print(f"ns roundtrip (B=1):   {ms:8.1f} ms  -> {nh*nw/1e6/(ms/1e3):.3f} MP/s")


if __name__ == "__main__":
    main()
