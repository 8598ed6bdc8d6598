"""TPU probe: itemized real-codec-path timing (round 3).

Times the batched ChARM codec stages separately — analyze/z/slices_pass
encode, host lane-encode, z host decode, slices_pass decode (the on-device
rANS chunk loop), synthesize — plus the end-to-end compress+decompress
roundtrip `bench.py` reports as codec_mps.  Run via the rd_runs queue.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


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

    h, w, b = 512, 768, 8
    model = build_model("source_net")
    x = jnp.asarray(_bench_batch(b, h, w))
    init = jax.jit(
        lambda k, xx: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
        )
    )
    params = init(jax.random.PRNGKey(0), x)["params"]
    params = load_params("rd_runs/v2_src_0.0130/params.npz", params)
    coder = ChannelCoder(model, params, name="source_net")

    def t(f, reps=3):
        f()  # warm
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            vals.append(time.perf_counter() - t0)
        return statistics.median(vals) * 1e3

    # ---- encode stages
    z3 = coder._analyze(x)
    _ = float(jnp.ravel(z3)[0])
    print(f"analyze:            {t(lambda: float(jnp.ravel(coder._analyze(x))[0])):8.1f} ms")
    z_sym16, z_hat = coder._z_enc(z3)
    _ = float(jnp.ravel(z_hat)[0])

    def enc_pass():
        s, r, _, _, _ = coder._slices_pass(
            z_hat, z3,
            jnp.zeros((b, 2 * coder.charm_lanes), jnp.int32),
            jnp.int32(0),
        )
        return np.asarray(s), np.asarray(r)

    sym_np, rows_np = enc_pass()
    print(f"slices_pass (enc):  {t(lambda: enc_pass()):8.1f} ms")

    counts = coder._charm_step_counts(z3.shape[1], z3.shape[2])
    z_sym = np.asarray(z_sym16)

    def host_enc():
        zb = [coder.z_coder.encode_symbols(z_sym[i : i + 1]) for i in range(b)]
        yb = [
            coder.lane_codec.encode(sym_np[i], rows_np[i], counts, coder.charm_lanes)
            for i in range(b)
        ]
        return zb, yb

    z_blobs, y_blobs = host_enc()
    print(f"host rANS encode:   {t(lambda: host_enc()):8.1f} ms")

    # ---- decode stages
    from lic_tpu.coding.device_rans import Rans16InterleavedCodec

    z_shape = (1, h // 64, w // 64, coder.z_coder.medians.shape[0])

    def host_zdec():
        return [coder.z_coder.decode_symbols(zb, z_shape) for zb in z_blobs]

    zs = host_zdec()
    print(f"host z decode:      {t(lambda: host_zdec()):8.1f} ms")

    payloads = []
    for blob in y_blobs:
        nl, pay = Rans16InterleavedCodec.parse(blob)
        payloads.append(pay)
    wmax = max(p.size for p in payloads) + coder.charm_lanes
    pay_flat = np.zeros((b, wmax), np.int32)
    for i, p in enumerate(payloads):
        pay_flat[i, : p.size] = p
    zh = coder._z_dec(jnp.asarray(np.concatenate(zs, axis=0).astype(np.int16)))
    _ = float(jnp.ravel(zh)[0])

    def dec_pass():
        _, _, yf, st, pt = coder._slices_pass(
            zh,
            jnp.zeros((b, h // 16, w // 16, model.cfg.N), jnp.float32),
            jnp.asarray(pay_flat),
            jnp.int32(1),
        )
        return yf, float(jnp.ravel(st)[0])

    y_full, _ = dec_pass()
    print(f"slices_pass (dec):  {t(lambda: dec_pass()):8.1f} ms")
    syn = (
        coder._syntax(z3)
        if model.cfg.syntax != "none"
        else None
    )
    print(f"synthesize:         {t(lambda: float(jnp.ravel(coder._synthesize(y_full, syn))[0])):8.1f} ms")

    # ---- end-to-end (bench.py's codec_mps discipline)
    mp = h * w * b / 1e6

    def roundtrip():
        blobs = coder.compress_batch(x)
        rec = coder.decompress_batch(blobs)
        _ = float(jnp.ravel(rec)[0])
        return blobs

    blobs = roundtrip()
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        roundtrip()
        vals.append(mp / (time.perf_counter() - t0))
    bpp = sum(len(bb) for bb in blobs) * 8 / (h * w * b)
    print(
        f"E2E roundtrip: {statistics.median(vals):.3f} MP/s median "
        f"(max {max(vals):.3f}) at {bpp:.3f} bpp"
    )


if __name__ == "__main__":
    main()
