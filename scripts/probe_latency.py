"""Serving-latency probe on the real device: single-image encode/decode
wall-clock (the number the reference prints per image,
``eval_net.py:93-100``) plus CodecService percentiles under a request
storm — the serving-shape complement to bench.py's batched throughput.

Uses the trained bench checkpoint (rd_runs/v2_src_0.0130) when present,
random init otherwise.  Run via the TPU queue (rd_runs/queue.txt).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CKPT = "rd_runs/v2_src_0.0130/params.npz"


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.models import build_model
    from lic_tpu.models.compress import ChannelCoder
    from lic_tpu.serving import CodecService
    from lic_tpu.utils.checkpoint import load_params

    model = build_model("source_net")
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 256, 256, 3), jnp.float32), training=True,
    )
    params = v["params"]
    trained = os.path.exists(CKPT)
    if trained:
        params = load_params(CKPT, params)

    from lic_tpu.data.datasets import load_image_uint8

    img = load_image_uint8(
        "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
        "sample_data/grace_hopper.jpg"
    ).astype(np.float32) / 127.5 - 1.0  # 600x512, pads to 640x512
    x1 = jnp.asarray(img[None])

    coder = ChannelCoder(model, params, name="source_net")
    results = {"params": "trained" if trained else "random-init"}

    # ---- single-image path (b=1 executables; first call compiles) ----
    blob = coder.compress(x1)
    coder.decompress(blob)
    enc, dec = [], []
    for _ in range(10):
        t0 = time.perf_counter()
        blob = coder.compress(x1)
        enc.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        rec = coder.decompress(blob)
        np.asarray(rec)  # fence
        dec.append((time.perf_counter() - t0) * 1e3)
    results["encode_ms_b1"] = round(statistics.median(enc), 1)
    results["decode_ms_b1"] = round(statistics.median(dec), 1)
    results["bpp"] = round(len(blob) * 8 / (img.shape[0] * img.shape[1]), 4)
    print("single-image:", results, flush=True)

    # ---- service under a storm: 32 compresses then their decodes ----
    svc = CodecService(model, params, name="source_net", max_batch=8).start()
    # warm both bucket executables (padded batch of 8) before timing
    svc.submit_compress(img).result()
    t0 = time.perf_counter()
    futs = [svc.submit_compress(img) for _ in range(32)]
    blobs = [f.result() for f in futs]
    t_c = time.perf_counter() - t0
    svc.submit_decompress(blobs[0]).result()  # warm decode bucket
    t0 = time.perf_counter()
    futs = [svc.submit_decompress(b) for b in blobs]
    for f in futs:
        f.result()
    t_d = time.perf_counter() - t0
    snap = svc.stats.snapshot()
    svc.stop()
    mp = img.shape[0] * img.shape[1] / 1e6
    results["service"] = {
        "compress_32_mps": round(32 * mp / t_c, 3),
        "decompress_32_mps": round(32 * mp / t_d, 3),
        "p50_ms": round(snap["p50_ms"], 1),
        "p95_ms": round(snap["p95_ms"], 1),
        "mean_batch": round(snap["mean_batch"], 2),
    }
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
