"""TPU probe: pallas rANS drain kernel vs the decode_chunk scan.

Gates flipping ``coding.pallas_rans._AUTO_ON_TPU``:
1. raw drain parity on real hardware (values/state/ptr, with escapes) at
   a small shape and at the bench slice shape (B=8, L=128, 73728 syms);
2. drain wall-clock scan vs pallas at the bench slice shape;
3. whole-codec roundtrip (trained source_net checkpoint when present)
   decode parity + MP/s both ways.

Prints PALLAS_DRAIN OK/FAILED; always exits 0 so the queue continues.
Run via the rd_runs queue (serial TPU).
"""

import os
import statistics
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(x):
    """block_until_ready does NOT fence on axon; host-fetch a scalar."""
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timeit(f, *args, iters=5, repeats=3):
    out = f(*args)
    fence(out[1] if isinstance(out, tuple) else out)
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out[1] if isinstance(out, tuple) else out)
        vals.append((time.perf_counter() - t0) / iters * 1e3)
    return statistics.median(vals), out


def make_streams(cdfs, offsets, b, n, n_lanes, seed):
    from lic_tpu.coding.device_rans import Rans16InterleavedCodec

    rng = np.random.default_rng(seed)
    codec = Rans16InterleavedCodec(cdfs, offsets)
    nsyms = cdfs.shape[1] - 2
    syms, idxs, pays = [], [], []
    for i in range(b):
        idx = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
        sym = (offsets[idx] + rng.integers(0, nsyms, n)).astype(np.int32)
        k = max(1, n // 513)  # sprinkle escapes
        pos = rng.choice(n, k, replace=False)
        sym[pos] = rng.integers(-3000, 3000, k).astype(np.int32)
        blob = codec.encode(sym, idx, np.asarray([n]), n_lanes)
        _, payload = Rans16InterleavedCodec.parse(blob)
        syms.append(sym)
        idxs.append(idx)
        pays.append(payload.astype(np.int32))
    wmax = max(p.size for p in pays) + n_lanes
    pay = np.zeros((b, wmax), np.int32)
    for i, p in enumerate(pays):
        pay[i, : p.size] = p
    return np.stack(syms), np.stack(idxs), pay


def raw_parity_and_speed():
    import jax
    import jax.numpy as jnp

    from lic_tpu.coding.codec import GaussianCoder
    from lic_tpu.coding.device_rans import DeviceRans16Interleaved
    from lic_tpu.coding.pallas_rans import pallas_drain

    g = GaussianCoder()
    cdfs, offsets = g.codec.cdfs, g.codec.offsets
    print(f"tables: {cdfs.shape[0]} rows x {cdfs.shape[1]}")

    failures = []
    # bench case FIRST: L=128 is the native lane width — the 2026-08-19
    # run miscompared at L=32 and aborted before ever measuring L=128.
    for tag, b, n, L in (
        ("bench  b8 L128 n=73728", 8, 73728, 128),
        ("small  b1 L32  n=4096 ", 1, 4096, 32),
    ):
        sym, idx, pay = make_streams(cdfs, offsets, b, n, L, seed=len(tag))
        dev = DeviceRans16Interleaved(cdfs, offsets, L)
        payj = jnp.asarray(pay)
        rowsj = jnp.asarray(idx)

        def scan_drain(payload, rows):
            lanes = dev.init_lanes(payload)
            mc = -(-n // L)
            rows_pad = jnp.pad(rows, ((0, 0), (0, mc * L - n)))
            rows_sc = rows_pad.reshape(b, mc, L).transpose(1, 0, 2)
            valid_sc = (
                jnp.arange(mc)[:, None] * L + jnp.arange(L)[None, :]
            ) < n

            def chunk(lanes, xs):
                rk, vd = xs
                vals, lanes = dev.decode_chunk(
                    lanes, payload, rk, jnp.broadcast_to(vd, (b, L))
                )
                return lanes, vals

            lanes, dec = jax.lax.scan(
                chunk, lanes, (rows_sc, jnp.asarray(valid_sc)), unroll=8
            )
            return (
                lanes.state,
                dec.transpose(1, 0, 2).reshape(b, -1)[:, :n],
            )

        def pal_drain(payload, rows):
            lanes, dec = pallas_drain(
                dev, dev.init_lanes(payload), payload, rows, n,
                interpret=False,
            )
            return lanes.state, dec

        t_scan, (st_s, dec_s) = timeit(jax.jit(scan_drain), payj, rowsj)
        t_pal, (st_p, dec_p) = timeit(jax.jit(pal_drain), payj, rowsj)
        ok_vals = np.array_equal(np.asarray(dec_p), np.asarray(dec_s))
        ok_sym = np.array_equal(np.asarray(dec_p), sym)
        ok_st = np.array_equal(np.asarray(st_p), np.asarray(st_s))
        print(
            f"  {tag}: scan {t_scan:8.2f} ms  pallas {t_pal:8.2f} ms "
            f"({t_scan / t_pal:5.2f}x)  vals={'OK' if ok_vals else 'DIFF'} "
            f"sym={'OK' if ok_sym else 'DIFF'} state={'OK' if ok_st else 'DIFF'}"
        )
        if not (ok_vals and ok_sym and ok_st):
            d = np.asarray(dec_p) != np.asarray(dec_s)
            idx = np.argwhere(d)
            if idx.size:
                i0 = tuple(idx[0])
                print(
                    f"    ndiff={int(d.sum())}/{d.size}  first at {i0}: "
                    f"pallas={np.asarray(dec_p)[i0]} scan={np.asarray(dec_s)[i0]}"
                )
            failures.append(tag)
    if failures:
        raise AssertionError(f"raw drain parity failed at {failures}")


def codec_roundtrip():
    import jax
    import jax.numpy as jnp

    from lic_tpu.coding.pallas_rans import set_pallas_rans
    from lic_tpu.models import build_model
    from lic_tpu.models.compress import ChannelCoder
    from lic_tpu.utils.checkpoint import load_params

    model = build_model("source_net")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 512, 768, 3)).astype(np.float32))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )
    params = v["params"]
    ckpt = "rd_runs/v2_src_0.0130/params.npz"
    src = "random init"
    if os.path.exists(ckpt):
        params = load_params(ckpt, params)
        src = ckpt
    print(f"codec roundtrip on {src}, 512x768")

    set_pallas_rans(False)
    scan_coder = ChannelCoder(model, params, name="source_net")
    blob = scan_coder.compress(x)
    mp = 512 * 768 / 1e6

    t0 = time.perf_counter()
    for _ in range(3):
        rec_s = scan_coder.decompress(blob)
    t_scan = (time.perf_counter() - t0) / 3

    set_pallas_rans(True)
    pal_coder = ChannelCoder(model, params, name="source_net")
    blob_p = pal_coder.compress(x)
    assert blob_p == blob, "encode bytes differ (must be drain-independent)"
    t0 = time.perf_counter()
    for _ in range(3):
        rec_p = pal_coder.decompress(blob)
    t_pal = (time.perf_counter() - t0) / 3
    set_pallas_rans(None)

    same = np.array_equal(np.asarray(rec_s), np.asarray(rec_p))
    bpp = len(blob) * 8 / (512 * 768)
    print(
        f"  bpp {bpp:.3f}  decode scan {t_scan * 1e3:7.1f} ms  "
        f"pallas {t_pal * 1e3:7.1f} ms ({t_scan / t_pal:4.2f}x)  "
        f"recon={'BITEXACT' if same else 'DIFF'}"
    )
    print(
        f"  decode-only MP/s: scan {mp / t_scan:6.3f}  "
        f"pallas {mp / t_pal:6.3f}"
    )
    if not same:
        raise AssertionError("codec roundtrip recon mismatch")


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    try:
        raw_parity_and_speed()
        codec_roundtrip()
        print("PALLAS_DRAIN: OK")
    except Exception:
        traceback.print_exc()
        print("PALLAS_DRAIN: FAILED")


if __name__ == "__main__":
    main()
