"""Throughput benchmark: combined encode+decode megapixels/sec/chip.

Runs the scale-hyperprior ChARM codec (source_net preset: plain GDN
transforms, classic dual hyper, factorized z prior — BASELINE.json config
#2 territory) in eval mode on Kodak-sized images and reports sustained
throughput.  Baseline target: 100 MP/s/chip (BASELINE.md).

Reporting: the headline value is the MEDIAN over repeats of the best
config (the shared host/tunnel adds heavy run-to-run variance; the median
is the honest sustained number — the max and per-config numbers ride in
"extra").  A second metric — the REAL codec path (device passes + host
rANS entropy coding, batched ping-pong with host/device overlap) — is
reported as extra.codec_mps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import statistics
import sys
import time

import numpy as np

BASELINE_MPS = 100.0

# Held for the whole run; the fd must outlive main() or the lock drops.
_TPU_LOCK_FD = None


def _acquire_tpu_lock(path="rd_runs/tpu.lockfile", max_wait_s=2700):
    """Serialize TPU ownership with the training-queue runner.

    rd_runs/runner3.sh holds a flock on this file for the duration of each
    queued job; a benchmark that starts mid-job would contend for the one
    tunneled chip and corrupt both timings.  Wait (bounded) for the lock
    instead.  Best-effort: any OS-level failure falls through to running
    unlocked rather than failing the benchmark."""
    global _TPU_LOCK_FD
    if os.environ.get("LIC_TPU_LOCK_HELD"):
        # the queue runner already wraps this process in a flock on the
        # same file — a second acquire from this (child) process would
        # block against our own parent until the timeout
        return
    try:
        import fcntl

        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        deadline = time.time() + max_wait_s
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                _TPU_LOCK_FD = fd
                return
            except OSError:
                if time.time() > deadline:
                    print(
                        "bench: TPU lock still held after "
                        f"{max_wait_s}s; proceeding unlocked",
                        file=sys.stderr,
                    )
                    os.close(fd)
                    return
                print("bench: waiting for TPU lock (queue job running)",
                      file=sys.stderr)
                time.sleep(15)
    except Exception:
        pass


def _measure(forward, params, x, iters=20):
    """Total seconds for `iters` forwards, two-point slope-corrected.

    NOTE: on the tunneled device platform `block_until_ready` returns
    before execution completes; a host fetch of a scalar that depends on
    the last output is the only reliable fence (device programs execute
    in-order, so the last completion implies all).  A fenced burst also
    pays a ~35 ms flush/startup constant (probe_conv_r5 harness-floor
    measurement, round 5), so a single burst at small `iters` overstates
    per-iter cost by ~35/iters ms; the slope between an `iters` and a
    5·`iters` burst cancels the constant.  Returns slope · iters so call
    sites keep their `mp_batch * iters / _measure(...)` shape.
    """
    out = forward(params, x)  # warmup / compile
    float(out[1])

    def burst(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = forward(params, x)
        float(out[1])
        return time.perf_counter() - t0

    t_lo = burst(iters)
    t_hi = burst(iters * 5)
    return (t_hi - t_lo) / 4.0


def _bench_batch(batch, h, w):
    """Real-photograph batch (crops of the on-disk image corpus) so the
    codec-path metric codes realistic ~1 bpp streams, not 4.6 bpp noise.
    Falls back to uniform noise (same FLOPs — forward timing is
    content-independent dense math)."""
    try:
        from PIL import Image

        sp = "/opt/venv/lib/python3.12/site-packages"
        srcs = [
            f"{sp}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile.png",
            f"{sp}/dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorSkybox2048.png",
            f"{sp}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/wood1.png",
            f"{sp}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/skin.png",
            f"{sp}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/dice.png",
            f"{sp}/dm_control/suite/dog_assets/skin_texture.png",
            "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/ss.png",
            f"{sp}/labmaze/assets/sky_01/ft.png",
        ]
        # skip unreadable sources per image: one missing path must not
        # silently turn the WHOLE batch into 4.6 bpp noise (codec numbers
        # would stop being comparable across hosts with no indicator)
        planes = []
        for p in srcs:
            try:
                im = Image.open(p).convert("RGB")
                iw, ih = im.size
                if iw < w or ih < h:
                    im = im.resize((max(iw, w), max(ih, h)), Image.LANCZOS)
                planes.append(
                    np.asarray(im)[:h, :w].astype(np.float32) / 127.5 - 1.0
                )
            except Exception:
                continue
        if not planes:
            raise FileNotFoundError("no bench source images readable")
        out = np.empty((batch, h, w, 3), np.float32)
        for i in range(batch):
            out[i] = planes[i % len(planes)]
        return out
    except Exception as e:
        import sys

        print(f"bench: falling back to noise batch ({e})", file=sys.stderr)
        return (
            np.random.default_rng(0)
            .uniform(-1, 1, (batch, h, w, 3))
            .astype(np.float32)
        )


def _probe_tpu(timeout_s=240):
    """Bounded TPU availability check in a subprocess.

    The image's sitecustomize points jax at the tunneled `axon` platform
    and `jax.devices()` blocks FOREVER inside backend init while the
    tunnel is down — an in-process check cannot time out.  Probing in a
    killable child turns a would-be hang into a fast, honest failure."""
    import subprocess

    code = (
        "import jax\n"
        "assert jax.devices()[0].platform != 'cpu'\n"
        "x = jax.numpy.zeros(8) + 1\n"
        "assert float(x.sum()) == 8.0\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    _acquire_tpu_lock()
    if not _probe_tpu():
        print(
            "bench: TPU unavailable (axon tunnel down) — refusing to hang "
            "in backend init; no number is better than a fake one",
            file=sys.stderr,
        )
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lic_tpu.models import build_model
    from lic_tpu.utils.amp import bf16_params

    h, w = 512, 768  # Kodak-sized
    batch = 8        # best measured throughput point (batch 16 thrashes HBM)
    mp_batch = h * w * batch / 1e6
    model = build_model("source_net")
    x = jnp.asarray(_bench_batch(batch, h, w))

    init = jax.jit(
        lambda k, xx: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, xx, training=True
        )
    )
    params = init(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def forward(params, x):
        out = model.apply({"params": params}, x, training=False)
        return out.x_tilde, out.bpp

    iters = 10
    repeats = 5
    extra = {}

    def bench_config(p, xx):
        vals = [
            mp_batch * iters / _measure(forward, p, xx, iters)
            for _ in range(repeats)
        ]
        return statistics.median(vals), max(vals)

    extra["fp32_median"], extra["fp32_max"] = bench_config(params, x)

    pb = bf16_params(params)
    xb = x.astype(jnp.bfloat16)
    extra["bf16_median"], extra["bf16_max"] = bench_config(pb, xb)

    best_median = max(extra["fp32_median"], extra["bf16_median"])

    # ---- heavier presets: the reference's actual eval/train entries
    # (net_ga = eval_net.py:16; net_unet_ha_hs* = train_net_unet.py:16) —
    # rich transforms + SWAtten + U-Net hyper.  Reported so the headline
    # doesn't speak only for the lightest model.
    # ("source_net:high" = the reference's --high N=384/M=32 capacity,
    # model/net.py:446-453 — capacity changes the perf picture)
    # The fused Pallas W-MSA kernel is the on-TPU DEFAULT (probe_attn_e2e:
    # flagship forward 180.9 → 125.4 ms, 1.44×, relerr 0); ":xla_attn"
    # re-times the flagship with it forced off so one bench run documents
    # the delta.  NOTE each variant gets its OWN jitted function object
    # (jit caches per function, and the pallas flag is read at trace
    # time — sharing one fwd would silently reuse the first compile).
    from lic_tpu.layers.win_attention import set_pallas_attn

    for name in (
        "net_unet_ha_hs_dec",
        "net_unet_ha_hs_dec:xla_attn",
        "net_ga",
        "source_net:high",
    ):
        preset, _, variant = name.partition(":")
        try:
            m2 = build_model(preset, is_high=(variant == "high"))
            init2 = jax.jit(
                lambda k, xx, m=m2: m.init(
                    {"params": k, "noise": jax.random.PRNGKey(1)},
                    xx, training=True,
                )
            )
            p2 = bf16_params(init2(jax.random.PRNGKey(0), x)["params"])

            @jax.jit
            def fwd2(p, xx, m=m2):
                o = m.apply({"params": p}, xx, training=False)
                return o.x_tilde, o.bpp

            if variant == "xla_attn":
                set_pallas_attn(False)
            try:
                vals = [
                    mp_batch * iters / _measure(fwd2, p2, xb, iters)
                    for _ in range(3)
                ]
            finally:
                set_pallas_attn(None)  # restore platform auto-default
            key = name.replace(":", "_")
            extra[f"{key}_bf16_median"] = statistics.median(vals)
        except Exception as e:
            extra[f"{name.replace(':', '_')}_error"] = f"{type(e).__name__}: {e}"

    # ---- real codec path: device passes + host rANS, batched/overlapped
    try:
        from lic_tpu.models.compress import ChannelCoder

        # Random-init latents are ~4.6 bpp of noise and overstate the host
        # entropy-coding share; use the in-repo trained checkpoint (realistic
        # ~1 bpp streams) when present.
        import os

        ckpt = "rd_runs/v2_src_0.0130/params.npz"
        codec_params = params
        if os.path.exists(ckpt):
            from lic_tpu.utils.checkpoint import load_params

            codec_params = load_params(ckpt, params)
            # pin provenance: without the sha the codec rows silently
            # switch rate points whenever the checkpoint is regenerated
            # (VERDICT r4 weak #8)
            import hashlib

            with open(ckpt, "rb") as fh:
                sha = hashlib.sha256(fh.read()).hexdigest()
            extra["codec_params"] = "trained (rd_runs/v2_src_0.0130)"
            extra["codec_params_sha256"] = sha[:16]
        else:
            extra["codec_params"] = (
                "UNTRAINED FALLBACK (bench checkpoint missing — codec rows "
                "not comparable across rounds)"
            )

        coder = ChannelCoder(model, codec_params, name="source_net")
        blobs = coder.compress_batch(x)          # warmup/compile
        rec = coder.decompress_batch(blobs)
        _ = float(jnp.ravel(rec)[0])
        # 5 repeats: the tunneled host occasionally stalls a roundtrip for
        # hundreds of ms and the driver's recorded number swung 2.0-3.4
        # across runs with median-of-3; median-of-5 rides out one stall,
        # and the max documents the stall-free capability.
        vals = []
        for _ in range(5):
            t0 = time.perf_counter()
            blobs = coder.compress_batch(x)
            rec = coder.decompress_batch(blobs)
            _ = float(jnp.ravel(rec)[0])
            vals.append(mp_batch / (time.perf_counter() - t0))
        extra["codec_mps"] = round(statistics.median(vals), 3)
        extra["codec_mps_max"] = round(max(vals), 3)
        extra["codec_bpp"] = round(
            sum(len(b) for b in blobs) * 8 / (h * w * batch), 4
        )
    except Exception as e:  # codec path must never sink the headline
        extra["codec_error"] = f"{type(e).__name__}: {e}"

    # ---- entroformer checkerboard codec: 2-pass AR on the single-dispatch
    # device-rANS contract (round 3); trained ckpt when the queue has
    # produced one, else random init (bpp then overstates the host share)
    try:
        from lic_tpu.models.compress import ChannelCoder
        from lic_tpu.utils.checkpoint import load_params
        import os

        # preferred rate point first; resets may leave only siblings —
        # the chosen dir + sha are recorded so rate-point switches are
        # visible instead of silent.  Each dir pins the preset it was
        # trained with (the round-5 _full runs use the reference-sized
        # context config — loading them into the scaled-down model would
        # shape-mismatch).
        e_dirs = [
            ("v2_entrofull_0.0067_40k", "entroformer_cb_full"),
            ("v2_entrofull_0.0067", "entroformer_cb_full"),
            ("v2_entro_0.0067", "entroformer_cb"),
            ("v2_entro_0.0130", "entroformer_cb"),
            ("v2_entro_0.0025", "entroformer_cb"),
        ]
        e_ckpt, e_preset = next(
            (
                (f"rd_runs/{d}/params.npz", pr)
                for d, pr in e_dirs
                if os.path.exists(f"rd_runs/{d}/params.npz")
            ),
            (None, "entroformer_cb"),
        )
        e_model = build_model(e_preset)
        e_init = jax.jit(
            lambda k, xx: e_model.init(
                {"params": k, "noise": jax.random.PRNGKey(1)},
                xx, training=True,
            )
        )
        e_params = e_init(jax.random.PRNGKey(0), x)["params"]
        if e_ckpt:
            e_params = load_params(e_ckpt, e_params)
            import hashlib

            with open(e_ckpt, "rb") as fh:
                e_sha = hashlib.sha256(fh.read()).hexdigest()
            extra["entro_codec_params"] = f"trained ({os.path.dirname(e_ckpt)})"
            extra["entro_codec_params_sha256"] = e_sha[:16]
        else:
            extra["entro_codec_params"] = "UNTRAINED FALLBACK"
        e_coder = ChannelCoder(e_model, e_params, name=e_preset)
        blobs = e_coder.compress_batch(x)        # warmup/compile
        rec = e_coder.decompress_batch(blobs)
        _ = float(jnp.ravel(rec)[0])
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            blobs = e_coder.compress_batch(x)
            rec = e_coder.decompress_batch(blobs)
            _ = float(jnp.ravel(rec)[0])
            vals.append(mp_batch / (time.perf_counter() - t0))
        extra["entro_codec_mps"] = round(statistics.median(vals), 3)
        extra["entro_codec_bpp"] = round(
            sum(len(b) for b in blobs) * 8 / (h * w * batch), 4
        )
    except Exception as e:
        extra["entro_codec_error"] = f"{type(e).__name__}: {e}"

    # ---- neural-syntax wavefront codec: the position-sequential AR decode
    # the reference trains but never implements (model/net.py:219-319).
    # Measured on a smaller image — decode is a host loop of ~2H'+W' device
    # calls at latent resolution, the dominant cost is dispatch RTT.
    try:
        from lic_tpu.models.compress import ChannelCoder

        ns_model = build_model("neural_syntax")
        xs = x[:1, :256, :384]
        ns_init = jax.jit(
            lambda k, xx: ns_model.init(
                {"params": k, "noise": jax.random.PRNGKey(1)},
                xx, training=True,
            )
        )
        ns_params = ns_init(jax.random.PRNGKey(0), xs)["params"]
        ns_coder = ChannelCoder(ns_model, ns_params, name="neural_syntax")
        blob = ns_coder.compress(xs)     # warmup/compile
        rec = ns_coder.decompress(blob)
        _ = float(jnp.ravel(rec)[0])
        ns_mp = xs.shape[1] * xs.shape[2] / 1e6
        vals = []
        for _ in range(2):
            t0 = time.perf_counter()
            blob = ns_coder.compress(xs)
            rec = ns_coder.decompress(blob)
            _ = float(jnp.ravel(rec)[0])
            vals.append(ns_mp / (time.perf_counter() - t0))
        extra["ns_codec_b1_mps"] = round(statistics.median(vals), 4)
        extra["ns_codec_bpp"] = round(len(blob) * 8 / (xs.shape[1] * xs.shape[2]), 3)
        # batched wavefront scan (B images ride ONE scan dispatch as
        # independent rANS streams — same batch=8 accounting as the charm
        # and checkerboard rows above)
        xs8 = x[:, :256, :384]
        blobs = ns_coder.compress_batch(xs8)     # warmup/compile
        rec = ns_coder.decompress_batch(blobs)
        _ = float(jnp.ravel(rec)[0])
        ns8_mp = xs8.shape[0] * xs8.shape[1] * xs8.shape[2] / 1e6
        vals = []
        for _ in range(2):
            t0 = time.perf_counter()
            blobs = ns_coder.compress_batch(xs8)
            rec = ns_coder.decompress_batch(blobs)
            _ = float(jnp.ravel(rec)[0])
            vals.append(ns8_mp / (time.perf_counter() - t0))
        extra["ns_codec_mps"] = round(statistics.median(vals), 4)
    except Exception as e:
        extra["ns_codec_error"] = f"{type(e).__name__}: {e}"

    extra["timing"] = "two-point slope fit (burst-constant corrected, r5)"
    extra = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in extra.items()
    }
    print(
        json.dumps(
            {
                "metric": "encode_decode_throughput",
                "value": round(best_median, 3),
                "unit": "megapixels/sec/chip",
                "vs_baseline": round(best_median / BASELINE_MPS, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
