"""Real-image RD training + held-out evaluation.

The image environment ships no Kodak/DIV2K.  The training corpus is every
real-content image on disk (~29 sources): the sklearn photographs
(china/flower), photographic material textures shipped with the robotics
sims (wood, marble, skin, metal, grass, foil, dice), outdoor skyboxes,
rendered 3-D scenes, and two screenshots/diagrams — diverse natural-image
statistics within the environment's limits.  RD is evaluated on the
HELD-OUT matplotlib grace_hopper.jpg (512x600) and stated as such in
README.

Usage:
    python scripts/train_real.py --preset source_net --lmbda 0.0067 \
        --steps 30000 --out /tmp/rd/source_net_0.0067

Writes: params npz + eval.json (bpp est, real-bitstream bpp, PSNR, MS-SSIM)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_SP = "/opt/venv/lib/python3.12/site-packages"
TRAIN_IMAGES = [
    f"{_SP}/sklearn/datasets/images/china.jpg",
    f"{_SP}/sklearn/datasets/images/flower.jpg",
    f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/wood1.png",
    f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile2.png",
    f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile.png",
    f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/tile1.png",
    f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/metal1.png",
    f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/marble1.png",
    f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/skin.png",
    f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/darkwood.png",
    f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/marble.png",
    f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/silverRaw.png",
    f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/foil.png",
    f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/dice.png",
    f"{_SP}/dm_control/suite/dog_assets/skin_texture.png",
    f"{_SP}/dm_control/suite/dog_assets/tennis_ball.png",
    f"{_SP}/dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorGrassFloorD.png",
    f"{_SP}/dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorSkybox2048.png",
    f"{_SP}/dm_control/locomotion/gaps.png",
    f"{_SP}/dm_control/locomotion/walls.png",
    f"{_SP}/dm_control/locomotion/soccer/soccer.png",
    f"{_SP}/dm_control/locomotion/soccer/assets/pitch/pitch_s.png",
    f"{_SP}/labmaze/assets/sky_01/ft.png",
    f"{_SP}/labmaze/assets/sky_02/ft.png",
    f"{_SP}/labmaze/assets/style_05/floor_orange_d.png",
    f"{_SP}/labmaze/assets/style_01/wall_green_d.png",
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyparsing/docs/_static/pyparsingClassDiagram_3.0.9.jpg",
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/ss.png",
    f"{_SP}/dm_control/blender/mujoco_exporter/doc/ik_target.png",
]
EVAL_IMAGE = (
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
    "sample_data/grace_hopper.jpg"
)
# Train-set eval subset: every distinct image shape costs a fresh multi-
# minute XLA compile on this host, so the train/held-out contrast is
# measured on two fixed photographs rather than all 29 sources.
EVAL_TRAIN_SUBSET = TRAIN_IMAGES[:2]


def build_aug_pool(paths, n_crops, crop, seed):
    """Host-side augmented crop pool: multi-scale (0.55–1.0 LANCZOS
    downscales), 90° rotations, flips and mild brightness/contrast jitter
    over the training photographs → uint8 (N, crop, crop, 3).

    With only two training photos, a plain random-crop sampler lets the
    entropy model memorize their local statistics (train bpp 0.6 vs
    held-out 1.5 observed at λ=0.0067); scale/rotation diversity is the
    standard LIC regularizer for tiny corpora.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    scales = np.linspace(0.55, 1.0, 10)
    pyramid = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        w, h = im.size
        for s in scales:
            nw, nh = max(int(w * s), crop), max(int(h * s), crop)
            pyramid.append(np.asarray(im.resize((nw, nh), Image.LANCZOS)))
    pool = np.empty((n_crops, crop, crop, 3), np.uint8)
    for i in range(n_crops):
        src = pyramid[rng.integers(len(pyramid))]
        t = rng.integers(src.shape[0] - crop + 1)
        l = rng.integers(src.shape[1] - crop + 1)
        c = src[t : t + crop, l : l + crop]
        c = np.rot90(c, rng.integers(4))
        if rng.integers(2):
            c = c[:, ::-1]
        a = rng.uniform(0.9, 1.1)
        b = rng.uniform(-10, 10)
        pool[i] = np.clip(c.astype(np.float32) * a + b, 0, 255).astype(np.uint8)
    return pool


def make_sampler(batch):
    """On-device batch sampler over the uint8 augmented pool.

    The tunneled TPU adds ~0.5 s RTT and limited bandwidth per dispatch;
    shipping host crops dominated the step time.  The pool is uploaded
    once (uint8), each step gathers a random batch + fresh flips inside
    the jitted graph — zero per-step host→device payload.  The pool is an
    explicit ARGUMENT (not a closure capture): closed-over device arrays
    are baked into the HLO as constants and blow the remote-compile
    request past its size limit.
    """
    import jax
    import jax.numpy as jnp

    def sample_batch(pool, key):
        k1, k4, k5 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (batch,), 0, pool.shape[0])
        x = pool[idx].astype(jnp.float32) / 127.5 - 1.0
        fv = jax.random.bernoulli(k4, shape=(batch,))[:, None, None, None]
        fh = jax.random.bernoulli(k5, shape=(batch,))[:, None, None, None]
        x = jnp.where(fv, x[:, ::-1], x)
        x = jnp.where(fh, x[:, :, ::-1], x)
        return x

    return sample_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="source_net")
    ap.add_argument("--override", default="",
                    help="JSON dict of CodecConfig overrides, e.g. "
                         "'{\"entro_topk\": 32}'")
    ap.add_argument("--lmbda", type=float, default=0.0067)
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", default="",
                    help="suffix for this run's log/eval files (e.g. "
                    "'regen_20k' writes train_log_regen_20k.txt + "
                    "eval_regen_20k.json) so a re-run into an existing out "
                    "dir cannot clobber a committed result's provenance")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--wd", type=float, default=0.0,
                    help="decoupled weight decay (AdamW) for the base "
                         "phase; 0 = reference-parity plain Adam")
    ap.add_argument("--init_from", default="",
                    help="warm-start params npz (e.g. the previous λ point)")
    ap.add_argument("--is_high", action="store_true",
                    help="high-rate capacity N=384/M=32 (reference --high)")
    ap.add_argument("--post_processing", action="store_true",
                    help="attach the HAN post-processing tail")
    ap.add_argument("--phase2", action="store_true",
                    help="post-processing-only phase: AdamW over the HAN "
                         "tail, everything else frozen "
                         "(train_net_unet.py:125-134); implies "
                         "--post_processing and a non-strict warm start")
    ap.add_argument("--init_scheme", default="",
                    help="re-init conv/dense kernels per a reference scheme "
                         "(xavier_uniform = the reference's literal "
                         "weight_init, net_unet_ha_hs.py:646-652) before "
                         "training — for A/B'ing the documented LeCun-init "
                         "departure (PARITY.md)")
    ap.add_argument("--pool_size", type=int, default=6144,
                    help="augmented crop pool size (uint8, device-resident)")
    ap.add_argument("--scan_steps", type=int, default=8,
                    help="optimizer steps fused per device dispatch")
    ap.add_argument("--loss", default="mse", choices=("mse", "msssim"),
                    help="R-D objective (train_net_unet.py:83-85; msssim "
                         "uses lambda*(1-msssim)+bpp — reference lambda "
                         "scale differs from the mse objective)")
    ap.add_argument("--lmbda_list", default="",
                    help="comma-separated λ per gain unit (variable-rate "
                         "presets, e.g. source_net_vr): each step samples "
                         "a unit k and trains at (rate=k, λ_k); eval "
                         "reports every rate point from the one checkpoint")
    ap.add_argument("--ema", type=float, default=0.999,
                    help="Polyak-average decay for an EMA copy of the "
                         "params (0 disables). The high-capacity presets "
                         "overfit the 29-image corpus under step "
                         "extensions (held-out PSNR regressed at 0.0130); "
                         "EMA is the standard LIC stabilizer. Both raw and "
                         "EMA params are saved + evaluated.")
    args = ap.parse_args()

    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lic_tpu.config import TrainConfig
    from lic_tpu.data.datasets import load_image_uint8
    from lic_tpu.models import build_model
    from lic_tpu.training.train import create_state, make_optimizer, make_train_step
    from lic_tpu.utils.checkpoint import load_params, save_params

    os.makedirs(args.out, exist_ok=True)
    pool = build_aug_pool(
        TRAIN_IMAGES, args.pool_size, args.crop, seed=args.seed + 99
    )
    pool_dev = jnp.asarray(pool)
    sample_batch = make_sampler(args.batch)

    overrides = {}
    if args.override:
        import json as _json

        overrides.update(_json.loads(args.override))
    if args.is_high:
        overrides["is_high"] = True
    if args.post_processing or args.phase2:
        overrides["post_processing"] = True
    model = build_model(args.preset, **overrides)
    # milestones in step space: reference halves at 30/50/70/80% of the run
    spe = max(args.steps // 100, 1)
    tc = TrainConfig(
        lmbda=args.lmbda, lr=args.lr, batch_size=args.batch,
        crop_size=args.crop,
        lr_milestones=tuple(
            int(args.steps * f / spe) for f in (0.3, 0.5, 0.7, 0.8)
        ),
        # phase2 halvings at 80/90% of the run (reference proportions:
        # 1200/1500, 1350/1500 — train_net_unet.py:125-130)
        pp_milestones=tuple(
            int(args.steps * f / spe) for f in (0.8, 0.9)
        ),
        seed=args.seed,
        loss_type=args.loss,
        weight_decay=args.wd,
        lmbda_list=tuple(
            float(v) for v in args.lmbda_list.split(",") if v
        ),
    )
    opt = make_optimizer(
        tc, steps_per_epoch=spe, post_processing_phase=args.phase2
    )
    x0 = sample_batch(pool_dev, jax.random.PRNGKey(args.seed + 777))
    params = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "noise": jax.random.PRNGKey(args.seed + 1)},
        x0, training=True,
    )["params"]
    if args.init_scheme:
        from lic_tpu.utils.init import apply_init_scheme

        params = apply_init_scheme(
            jax.random.PRNGKey(args.seed + 5), params, args.init_scheme
        )
    if args.init_from:
        params = load_params(args.init_from, params, strict=not args.phase2)
    if model.cfg.post_processing:
        # two-phase split: phase2 trains only the HAN tail, base phase
        # freezes it (reference base_params/post_processing_params)
        from lic_tpu.training.train import freeze_partition

        opt = freeze_partition(opt, params, args.phase2)
    state = create_state(model, opt, x0, seed=args.seed, params=params)

    # The tunneled device adds ~0.5 s RTT per dispatch; scan K optimizer
    # steps inside ONE jitted call (with on-device batch sampling) so
    # dispatch latency amortizes K-fold and no batch data crosses the wire.
    K = args.scan_steps
    inner = make_train_step(model, tc, opt)
    data_key = jax.random.PRNGKey(args.seed + 4242)
    ema_d = jnp.float32(args.ema)

    @jax.jit
    def multi_step(state, ema, pool, call_idx):
        def body(carry, j):
            st, em = carry
            batch = sample_batch(pool, jax.random.fold_in(data_key, call_idx * K + j))
            st, m = inner(st, batch)
            if args.ema > 0:
                em = jax.tree.map(
                    lambda e, p: e * ema_d + p.astype(e.dtype) * (1 - ema_d),
                    em, st.params,
                )
            return (st, em), (m["loss"], m["bpp"], m["mse"], m["aux"])
        (state, ema), ms = jax.lax.scan(body, (state, ema), jnp.arange(K))
        return state, ema, jax.tree.map(lambda a: a[-1], ms)

    ema_params = jax.tree.map(lambda p: p.astype(jnp.float32), state.params)
    # Self-delimiting log: runs append to the same train_log.txt across
    # driver resets/retrains, so each run stamps a header line (multi-block
    # logs without one confused result provenance — ADVICE round 3).
    log_name = f"train_log_{args.tag}.txt" if args.tag else "train_log.txt"
    eval_name = f"eval_{args.tag}.json" if args.tag else "eval.json"
    with open(os.path.join(args.out, log_name), "a") as fd:
        fd.write(
            "=== run %s :: %s\n"
            % (time.strftime("%Y-%m-%d %H:%M:%S"), " ".join(sys.argv[1:]))
        )
    t0 = time.time()
    # round UP: steps // K would silently train 0 steps for steps < K (and
    # drop the remainder otherwise) while still writing params/eval.json
    n_calls = -(-args.steps // K)
    log_every = max(n_calls // 40, 1)
    nan_streak = 0
    for i in range(n_calls):
        state, ema_params, (loss, bpp, mse, aux) = multi_step(
            state, ema_params, pool_dev, jnp.asarray(i)
        )
        if i % log_every == 0 or i == n_calls - 1:
            loss = float(loss)
            line = (
                f"step {(i+1)*K:6d}  loss {loss:9.4f}  bpp {float(bpp):7.4f}"
                f"  mse {float(mse):.6f}  aux {float(aux):9.2f}"
                f"  {time.time()-t0:7.1f}s"
            )
            print(line, flush=True)
            with open(os.path.join(args.out, log_name), "a") as fd:
                fd.write(line + "\n")
            # the train step skip-guards non-finite updates (params stay
            # clean); abort only when divergence is persistent
            nan_streak = nan_streak + 1 if not np.isfinite(loss) else 0
            if nan_streak >= 3:
                raise SystemExit("NaN loss (3 consecutive logged windows)")
    save_params(os.path.join(args.out, "params.npz"), state.params)
    if args.ema > 0:
        save_params(os.path.join(args.out, "params_ema.npz"), ema_params)

    # ------------- eval: held-out image + train-set images -------------
    from lic_tpu.data.pad import pad_to_multiple
    from lic_tpu.training.loss import ms_ssim

    _coder_cache = {}

    @jax.jit
    def fwd(params, xx, rate=None):
        out = model.apply({"params": params}, xx, training=False, rate=rate)
        return out.x_tilde, out.bpp

    def eval_image(path, tag, eval_params, rate=None):
        img = load_image_uint8(path).astype(np.float32) / 127.5 - 1.0
        x = jnp.asarray(img[None])
        xp, (h, w) = pad_to_multiple(x, 64)
        if rate is None:
            x_tilde, bpp_est = fwd(eval_params, xp)
        else:
            x_tilde, bpp_est = fwd(eval_params, xp, jnp.float32(rate))
        x_tilde = x_tilde[:, :h, :w, :]
        # 0..255-domain PSNR on rounded pixels (reference metric domain)
        rec = np.clip((np.asarray(x_tilde) + 1) * 127.5, 0, 255).round()
        ref = np.clip((np.asarray(x) + 1) * 127.5, 0, 255).round()
        mse255 = float(np.mean((rec - ref) ** 2))
        r = {
            "image": tag,
            "bpp_estimated": round(
                # padded-forward bpp is over padded pixels; renormalize
                float(bpp_est) * (xp.shape[1] * xp.shape[2]) / (h * w), 4
            ),
            "psnr_255": round(10 * np.log10(255.0 ** 2 / mse255), 3),
            "msssim": round(float(
                ms_ssim(jnp.asarray(rec / 255.0), jnp.asarray(ref / 255.0),
                        data_range=1.0)
            ), 5),
        }
        try:
            from lic_tpu.models.compress import ChannelCoder

            # one coder per (params, rate): rebuilding per image redoes the
            # host CDF quantization + jit wrappers for identical state
            ck = (id(eval_params), rate)
            coder = _coder_cache.get(ck)
            if coder is None:
                coder = _coder_cache[ck] = ChannelCoder(
                    model, eval_params, name=args.preset, rate=rate
                )
            blob = coder.compress(x)
            r["bpp_real_bitstream"] = round(len(blob) * 8 / (h * w), 4)
            rec2 = np.asarray(coder.decompress(blob))
            rec2 = np.clip((rec2 + 1) * 127.5, 0, 255).round()
            r["psnr_decoded"] = round(
                10 * np.log10(
                    255.0 ** 2 / float(np.mean((rec2 - ref) ** 2))
                ), 3,
            )
        except Exception as e:  # record, don't lose the run's eval
            r["bitstream"] = f"not decodable: {type(e).__name__}: {e}"
        return r

    result = {
        "preset": args.preset, "lmbda": args.lmbda, "steps": args.steps,
        "held_out": eval_image(
            EVAL_IMAGE, "grace_hopper (held out)", state.params
        ),
        "train_set": [
            eval_image(p, os.path.basename(p), state.params)
            for p in EVAL_TRAIN_SUBSET
        ],
    }
    if args.ema > 0:
        result["held_out_ema"] = eval_image(
            EVAL_IMAGE, "grace_hopper (held out, EMA)", ema_params
        )
    if model.cfg.gain_units:
        # the variable-rate claim: every operating point from ONE ckpt
        result["held_out_rates"] = [
            eval_image(
                EVAL_IMAGE, f"grace_hopper (held out, rate={k})",
                state.params, rate=float(k),
            )
            for k in range(model.cfg.gain_units)
        ]
    print(json.dumps(result), flush=True)
    with open(os.path.join(args.out, eval_name), "w") as fd:
        json.dump(result, fd, indent=1)


if __name__ == "__main__":
    main()
