"""Evaluation harness mirroring ``eval_net.py`` semantics with its defects
fixed (SURVEY §8.3/8.9): the whole set is evaluated (not ``images[22:23]``),
padding is replicate (not ones) and bpp/PSNR are normalized over the
*unpadded* pixel count.

Includes the reference's headline feature: **content-adaptive encoding** —
per-image online finetuning of the analysis transform only
(``eval_net.py:118-199``), implemented as a jitted Adam loop over the
``g_a`` parameter subtree; the decoder and entropy parameters stay fixed so
the bitstream remains decodable.
"""

from __future__ import annotations

import functools
import time
from functools import partial
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import EvalConfig
from ..data.datasets import list_images, load_image_uint8
from ..data.pad import pad_to_multiple, unpad
from ..models import CodecModel
from ..training.loss import ms_ssim
from .metrics import mse_255, psnr_255


def _load_pm1(path: str) -> np.ndarray:
    from ..data.datasets import normalize_pm1

    return normalize_pm1(load_image_uint8(path))[None]  # (1, H, W, 3)


@partial(jax.jit, static_argnums=(0,))
def _eval_forward(model: CodecModel, params, x):
    out = model.apply({"params": params}, x, training=False)
    return out


@partial(jax.jit, static_argnums=(0,))
def _eval_forward_rate(model: CodecModel, params, x, rate):
    out = model.apply({"params": params}, x, training=False, rate=rate)
    return out


def evaluate_image(
    model: CodecModel,
    params: Any,
    x_pm1: jax.Array,
    eval_cfg: EvalConfig = EvalConfig(),
) -> Dict[str, float]:
    """Evaluate one (1, H, W, 3) [−1,1] image: pad → forward → metrics over
    the unpadded region, bpp renormalized to true pixels."""
    _, h, w, _ = x_pm1.shape
    padded, orig = pad_to_multiple(x_pm1, eval_cfg.pad_multiple, mode="replicate")
    t0 = time.time()
    if eval_cfg.rate is None:
        out = _eval_forward(model, params, padded)
    else:  # variable-rate checkpoint at a chosen operating point
        out = _eval_forward_rate(
            model, params, padded, jnp.float32(eval_cfg.rate)
        )
    x_tilde = jax.block_until_ready(out.x_tilde)
    dt = time.time() - t0

    ph, pw = padded.shape[1], padded.shape[2]
    # model bpp was normalized by padded pixels; renormalize to true pixels
    scale = (ph * pw) / (h * w)
    bpp = float(out.bpp) * scale

    x_rec = unpad(x_tilde, orig)
    x_rec = jnp.clip(x_rec, -1.0, 1.0)
    v_mse = mse_255(x_pm1, x_rec)
    v_psnr = float(psnr_255(v_mse))
    v_msssim = float(ms_ssim(
        (x_pm1 + 1) / 2, (x_rec + 1) / 2, data_range=1.0
    ))
    return {
        "bpp": bpp,
        "psnr": v_psnr,
        "mse": float(jnp.mean(v_mse)),
        "msssim": v_msssim,
        "seconds": dt,
        "pixels": h * w,
    }


def content_adaptive_finetune(
    model: CodecModel,
    params: Any,
    x_pm1: jax.Array,
    eval_cfg: EvalConfig = EvalConfig(),
) -> Any:
    """Per-image encoder overfit: ``tune_iters`` Adam steps on the
    train-consistent ``λ·255²·mse + bpp`` updating ONLY the analysis
    transform (g_a), lr 1e-5 halved at step 50 — the reference's
    pre-processing branch (``eval_net.py:118-199``).  The reference's
    literal loss drops the 255² factor (``eval_net.py:176``) — SURVEY
    defect §8.13, measured to cost −8.8 dB — and is available behind
    ``EvalConfig.tune_loss_255sq=False``.  Post-processing is bypassed
    during tuning
    (``net.post_processing = False``, ``eval_net.py:171``): the tune loss
    passes ``use_post_processing=False`` so g_a trains against the
    pre-HAN reconstruction even on a ``post_processing=True`` model."""
    padded, _ = pad_to_multiple(x_pm1, eval_cfg.pad_multiple, mode="replicate")

    opt, step = _tune_step_cached(
        model,
        padded.shape,
        eval_cfg.lmbda,
        eval_cfg.tune_lr,
        eval_cfg.tune_lr_drop_step,
        eval_cfg.tune_lr_gamma,
        eval_cfg.rate,
        eval_cfg.tune_loss_255sq,
    )
    opt_state = opt.init(params)

    key = jax.random.PRNGKey(0)
    p = params
    for _ in range(eval_cfg.tune_iters):
        p, opt_state, key, _ = step(p, opt_state, key, padded)
    return p


@functools.lru_cache(maxsize=16)
def _tune_step_cached(
    model, shape, lmbda, tune_lr, drop_step, gamma, rate, loss_255sq=True
):
    """Build (optimizer, jitted tune step) once per (model, padded shape,
    tune hyper-params): jax.jit caches by function identity, so defining
    the step inside content_adaptive_finetune recompiled the full fwd+bwd
    graph for EVERY image of a folder sweep even at identical shapes."""
    sched = optax.piecewise_constant_schedule(tune_lr, {drop_step: gamma})

    # freeze everything but g_a (optax.masked would leak raw gradients into
    # the frozen leaves — multi_transform + set_to_zero is the correct
    # form).  Labels via a callable: computed from the params tree at
    # opt.init time, so no concrete params needed here.
    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "tune"
            if any(str(getattr(k, "key", k)) == "g_a" for k in path)
            else "freeze",
            params,
        )

    opt = optax.multi_transform(
        {"tune": optax.adam(sched), "freeze": optax.set_to_zero()}, labels
    )

    # train-consistent distortion weight by default; the literal reference
    # λ·mse (eval_net.py:176, defect §8.13) only behind loss_255sq=False
    d_scale = 255.0 ** 2 if loss_255sq else 1.0

    def loss_fn(p, key, x):
        out = model.apply(
            {"params": p}, x, training=True,
            use_post_processing=False, rngs={"noise": key},
            rate=None if rate is None else jnp.float32(rate),
        )
        return lmbda * d_scale * out.mse + out.bpp

    @jax.jit
    def step(p, opt_state, key, x):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub, x)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, key, loss

    return opt, step


def evaluate_folder(
    model: CodecModel,
    params: Any,
    data_path: str,
    eval_cfg: EvalConfig = EvalConfig(),
    pre_processing: bool = False,
    log_fn=print,
) -> Dict[str, float]:
    """Full-set evaluation (bpp / PSNR / MS-SSIM / wall-clock averages)."""
    files = list_images(data_path)
    results: List[Dict[str, float]] = []
    for f in files:
        x = jnp.asarray(_load_pm1(f))
        p = params
        if pre_processing:
            p = content_adaptive_finetune(model, params, x, eval_cfg)
        r = evaluate_image(model, p, x, eval_cfg)
        results.append(r)
        log_fn(
            f"{f}: bpp={r['bpp']:.4f} psnr={r['psnr']:.2f} "
            f"msssim={r['msssim']:.4f} t={r['seconds']:.3f}s"
        )
    agg = {
        k: float(np.mean([r[k] for r in results]))
        for k in ("bpp", "psnr", "mse", "msssim", "seconds")
    }
    agg["images"] = len(results)
    log_fn(
        "AVG: bpp=%.4f psnr=%.2f msssim=%.4f t=%.3fs over %d images"
        % (agg["bpp"], agg["psnr"], agg["msssim"], agg["seconds"], agg["images"])
    )
    return agg
