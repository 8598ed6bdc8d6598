"""pjit data-parallel training loop.

Reference semantics reproduced (``train_net_unet.py:90-238``): R-D objective
``λ·255²·mse + bpp``, Adam (AdamW for the post-processing-only phase) with
MultiStepLR halvings, global-norm grad clip 1.0, NaN-in-loss guard, periodic
checkpointing, ``train_log.txt`` per-epoch lines.  Two-phase parameter
groups (base vs post-processing) are implemented with ``optax.masked``
instead of the reference's parameter-list surgery
(``train_net_unet.py:125-134``; param getters ``model/net.py:502-525``).

TPU design: one jitted ``train_step`` with the batch sharded over the
``data`` mesh axis and parameters replicated — XLA inserts the gradient
all-reduce (``psum`` over ICI); no DataParallel-style replicate/scatter/
gather per step.  The factorized-prior aux (quantile) loss is added to the
objective — its gradient touches only the ``quantiles`` parameter (the
density MLP is stop-gradient'd), and those leaves are routed to a dedicated
unclipped Adam at ``TrainConfig.aux_lr`` (see ``aux_labels``), reproducing
CompressAI's separate aux optimizer in a single update.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import CodecConfig, TrainConfig
from ..models import CodecModel
from ..parallel import batch_sharding, make_mesh, replicated
from . import schedule as schedules
from .loss import ms_ssim, rate_distortion_loss

POST_PROCESSING_KEYS = ("han", "conv_weights_gen_han")


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def partition_labels(params, post_processing: bool):
    """'train' / 'freeze' label pytree for ``optax.multi_transform``.

    post_processing=False trains everything except the HAN tail (the
    reference's ``base_params``); True trains only the HAN tail
    (``post_processing_params``).  NOTE: ``optax.masked`` is NOT usable for
    freezing — it passes the raw gradients through for masked-out leaves.
    """

    def is_pp(path):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        return any(str(n) in POST_PROCESSING_KEYS for n in names)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: "train" if (is_pp(path) == post_processing) else "freeze",
        params,
    )


def freeze_partition(
    optimizer: optax.GradientTransformation, params, post_processing: bool
) -> optax.GradientTransformation:
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()},
        partition_labels(params, post_processing),
    )


def aux_labels(params):
    """'aux' for EntropyBottleneck ``quantiles`` leaves, 'main' otherwise.

    The quantile parameters are trained only by the aux (tail-mass) loss;
    CompressAI — whose semantics the reference inherits via its
    ``EntropyBottleneck`` import (``model/Net_unet.py:3``) — drives them
    with a *separate* Adam at lr 1e-3, unclipped and unscheduled.
    """

    def is_aux(path):
        return any(
            str(getattr(k, "key", getattr(k, "name", ""))) == "quantiles"
            for k in path
        )

    return jax.tree_util.tree_map_with_path(
        lambda path, _: "aux" if is_aux(path) else "main", params
    )


def make_optimizer(
    train_cfg: TrainConfig,
    steps_per_epoch: int,
    post_processing_phase: bool = False,
) -> optax.GradientTransformation:
    if post_processing_phase:
        sched = schedules.multistep(
            train_cfg.lr, train_cfg.pp_milestones, steps_per_epoch,
            train_cfg.lr_gamma,
        )
        inner = optax.adamw(sched)
    else:
        sched = schedules.multistep(
            train_cfg.lr, train_cfg.lr_milestones, steps_per_epoch,
            train_cfg.lr_gamma,
        )
        inner = (
            optax.adamw(sched, weight_decay=train_cfg.weight_decay)
            if train_cfg.weight_decay > 0
            else optax.adam(sched)
        )
    main = optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip_norm),
        inner,
    )
    # Quantiles ride a dedicated Adam at aux_lr (CompressAI aux-optimizer
    # semantics); their gradient comes solely from ``entropy_aux_loss`` so
    # this is exactly the reference's two-optimizer update in one pass.
    return optax.multi_transform(
        {"main": main, "aux": optax.adam(train_cfg.aux_lr)}, aux_labels
    )


def make_train_step(
    model: CodecModel,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    post_processing_phase: bool = False,
) -> Callable:
    """Returns jit-able ``train_step(state, batch) -> (state, metrics)``.

    Gain-unit models with ``train_cfg.lmbda_list`` train multi-rate: each
    step samples a unit k uniformly and optimizes λ_k·255²·D + R at
    rate=k — one checkpoint, K operating points."""
    multi_rate = bool(train_cfg.lmbda_list)
    if multi_rate and model.cfg.gain_units == 0:
        raise ValueError(
            "lmbda_list was given but the model has no gain units — the "
            "run would silently train single-rate at lmbda_list unused"
        )
    if multi_rate and len(train_cfg.lmbda_list) != model.cfg.gain_units:
        raise ValueError(
            f"lmbda_list has {len(train_cfg.lmbda_list)} entries for "
            f"{model.cfg.gain_units} gain units"
        )

    def loss_fn(params, batch, key, rate, lmbda):
        out = model.apply(
            {"params": params}, batch, training=True, rngs={"noise": key},
            rate=rate,
            # phase 2 trains the HAN tail only: cut the gradient at the
            # HAN input (= torch's autograd pruning with the base frozen,
            # train_net_unet.py:125-134) so no encoder/entropy backward is
            # ever built — the rate term is a constant of the frozen base
            stop_base_grad=post_processing_phase,
        )
        msssim_val = None
        if train_cfg.loss_type != "mse":
            msssim_val = ms_ssim(out.x_tilde, batch, data_range=2.0)
        bpp = (
            jax.lax.stop_gradient(out.bpp)
            if post_processing_phase
            else out.bpp
        )
        loss = rate_distortion_loss(
            bpp, out.mse, lmbda, train_cfg.loss_type, msssim_val
        )
        aux = model.apply({"params": params}, method=CodecModel.entropy_aux_loss)
        if post_processing_phase:
            aux = jax.lax.stop_gradient(aux)
        total = loss + aux
        return total, {
            "loss": loss,
            "bpp": out.bpp,
            "mse": out.mse,
            "aux": aux,
        }

    def train_step(state: TrainState, batch: jax.Array):
        rng, key, key_rate = jax.random.split(state.rng, 3)
        if multi_rate:
            k = jax.random.randint(
                key_rate, (), 0, model.cfg.gain_units
            )
            rate = k.astype(jnp.float32)
            lmbda = jnp.take(jnp.asarray(train_cfg.lmbda_list), k)
        else:
            rate, lmbda = None, train_cfg.lmbda
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, key, rate, lmbda
        )
        # Skip-step guard: a single non-finite batch (bf16 training at
        # the early-step stability edge — two fresh runs with identical
        # seeds diverged NaN-vs-fine within 500 steps, chain7.log
        # 2026-08-19) must not poison params/optimizer state.  Apply
        # the update only when every gradient is finite; a skipped step
        # keeps params+opt_state but still advances rng/step so the
        # data order is unchanged.  Strictly more robust than the
        # reference's abort-on-first-NaN (train_net_unet.py:189-190);
        # persistent divergence still aborts in the epoch loop below.
        finite = jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)),
            grads, jnp.bool_(True),
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        params, opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            (params, opt_state), (state.params, state.opt_state),
        )
        metrics["skipped"] = (~finite).astype(jnp.float32)
        return (
            state.replace(
                step=state.step + 1, params=params, opt_state=opt_state, rng=rng
            ),
            metrics,
        )

    return train_step


def create_state(
    model: CodecModel,
    optimizer: optax.GradientTransformation,
    sample_batch: jax.Array,
    seed: int = 0,
    params: Any = None,
) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    if params is None:
        variables = model.init(
            {"params": rng, "noise": jax.random.PRNGKey(seed + 1)},
            sample_batch,
            training=True,
        )
        params = variables["params"]
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=jax.random.PRNGKey(seed + 2),
    )


def train(
    model: CodecModel,
    data_iterator: Iterator,
    train_cfg: TrainConfig,
    steps_per_epoch: int,
    checkpoint_dir: Optional[str] = None,
    post_processing_phase: bool = False,
    init_params: Any = None,
    mesh=None,
    epochs: Optional[int] = None,
    log_fn: Callable[[str], None] = print,
) -> TrainState:
    """Epoch-structured training mirroring the reference driver."""
    from ..utils.checkpoint import CheckpointManager

    if mesh is None:
        mesh = make_mesh()
    optimizer = make_optimizer(train_cfg, steps_per_epoch, post_processing_phase)

    sample = next(data_iterator)
    if init_params is None:
        variables = model.init(
            {
                "params": jax.random.PRNGKey(train_cfg.seed),
                "noise": jax.random.PRNGKey(train_cfg.seed + 1),
            },
            sample,
            training=True,
        )
        init_params = variables["params"]
    if model.cfg.post_processing:
        # two-phase training: freeze the group not being trained
        optimizer = freeze_partition(
            optimizer, init_params, post_processing_phase
        )
    state = create_state(
        model, optimizer, sample, seed=train_cfg.seed, params=init_params
    )
    state = jax.device_put(state, replicated(mesh))

    step_fn = jax.jit(
        make_train_step(model, train_cfg, optimizer, post_processing_phase),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )

    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    n_epochs = epochs or (
        train_cfg.pp_epochs if post_processing_phase else train_cfg.epochs
    )

    start = time.time()
    nan_streak = 0
    for epoch in range(n_epochs):
        acc = {"loss": 0.0, "bpp": 0.0, "mse": 0.0}
        for _ in range(steps_per_epoch):
            batch = next(data_iterator)
            state, metrics = step_fn(state, batch)
            loss = float(metrics["loss"])
            if np.isnan(loss):
                # the step itself was skip-guarded (params untouched);
                # abort only on PERSISTENT divergence.  Reference guard
                # (train_net_unet.py:189-190) aborts on the first one.
                nan_streak += 1
                if nan_streak >= 10:
                    raise Exception("NaN in loss (10 consecutive steps)")
                continue
            nan_streak = 0
            acc["loss"] += loss
            acc["bpp"] += float(metrics["bpp"])
            acc["mse"] += float(metrics["mse"])
        line = "[Epoch %04d TRAIN] Loss: %.4f bpp: %.4f mse: %.4f" % (
            epoch,
            acc["loss"] / steps_per_epoch,
            acc["bpp"] / steps_per_epoch,
            acc["mse"] / steps_per_epoch,
        )
        log_fn(line)
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            with open(os.path.join(checkpoint_dir, "train_log.txt"), "a") as fd:
                fd.write(line + "\n")
        if ckpt and (epoch % train_cfg.ckpt_every_epochs == train_cfg.ckpt_every_epochs - 1):
            ckpt.save(state, epoch)
    if ckpt:
        # Orbax StandardCheckpointer commits asynchronously — without this
        # a caller (or the NaN-guard unwind) can observe the newest
        # checkpoint as an uncommitted tmp dir
        ckpt.wait()
    return state
