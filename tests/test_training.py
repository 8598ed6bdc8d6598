"""Training-loop tests: R-D loss semantics, MS-SSIM, LR schedules, the jitted
train step (single device and 8-device data-parallel mesh), checkpointing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lic_tpu.config import CodecConfig, TrainConfig
from lic_tpu.models import CodecModel
from lic_tpu.parallel import batch_sharding, make_mesh, replicated
from lic_tpu.training import (
    TrainState,
    make_train_step,
    ms_ssim,
    rate_distortion_loss,
    ssim,
)
from lic_tpu.training.schedule import multistep
from lic_tpu.training.train import create_state, freeze_partition, make_optimizer

TINY = CodecConfig(
    family="charm", transform="plain", hyper="classic_dual",
    swatten=False, syntax="basic",
)


def _tiny_setup(batch=2, size=64, post_processing=False):
    cfg = TINY.replace(post_processing=post_processing)
    model = CodecModel(cfg)
    tc = TrainConfig(batch_size=batch, crop_size=size, lmbda=0.01)
    opt = make_optimizer(tc, steps_per_epoch=10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32))
    state = create_state(model, opt, x, seed=0)
    return model, tc, opt, x, state


class TestLoss:
    def test_rd_loss_mse_form(self):
        loss = rate_distortion_loss(
            jnp.asarray(0.5), jnp.asarray(0.001), lmbda=0.0025
        )
        np.testing.assert_allclose(
            float(loss), 0.0025 * 255 ** 2 * 0.001 + 0.5, rtol=1e-6
        )

    def test_ssim_identity(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        assert float(ssim(x, x)) > 0.9999

    def test_msssim_degrades_with_noise(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
        small = x + 0.01 * jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32)
        )
        big = x + 0.2 * jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32)
        )
        v0 = float(ms_ssim(x, x))
        v1 = float(ms_ssim(x, small))
        v2 = float(ms_ssim(x, big))
        assert v0 > 0.999 and v0 > v1 > v2

    def test_msssim_matches_torch_reference(self):
        """Cross-check against a minimal torch MS-SSIM (same windows)."""
        pytest.importorskip("torch")
        import torch
        import torch.nn.functional as F

        def t_blur(x, k):
            c = x.shape[1]
            kh = k.view(1, 1, -1, 1).repeat(c, 1, 1, 1)
            kw = k.view(1, 1, 1, -1).repeat(c, 1, 1, 1)
            x = F.conv2d(x, kh, groups=c)
            return F.conv2d(x, kw, groups=c)

        def t_ssim(a, b, dr=1.0):
            c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
            g = torch.arange(11, dtype=torch.float64) - 5
            k = torch.exp(-g ** 2 / (2 * 1.5 ** 2))
            k = (k / k.sum()).float()
            mua, mub = t_blur(a, k), t_blur(b, k)
            saa = t_blur(a * a, k) - mua ** 2
            sbb = t_blur(b * b, k) - mub ** 2
            sab = t_blur(a * b, k) - mua * mub
            cs = (2 * sab + c2) / (saa + sbb + c2)
            s = ((2 * mua * mub + c1) / (mua ** 2 + mub ** 2 + c1)) * cs
            return s.mean().item(), cs.mean().item()

        rng = np.random.default_rng(3)
        a = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
        b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1).astype(
            np.float32
        )
        s_j, cs_j = ssim(jnp.asarray(a), jnp.asarray(b), return_cs=True)
        at = torch.tensor(a).permute(0, 3, 1, 2)
        bt = torch.tensor(b).permute(0, 3, 1, 2)
        s_t, cs_t = t_ssim(at, bt)
        np.testing.assert_allclose(float(s_j), s_t, atol=2e-5)
        np.testing.assert_allclose(float(cs_j), cs_t, atol=2e-5)


class TestSchedule:
    def test_multistep_halving(self):
        sched = multistep(1e-4, (10, 20), steps_per_epoch=5, gamma=0.5)
        assert float(sched(0)) == pytest.approx(1e-4)
        assert float(sched(49)) == pytest.approx(1e-4)
        assert float(sched(50)) == pytest.approx(5e-5)
        assert float(sched(100)) == pytest.approx(2.5e-5)


class TestOptimizer:
    def test_quantiles_use_aux_lr(self):
        """EntropyBottleneck quantiles ride a separate Adam at aux_lr
        (CompressAI aux-optimizer semantics); everything else uses the
        scheduled, clipped main Adam."""
        tc = TrainConfig(lr=1e-4, aux_lr=1e-3)
        opt = make_optimizer(tc, steps_per_epoch=10)
        params = {
            "entropy_bottleneck": {"quantiles": jnp.ones((4, 1, 3))},
            "g_a": {"kernel": jnp.ones((3, 3))},
        }
        grads = jax.tree.map(jnp.ones_like, params)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        # Adam's first step is ≈ lr for any constant gradient
        q_step = np.abs(
            np.asarray(updates["entropy_bottleneck"]["quantiles"])
        ).mean()
        g_step = np.abs(np.asarray(updates["g_a"]["kernel"])).mean()
        assert q_step == pytest.approx(1e-3, rel=1e-2)
        assert g_step == pytest.approx(1e-4, rel=1e-2)

    def test_weight_decay_shrinks_params(self):
        """weight_decay > 0 switches the base phase to AdamW: a zero
        gradient still shrinks a weight, while wd=0 leaves it untouched."""
        params = {"g_a": {"kernel": jnp.full((3, 3), 2.0)}}
        grads = jax.tree.map(jnp.zeros_like, params)
        for wd, moves in ((0.0, False), (0.01, True)):
            tc = TrainConfig(lr=1e-2, weight_decay=wd)
            opt = make_optimizer(tc, steps_per_epoch=10)
            state = opt.init(params)
            updates, _ = opt.update(grads, state, params)
            step = np.abs(np.asarray(updates["g_a"]["kernel"])).mean()
            assert (step > 0) == moves, (wd, step)

    def test_quantiles_converge_to_tails(self):
        """Driving only the aux loss moves quantiles toward the tail-mass
        targets (logits → ±log(2/tail−1), middle → median)."""
        from lic_tpu.entropy.factorized import EntropyBottleneck

        eb = EntropyBottleneck(channels=2)
        v = eb.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 4, 4, 2)), training=False,
        )
        tc = TrainConfig(lr=1e-4, aux_lr=1e-2)
        opt = make_optimizer(tc, steps_per_epoch=10)
        params = v["params"]
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            aux = lambda p: eb.apply({"params": p}, method=EntropyBottleneck.aux_loss)
            g = jax.grad(aux)(params)
            updates, state = opt.update(g, state, params)
            return optax.apply_updates(params, updates), state, aux(params)

        first = None
        for i in range(200):
            params, state, loss = step(params, state)
            if first is None:
                first = float(loss)
        # quantiles crawl at ~aux_lr/step toward far tail targets; assert a
        # steady decrease (full convergence needs thousands of steps)
        assert float(loss) < first - 0.5, (first, float(loss))


class TestTrainStep:
    def test_loss_decreases(self):
        model, tc, opt, x, state = _tiny_setup()
        step = jax.jit(make_train_step(model, tc, opt))
        losses = []
        for i in range(8):
            state, metrics = step(state, x)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_nonfinite_batch_skips_update(self):
        """A batch producing non-finite gradients must leave params AND
        optimizer state untouched (skip-step guard), flag skipped=1, and
        the next good batch must train normally."""
        model, tc, opt, x, state = _tiny_setup()
        step = jax.jit(make_train_step(model, tc, opt))
        state, m = step(state, x)  # one good step to warm opt state
        assert float(m["skipped"]) == 0.0
        p0, o0 = state.params, state.opt_state
        bad = x.at[0, 0, 0, 0].set(jnp.nan)
        state, m = step(state, bad)
        assert float(m["skipped"]) == 1.0
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(o0), jax.tree.leaves(state.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        state, m = step(state, x)
        assert float(m["skipped"]) == 0.0
        assert np.isfinite(float(m["loss"]))
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(p0), jax.tree.leaves(state.params)
            )
        )
        assert moved

    def test_post_processing_mask_freezes_base(self):
        model, tc, opt, x, state = _tiny_setup(post_processing=True)
        masked = freeze_partition(opt, state.params, post_processing=True)
        state = create_state(model, masked, x, seed=0)
        # post_processing_phase=True also severs the gradient at the HAN
        # input (stop_base_grad) — HAN must STILL receive gradient through
        # its stop-gradded inputs, base params must stay untouched
        step = jax.jit(
            make_train_step(model, tc, masked, post_processing_phase=True)
        )
        p0 = state.params
        state, _ = step(state, x)
        # base params untouched, HAN params moved
        ga0 = jax.tree.leaves(p0["g_a"])[0]
        ga1 = jax.tree.leaves(state.params["g_a"])[0]
        np.testing.assert_array_equal(np.asarray(ga0), np.asarray(ga1))
        han_moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(p0["han"]), jax.tree.leaves(state.params["han"])
            )
        )
        assert han_moved

    def test_phase2_base_gradient_is_structurally_zero(self):
        """stop_base_grad must make the phase-2 backward independent of the
        base network — grads wrt g_a are EXACTLY zero (not merely masked by
        the frozen optimizer), grads reach the HAN tail."""
        model, tc, opt, x, state = _tiny_setup(post_processing=True)

        def loss(params):
            out = model.apply(
                {"params": params}, x, training=True,
                rngs={"noise": jax.random.PRNGKey(0)},
                stop_base_grad=True,
            )
            return 0.01 * 255 ** 2 * out.mse

        grads = jax.grad(loss)(state.params)
        for leaf in jax.tree.leaves(grads["g_a"]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        han_leaves = jax.tree.leaves(grads["han"])
        assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in han_leaves)


class TestDataParallel:
    def test_train_step_on_8_device_mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model, tc, opt, _, _ = _tiny_setup(batch=8, size=64)
        mesh = make_mesh(8)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32))
        state = create_state(model, opt, x, seed=0)
        state = jax.device_put(state, replicated(mesh))
        xb = jax.device_put(x, batch_sharding(mesh))
        step = jax.jit(
            make_train_step(model, tc, opt),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=(replicated(mesh), replicated(mesh)),
        )
        state2, metrics = step(state, xb)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated after update
        leaf = jax.tree.leaves(state2.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_matches_single_device(self):
        """The mesh step computes the same loss as the unsharded step."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model, tc, opt, _, _ = _tiny_setup(batch=8, size=64)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32))
        state = create_state(model, opt, x, seed=0)
        step1 = jax.jit(make_train_step(model, tc, opt))
        _, m1 = step1(state, x)

        mesh = make_mesh(8)
        state_r = jax.device_put(state, replicated(mesh))
        xb = jax.device_put(x, batch_sharding(mesh))
        step8 = jax.jit(
            make_train_step(model, tc, opt),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=(replicated(mesh), replicated(mesh)),
        )
        _, m8 = step8(state_r, xb)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=1e-4
        )

    def test_dp_trajectory_matches_single_device(self):
        """Multi-step: the sharded optimizer trajectory tracks the
        unsharded one step-for-step and decreases (multichip training is
        an invariant, not a one-step smoke check)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model, tc, opt, _, _ = _tiny_setup(batch=8, size=64)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32))
        state = create_state(model, opt, x, seed=0)

        step1 = jax.jit(make_train_step(model, tc, opt))
        s1, ref = state, []
        for _ in range(5):
            s1, m = step1(s1, x)
            ref.append(float(m["loss"]))

        mesh = make_mesh(8)
        s8 = jax.device_put(state, replicated(mesh))
        xb = jax.device_put(x, batch_sharding(mesh))
        step8 = jax.jit(
            make_train_step(model, tc, opt),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=(replicated(mesh), replicated(mesh)),
        )
        got = []
        for _ in range(5):
            s8, m = step8(s8, xb)
            got.append(float(m["loss"]))
        np.testing.assert_allclose(got, ref, rtol=2e-4)
        assert got[-1] < got[0]


class TestCheckpoint:
    def test_params_npz_roundtrip(self, tmp_path):
        from lic_tpu.utils.checkpoint import load_params, save_params

        model, tc, opt, x, state = _tiny_setup()
        path = os.path.join(tmp_path, "params.npz")
        save_params(path, state.params)
        restored = load_params(path, state.params)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_strict_load_rejects_shape_mismatch(self, tmp_path):
        from lic_tpu.utils.checkpoint import load_params, save_params

        model, tc, opt, x, state = _tiny_setup()
        path = os.path.join(tmp_path, "params.npz")
        save_params(path, state.params)
        bad = jax.tree.map(lambda a: np.zeros((1, 1)), state.params)
        with pytest.raises((ValueError, KeyError)):
            load_params(path, bad)
