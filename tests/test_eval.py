"""Eval-harness tests: padding, metric accounting, content-adaptive tuning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.config import CodecConfig, EvalConfig
from lic_tpu.data.pad import pad_to_multiple, padded_size, unpad
from lic_tpu.evaluation import content_adaptive_finetune, evaluate_image
from lic_tpu.evaluation.metrics import mse_255, psnr_255
from lic_tpu.models import CodecModel

TINY = CodecConfig(
    family="charm", transform="plain", hyper="classic_dual",
    swatten=False, syntax="basic",
)


def _model_and_params(size=64):
    m = CodecModel(TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
    v = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )
    return m, v["params"]


class TestPad:
    def test_padded_size(self):
        assert padded_size(768, 512) == (768, 512)
        assert padded_size(500, 333) == (512, 384)

    def test_pad_unpad_roundtrip(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 50, 70, 3)).astype(np.float32))
        for mode in ("replicate", "ones", "zeros"):
            p, orig = pad_to_multiple(x, 64, mode=mode)
            assert p.shape == (1, 64, 128, 3)
            np.testing.assert_array_equal(np.asarray(unpad(p, orig)), np.asarray(x))

    def test_replicate_edges(self):
        x = jnp.ones((1, 2, 2, 1)) * 5.0
        p, _ = pad_to_multiple(x, 4, mode="replicate")
        np.testing.assert_array_equal(np.asarray(p), 5.0)


class TestMetrics:
    def test_psnr_identity(self):
        x = jnp.zeros((1, 8, 8, 3))
        v = mse_255(x, x)  # per-image (B,)
        assert v.shape == (1,) and float(v[0]) == 0.0

    def test_known_psnr(self):
        # constant offset of 2/255 in [-1,1] domain = 1 unit in 0..255
        # (base 0.1 keeps values off the .5 round-half-to-even boundary)
        x = jnp.full((1, 16, 16, 3), 0.1)
        y = x + 2.0 / 255.0
        v = mse_255(x, y)
        np.testing.assert_allclose(float(v[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            float(psnr_255(v)), 20 * np.log10(255.0), rtol=1e-6
        )


class TestEvaluateImage:
    def test_non_multiple_size_image(self):
        m, params = _model_and_params()
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 50, 70, 3)).astype(np.float32))
        r = evaluate_image(m, params, x, EvalConfig(pad_multiple=64))
        assert np.isfinite(r["bpp"]) and r["bpp"] > 0
        assert np.isfinite(r["psnr"])
        assert r["pixels"] == 50 * 70

    def test_bpp_normalized_to_true_pixels(self):
        """Padding must not deflate bpp (fixes defect §8.9)."""
        m, params = _model_and_params()
        rng = np.random.default_rng(3)
        base = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
        r_full = evaluate_image(m, params, jnp.asarray(base))
        r_crop = evaluate_image(m, params, jnp.asarray(base[:, :33, :33]))
        # cropped image is padded back to 64x64; per-true-pixel bpp must be
        # larger than the full image's, not smaller
        assert r_crop["bpp"] > r_full["bpp"] * 0.5


class TestTuneBypassesHan:
    """The reference disables post-processing for the tune loop
    (``eval_net.py:171``); the tune loss must not see HAN."""

    def test_bypass_changes_output_and_zeroes_han_grads(self):
        cfg = TINY.replace(post_processing=True)
        m = CodecModel(cfg)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        params = m.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )["params"]

        out_pp = m.apply({"params": params}, x, training=False)
        out_raw = m.apply(
            {"params": params}, x, training=False, use_post_processing=False
        )
        assert not np.allclose(
            np.asarray(out_pp.x_tilde), np.asarray(out_raw.x_tilde)
        )

        def tune_loss(p):
            out = m.apply(
                {"params": p}, x, training=True, use_post_processing=False,
                rngs={"noise": jax.random.PRNGKey(2)},
            )
            return 0.0067 * out.mse + out.bpp

        g = jax.grad(tune_loss)(params)
        for leaf in (
            jax.tree.leaves(g["han"]) + jax.tree.leaves(g["conv_weights_gen_han"])
        ):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        ga_nonzero = any(
            np.any(np.asarray(leaf) != 0) for leaf in jax.tree.leaves(g["g_a"])
        )
        assert ga_nonzero


class TestTuneLossScaling:
    """The tune loss defaults to the train-consistent ``λ·255²·mse + bpp``.

    The reference's literal ``λ·mse + bpp`` (``eval_net.py:176``, SURVEY
    defect §8.13) under-weights distortion ~65,000× and measurably destroys
    quality (−8.8 dB held-out, round 3); it stays available only behind
    ``EvalConfig(tune_loss_255sq=False)``."""

    def _loss_from_step(self, m, params, x, loss_255sq):
        from lic_tpu.evaluation.eval import _tune_step_cached

        cfg = EvalConfig()
        opt, step = _tune_step_cached(
            m, x.shape, cfg.lmbda, cfg.tune_lr, cfg.tune_lr_drop_step,
            cfg.tune_lr_gamma, None, loss_255sq,
        )
        _, _, _, loss = step(params, opt.init(params), jax.random.PRNGKey(0), x)
        return float(loss)

    def _expected(self, m, params, x, scale):
        _, sub = jax.random.split(jax.random.PRNGKey(0))
        out = m.apply(
            {"params": params}, x, training=True, use_post_processing=False,
            rngs={"noise": sub},
        )
        return float(EvalConfig().lmbda * scale * out.mse + out.bpp)

    def test_default_is_train_consistent_255sq(self):
        assert EvalConfig().tune_loss_255sq is True
        m, params = _model_and_params()
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        got = self._loss_from_step(m, params, x, True)
        np.testing.assert_allclose(
            got, self._expected(m, params, x, 255.0 ** 2), rtol=1e-5
        )

    def test_literal_reference_loss_behind_flag(self):
        m, params = _model_and_params()
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        got = self._loss_from_step(m, params, x, False)
        np.testing.assert_allclose(
            got, self._expected(m, params, x, 1.0), rtol=1e-5
        )


class TestContentAdaptiveFinetune:
    def test_only_ga_moves_and_loss_improves(self):
        m, params = _model_and_params()
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        cfg = EvalConfig(tune_iters=5, tune_lr=1e-4)
        tuned = content_adaptive_finetune(m, params, x, cfg)

        ga_moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(params["g_a"]), jax.tree.leaves(tuned["g_a"])
            )
        )
        assert ga_moved
        for key in params:
            if key == "g_a":
                continue
            for a, b in zip(
                jax.tree.leaves(params[key]), jax.tree.leaves(tuned[key])
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
