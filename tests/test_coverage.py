"""Coverage for the remaining config branches: high-rate capacity, MS-SSIM
training objective, separate hyper decoders, latent U-Net variants, CLI
parsers, warmup schedules, GDN1, UnetHaHs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.config import CodecConfig, TrainConfig
from lic_tpu.models import CodecModel


def _fwd(cfg, size=64, batch=1):
    m = CodecModel(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32))
    v = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )
    out = m.apply(v, x, training=True, rngs={"noise": jax.random.PRNGKey(2)})
    return m, v, x, out


class TestConfigBranches:
    def test_high_rate_n384(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic", is_high=True,
        )
        m, v, x, out = _fwd(cfg, 64)
        assert out.x_tilde.shape == x.shape
        # N=384 latent
        assert v["params"]["g_a"]["down3"]["kernel"].shape[-1] == 384

    def test_separate_hyper_decoders(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="unet",
            shared_hyper_decoder=False, swatten=False, syntax="basic",
        )
        m, v, x, out = _fwd(cfg, 128)
        assert "h_s_scale" in v["params"] and "h_s_means" in v["params"]
        assert np.isfinite(float(out.bpp))

    def test_latent_unet_conv1x1_variant(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="latent_unet",
            unet_variant="conv1x1", swatten=False, syntax="basic",
            count_hyper_bpp=False,
        )
        m, v, x, out = _fwd(cfg, 64)
        assert np.isfinite(float(out.bpp))

    def test_latent_unet_separate_decoders(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="latent_unet",
            shared_hyper_decoder=False, swatten=False, syntax="basic",
            count_hyper_bpp=False,
        )
        m, v, x, out = _fwd(cfg, 64)
        assert "unet_b" in v["params"]

    def test_syntax_none(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="none",
        )
        m, v, x, out = _fwd(cfg, 64)
        assert "syntax_model" not in v["params"]
        assert out.x_tilde.shape == x.shape


class TestMsssimTraining:
    def test_msssim_loss_type_step(self):
        from lic_tpu.training.train import create_state, make_optimizer, make_train_step

        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic",
        )
        model = CodecModel(cfg)
        tc = TrainConfig(loss_type="msssim", lmbda=10.0, batch_size=1,
                         crop_size=192)
        opt = make_optimizer(tc, steps_per_epoch=10)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 192, 192, 3)).astype(np.float32))
        state = create_state(model, opt, x, seed=0)
        step = jax.jit(make_train_step(model, tc, opt))
        state, metrics = step(state, x)
        assert np.isfinite(float(metrics["loss"]))


class TestCLI:
    def test_train_parser_defaults(self):
        from lic_tpu.cli.train import build_parser

        a = build_parser().parse_args(["--train_data_path", "/tmp/x"])
        assert a.lmbda == 0.0025 and a.batch_size == 8 and a.epochs == 5000

    def test_eval_parser_defaults(self):
        from lic_tpu.cli.eval import build_parser

        a = build_parser().parse_args(
            ["--data_path", "/d", "--weight_path", "/w"]
        )
        assert a.lmbda == 0.0067 and a.tune_iter == 100

    def test_codec_parser(self):
        from lic_tpu.cli.codec import build_parser

        a = build_parser().parse_args(
            ["compress", "a.png", "b.ltc", "--weight_path", "/w"]
        )
        assert a.command == "compress"


class TestSchedules:
    def test_warmup_cosine_and_stagedecay(self):
        from lic_tpu.training.schedule import (
            warmup_cosine,
            warmup_linear,
            warmup_stagedecay,
        )

        s = warmup_cosine(1e-3, total_steps=100, warmup_steps=10)
        assert float(s(0)) < float(s(10))
        assert float(s(100)) < float(s(10))
        s2 = warmup_stagedecay(1e-3, (50,), 0.1, warmup_steps=10)
        assert float(s2(20)) == pytest.approx(1e-3)
        assert float(s2(60)) == pytest.approx(1e-4)
        s3 = warmup_linear(1e-3, total_steps=100, warmup_steps=10)
        assert float(s3(50)) == pytest.approx(5e-4, rel=0.1)


class TestMoreLayers:
    def test_gdn1(self):
        from lic_tpu.layers import GDN1

        m = GDN1(8)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 4, 4, 8)).astype(
                np.float32
            )
        )
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

    def test_unet_ha_hs_fused(self):
        from lic_tpu.layers.misc import UnetHaHs

        m = UnetHaHs(in_channels=192, out_channels=320)
        x = jnp.zeros((1, 16, 16, 192))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 16, 16, 320)

    def test_plain_wam_transforms(self):
        from lic_tpu.models.transforms import AnalysisTransform, SynthesisTransform

        g_a = AnalysisTransform(N=64, variant="plain_wam")
        x = jnp.zeros((1, 128, 128, 3))
        y, _ = g_a.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 8, 8, 64)
        g_s = SynthesisTransform(N=64, out_channels=16, variant="plain_wam")
        z, _ = g_s.init_with_output(jax.random.PRNGKey(0), y)
        assert z.shape == (1, 128, 128, 16)


class TestDataPipeline:
    def test_tiny_image_crop(self, tmp_path):
        """Images far smaller than the crop are tiled by symmetric padding
        (reflect-pad raises for pads >= dim)."""
        from PIL import Image

        from lic_tpu.data.datasets import ImageFolderDataset

        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / "tiny.png")
        ds = ImageFolderDataset(str(tmp_path), crop_size=256)
        crop = ds.sample_crop(0, rng)
        assert crop.shape == (256, 256, 3)
        assert crop.dtype == np.uint8

    def test_prefetch_survives_corrupt_file(self, tmp_path):
        """A truncated image must not kill the worker threads (a dead pool
        would hang q.get() forever on a long run) — bad samples are
        resampled and good batches keep flowing."""
        from PIL import Image

        from lic_tpu.data.datasets import ImageFolderDataset, train_iterator

        rng = np.random.default_rng(6)
        good = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(good).save(tmp_path / "good.png")
        (tmp_path / "corrupt.png").write_bytes(b"\x89PNG\r\n\x1a\nbroken")
        ds = ImageFolderDataset(str(tmp_path), crop_size=32)
        it = train_iterator(ds, batch_size=2, num_threads=2, prefetch=2)
        for _ in range(6):  # enough draws to hit the corrupt file w.h.p.
            batch = next(it)
            assert batch.shape == (2, 32, 32, 3)
            assert np.isfinite(np.asarray(batch)).all()
