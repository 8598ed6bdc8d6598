"""Codec-core tests at CPU-friendly sizes.

The full presets (rich transforms + U-Net hyper at 256px) are exercised on
real hardware via ``__graft_entry__``/``bench.py``; here we cover every
code path of the shared core with small shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.config import CodecConfig
from lic_tpu.models import CodecModel, PRESETS, build_model, get_config


def _run(cfg: CodecConfig, size: int, batch: int = 1):
    m = CodecModel(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )
    out_t = m.apply(
        variables, x, training=True, rngs={"noise": jax.random.PRNGKey(2)}
    )
    out_e = m.apply(variables, x, training=False)
    return m, variables, x, out_t, out_e


class TestNeuralSyntaxFamily:
    def test_forward_shapes_and_bpp(self):
        cfg = get_config("neural_syntax")
        m, v, x, out_t, out_e = _run(cfg, 64)
        assert out_t.x_tilde.shape == x.shape
        for o in (out_t, out_e):
            assert np.isfinite(float(o.bpp)) and float(o.bpp) > 0
            assert np.isfinite(float(o.mse))
        # three coded streams
        assert float(out_t.bpp_z) > 0
        assert float(out_t.bpp_y) > 0
        assert float(out_t.bpp_syntax) > 0

    def test_eval_deterministic(self):
        cfg = get_config("neural_syntax")
        m, v, x, _, out_e = _run(cfg, 64)
        out_e2 = m.apply(v, x, training=False)
        np.testing.assert_array_equal(
            np.asarray(out_e.x_tilde), np.asarray(out_e2.x_tilde)
        )

    def test_post_processing_path(self):
        cfg = get_config("neural_syntax", post_processing=True)
        m, v, x, out_t, _ = _run(cfg, 64)
        assert out_t.x_tilde.shape == x.shape
        assert "han" in v["params"]
        assert "conv_weights_gen_han" in v["params"]

    def test_csam_stencil_matches_3d_conv(self):
        """CSAM's TPU lowering (channel-shifted depthwise stencils, no
        singleton lane dim) must equal the direct NDHWC 3-D conv it
        replaced (the naive form OOM'd on TPU: f32[8,64,256,256,1] pads
        128× under the (8,128) tile — 16 GB of HLO temp at phase-2 crop
        256)."""
        from jax import lax

        from lic_tpu.models.han import _csam_conv3d

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 9, 11, 7)).astype(np.float32))
        kernel = jnp.asarray(rng.normal(size=(3, 3, 3)).astype(np.float32))

        got = _csam_conv3d(x, kernel)

        vol = x.transpose(0, 3, 1, 2)[..., None]  # (B, D=C, H, W, 1)
        want = lax.conv_general_dilated(
            vol, kernel[..., None, None], (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[..., 0].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestCharmFamily:
    def test_classic_dual_hyper(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic",
        )
        m, v, x, out_t, out_e = _run(cfg, 64)
        assert out_t.x_tilde.shape == x.shape
        assert float(out_t.bpp_z) > 0  # hyper bits counted (intended fix)
        assert float(out_e.bpp) > 0

    def test_legacy_bpp_excludes_hyper(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic", count_hyper_bpp=False,
        )
        _, _, _, out_t, _ = _run(cfg, 64)
        assert float(out_t.bpp_z) == 0.0

    def test_latent_unet_hyper_uncoded(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="latent_unet",
            swatten=False, syntax="basic", count_hyper_bpp=False,
        )
        m, v, x, out_t, _ = _run(cfg, 64)
        assert float(out_t.bpp_z) == 0.0
        assert out_t.x_tilde.shape == x.shape

    def test_unet_hyper_shared_decoder(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="unet",
            swatten=False, syntax="basic",
        )
        m, v, x, out_t, _ = _run(cfg, 128)
        assert out_t.x_tilde.shape == x.shape
        assert float(out_t.bpp_z) > 0

    def test_swatten_slice_loop(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=True, syntax="basic",
        )
        m, v, x, out_t, _ = _run(cfg, 128)
        assert out_t.x_tilde.shape == x.shape
        # per-slice attention parameters exist
        assert "atten_mean_0" in v["params"]

    def test_direct_rgb_gs(self):
        """net_unet_ha_hs_1 style: g_s outputs 3 channels, syntax bypassed."""
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic", syntax_decoder=False,
        )
        m, v, x, out_t, _ = _run(cfg, 64)
        assert out_t.x_tilde.shape == x.shape

    def test_slice_support_grows(self):
        """Later slices condition on earlier decoded slices: the cc conv
        input channels grow with the slice index."""
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic",
        )
        m, v, *_ = _run(cfg, 64)
        p = v["params"]
        c0 = p["cc_mean_transforms_0"]["c0"]["kernel"].shape[2]
        c3 = p["cc_mean_transforms_3"]["c0"]["kernel"].shape[2]
        n, ns = cfg.N, cfg.num_slices
        assert c0 == n
        assert c3 == n + 3 * (n // ns)


class TestPresets:
    def test_all_presets_construct(self):
        for name in PRESETS:
            m = build_model(name)
            assert isinstance(m, CodecModel)

    def test_high_rate_capacity(self):
        cfg = get_config("neural_syntax", is_high=True)
        assert cfg.N == 384 and cfg.M == 32


class TestGradients:
    def test_rd_gradients_flow_to_all_base_params(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic",
        )
        m = CodecModel(cfg)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        v = m.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )

        def loss(params):
            out = m.apply(
                {"params": params}, x, training=True,
                rngs={"noise": jax.random.PRNGKey(2)},
            )
            return 0.01 * 255 ** 2 * out.mse + out.bpp

        g = jax.grad(loss)(v["params"])
        norms = {
            k: float(
                jnp.sqrt(
                    sum(jnp.sum(a ** 2) for a in jax.tree.leaves(sub))
                )
            )
            for k, sub in g.items()
        }
        # encoder, decoder, hyper and slice stacks all receive gradient
        for key in ("g_a", "g_s", "h_a", "h_mean_s", "h_scale_s",
                    "cc_mean_transforms_0", "syntax_model"):
            assert norms[key] > 0, f"no gradient into {key}: {norms}"


class TestEntroformerContextCodec:
    def test_forward_and_decode_consistency(self):
        """Checkerboard context model: forward runs, bpp finite, and the
        (μ, σ) used for coding are decode-consistent (anchor predictions
        don't depend on any y values; non-anchor predictions depend only on
        anchor values)."""
        cfg = get_config("entroformer_cb")
        m, v, x, out_t, out_e = _run(cfg, 64)
        assert out_t.x_tilde.shape == x.shape
        assert np.isfinite(float(out_t.bpp)) and float(out_t.bpp) > 0
        assert float(out_t.bpp_z) > 0
        out_e2 = m.apply(v, x, training=False)
        np.testing.assert_array_equal(
            np.asarray(out_e.x_tilde), np.asarray(out_e2.x_tilde)
        )
