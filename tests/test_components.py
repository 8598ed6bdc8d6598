"""Tests for the inventoried-but-dormant reference components and utilities:
ViT, entroformer, masked conv, GSDN, trit-plane progressive coding, analysis
helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.layers.entroformer import (
    EntroformerConfig,
    EntroformerContext,
    TransHyperScale,
    checkerboard_masks,
    relative_position_buckets,
)
from lic_tpu.layers.misc import (
    GSDN,
    BlockTrain,
    LinearAttention,
    MaskedConv2d,
    SpatialSelfAttention,
    depth_to_space,
    space_to_depth,
)
from lic_tpu.layers.vit import VisionTransformer, vit_latent_syntax

SMALL_CFG = EntroformerConfig(dim=32, num_layers=1, num_heads=4, dim_head=8)


class TestViT:
    def test_latent_syntax_factory(self):
        m = vit_latent_syntax(num_classes=16)
        x = jnp.zeros((2, 16, 16, 3))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (2, 16)


class TestEntroformer:
    def test_relative_buckets_static(self):
        b = relative_position_buckets((4, 4), (4, 4), 5)
        assert b.shape == (16, 16)
        assert b.max() < 25 and b.min() >= 0
        # center-to-adjacent is a distinct bucket; far pairs collapse to 0
        assert b[0, 15] == 0

    def test_rpe_onehot_matches_gather(self):
        """The one-hot-matmul RPE (TPU: gathers don't vectorize) must equal
        the naive table gather bit-for-bit on CPU: attention scores use
        ctx[b,h,l,m] = q[b,l,h,:]·table[bucket[l,m],:]."""
        from lic_tpu.layers.entroformer import EntroformerAttention

        cfg = SMALL_CFG
        h, w = 4, 6
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, h * w, cfg.dim)).astype(np.float32))
        m = EntroformerAttention(cfg)
        y, v = m.init_with_output(jax.random.PRNGKey(0), x, (h, w))
        # reference: explicit gather path re-stated here
        emb = v["params"]["relative_attention_bias"]["embedding"]
        qkv = x @ v["params"]["qkv"]["kernel"]
        q = qkv.reshape(2, h * w, 3, cfg.num_heads, cfg.dim_head)[:, :, 0]
        buckets = relative_position_buckets((h, w), (h, w), 5)
        rpe_ref = jnp.asarray(np.asarray(emb)[buckets])  # (L, L, hd) gather
        ctx_ref = jnp.einsum("blhd,lmd->bhlm", q, rpe_ref)
        # the module's one-hot path, reconstructed
        nb = 25
        oh = (
            jnp.asarray(buckets)[:, :, None] == jnp.arange(nb)[None, None, :]
        ).astype(jnp.float32)
        ctx_oh = jnp.einsum(
            "blhd,lmd->bhlm", q, jnp.einsum("lmc,cd->lmd", oh, emb)
        )
        np.testing.assert_array_equal(np.asarray(ctx_oh), np.asarray(ctx_ref))
        assert y.shape == x.shape

    def test_trans_hyper_scale_down_up(self):
        cfg = SMALL_CFG
        down = TransHyperScale(cin=16, cout=8, scale=2, down=True, cfg=cfg)
        x = jnp.zeros((1, 16, 16, 16))
        y, _ = down.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 4, 4, 8)
        up = TransHyperScale(cin=8, cout=16, scale=2, down=False, cfg=cfg)
        z, _ = up.init_with_output(jax.random.PRNGKey(0), y)
        assert z.shape == (1, 16, 16, 16)

    def test_context_checkerboard_no_self_leak(self):
        """Changing a non-anchor value must not change any prediction made
        for non-anchor positions' (μ, σ) beyond... crucially, a position's
        own prediction must be independent of its own value."""
        cfg = SMALL_CFG
        m = EntroformerContext(latent_channels=4, mode="checkerboard", cfg=cfg)
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
        h = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), y, h)
        mu0, s0 = m.apply(v, y, h)

        anchor, _ = checkerboard_masks(4, 4)
        # perturb one NON-anchor position
        na = np.argwhere(~anchor)[0]
        y2 = y.at[0, na[0], na[1], :].add(10.0)
        mu1, s1 = m.apply(v, y2, h)
        np.testing.assert_allclose(np.asarray(mu0), np.asarray(mu1), atol=1e-5)

        # perturb one anchor position: its own prediction must not change
        a = np.argwhere(anchor)[0]
        y3 = y.at[0, a[0], a[1], :].add(10.0)
        mu2, _ = m.apply(v, y3, h)
        np.testing.assert_allclose(
            np.asarray(mu0)[0, a[0], a[1]], np.asarray(mu2)[0, a[0], a[1]],
            atol=1e-5,
        )

    def test_context_raster_causality(self):
        cfg = SMALL_CFG
        m = EntroformerContext(latent_channels=2, mode="raster", cfg=cfg)
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.standard_normal((1, 3, 3, 2)).astype(np.float32))
        h = jnp.zeros((1, 3, 3, 4))
        v = m.init(jax.random.PRNGKey(0), y, h)
        mu0, _ = m.apply(v, y, h)
        # perturbing the LAST raster position affects no prediction at all
        y2 = y.at[0, 2, 2, :].add(5.0)
        mu1, _ = m.apply(v, y2, h)
        np.testing.assert_allclose(np.asarray(mu0), np.asarray(mu1), atol=1e-5)
        # perturbing the FIRST position affects some later prediction
        y3 = y.at[0, 0, 0, :].add(5.0)
        mu2, _ = m.apply(v, y3, h)
        assert not np.allclose(np.asarray(mu0), np.asarray(mu2), atol=1e-5)


class TestMiscLayers:
    def test_masked_conv_causality(self):
        m = MaskedConv2d(features=4, kernel_size=5, mask_type="A")
        x = jnp.zeros((1, 8, 8, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(v, x)
        # center pixel must not influence its own output (mask A)
        x2 = x.at[0, 4, 4, :].set(9.0)
        y1 = m.apply(v, x2)
        np.testing.assert_allclose(
            np.asarray(y0)[0, 4, 4], np.asarray(y1)[0, 4, 4], atol=1e-6
        )
        # future pixel must not influence past output
        x3 = x.at[0, 5, 5, :].set(9.0)
        y2 = m.apply(v, x3)
        np.testing.assert_allclose(
            np.asarray(y0)[0, 4, 4], np.asarray(y2)[0, 4, 4], atol=1e-6
        )

    def test_gsdn_inverse_composition(self):
        """GSDN then inverse-GSDN with the same params ≈ identity at init."""
        fwd = GSDN(8, inverse=False)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 4, 4, 8)).astype(
                np.float32
            )
        )
        v = fwd.init(jax.random.PRNGKey(0), x)
        y = fwd.apply(v, x)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

    def test_space_depth_roundtrip(self):
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 8, 8, 4)).astype(
                np.float32
            )
        )
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
        )

    def test_linear_and_spatial_attention_shapes(self):
        x = jnp.zeros((1, 8, 8, 32))
        for m in (LinearAttention(heads=4, dim_head=8), SpatialSelfAttention()):
            y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
            assert y.shape == x.shape

    def test_block_train_shape(self):
        m = BlockTrain(out_channels=16, embed_dim=32, num_heads=4)
        x = jnp.zeros((1, 4, 4, 16))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 4, 4, 16)

    def test_unet_ha_hs_split_pair(self):
        """Dormant spatial Unet_ha/Unet_hs pair (Block_unet.py:669-770):
        encoder 4-tuple feeds decoder; /4 middle, x20-ch output contract."""
        from lic_tpu.layers.misc import UnetHa, UnetHs

        ha = UnetHa(in_channels=192, num_heads=8, depth=1)
        x = jnp.zeros((1, 16, 16, 192))
        (z, mid, skip1, inp), _ = ha.init_with_output(jax.random.PRNGKey(0), x)
        assert z.shape == (1, 4, 4, 512) and mid.shape == z.shape
        assert skip1.shape == (1, 8, 8, 256) and inp.shape == x.shape

        hs = UnetHs(out_channels=320, num_heads=8, depth=1)
        y, _ = hs.init_with_output(jax.random.PRNGKey(1), z, mid, skip1, inp)
        assert y.shape == (1, 16, 16, 320)

    def test_rbs_synthesis_transform(self):
        """Working synthesisTransformModel_RBS assembly (Net_unet.py:371-419,
        broken+never instantiated in the ref): x16 upsample, M out."""
        from lic_tpu.models.transforms import SynthesisTransform

        m = SynthesisTransform(N=32, out_channels=16, variant="rbs")
        x = jnp.zeros((1, 4, 4, 32))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 64, 64, 16)


class TestTritPlane:
    def test_balanced_ternary_roundtrip(self):
        from lic_tpu.coding.tritplane import (
            from_balanced_ternary,
            num_planes_for,
            to_balanced_ternary,
        )

        rng = np.random.default_rng(4)
        s = rng.integers(-40, 41, size=1000)
        k = num_planes_for(40)
        d = to_balanced_ternary(s, k)
        np.testing.assert_array_equal(from_balanced_ternary(d), s)

    def test_progressive_rate_distortion(self):
        from lic_tpu.coding.tritplane import TritPlaneCoder, num_planes_for

        rng = np.random.default_rng(5)
        s = np.round(rng.normal(0, 8, 4096)).astype(np.int64)
        k = num_planes_for(int(np.abs(s).max()))
        coder = TritPlaneCoder()
        blobs = coder.encode(s, k)
        # full decode is exact
        full = coder.decode(blobs, s.size, k)
        np.testing.assert_array_equal(full, s)
        # truncated decode degrades monotonically
        errs = []
        for keep in range(1, k + 1):
            rec = coder.decode(blobs[:keep], s.size, k)
            errs.append(float(np.mean((rec - s) ** 2)))
        assert errs[-1] == 0.0
        assert all(errs[i] >= errs[i + 1] for i in range(len(errs) - 1))

    def test_diff_rank_roundtrip(self):
        from lic_tpu.coding.tritplane import (
            diff_decode,
            diff_encode,
            rank_decode,
            rank_encode,
        )

        rng = np.random.default_rng(6)
        ch = rng.integers(0, 256, size=(32, 16)).astype(np.int64)
        d = diff_encode(ch)
        ranks, table = rank_encode(d)
        d2 = rank_decode(ranks, table)
        np.testing.assert_array_equal(d2, d)
        np.testing.assert_array_equal(diff_decode(d2), ch)


class TestInitSchemes:
    """``utils/init.py::apply_init_scheme`` — the reference's tree-walking
    ``weight_init`` family (``model/util.py:175-283``) on a params pytree."""

    def _params(self):
        from lic_tpu.config import CodecConfig
        from lic_tpu.models import CodecModel

        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic",
        )
        m = CodecModel(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        p = m.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )["params"]
        return p

    def test_xavier_uniform_statistics_and_selectivity(self):
        from lic_tpu.utils.init import apply_init_scheme

        p = self._params()
        q = apply_init_scheme(jax.random.PRNGKey(7), p, "xavier_uniform")

        flat_p = dict(jax.tree_util.tree_flatten_with_path(p)[0] and {
            "/".join(str(getattr(k, "key", k)) for k in kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(p)[0]
        })
        flat_q = {
            "/".join(str(getattr(k, "key", k)) for k in kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(q)[0]
        }
        # a conv kernel: redrawn, bounded by the xavier limit
        name = next(
            n for n, v in flat_q.items()
            if n.endswith("kernel") and v.ndim == 4
        )
        kh, kw, ci, co = flat_q[name].shape
        limit = np.sqrt(6.0 / (kh * kw * ci + kh * kw * co))
        assert float(jnp.max(jnp.abs(flat_q[name]))) <= limit + 1e-6
        assert not np.allclose(np.asarray(flat_p[name]), np.asarray(flat_q[name]))
        # biases zeroed
        bias = next(n for n in flat_q if n.endswith("bias"))
        np.testing.assert_array_equal(np.asarray(flat_q[bias]), 0.0)
        # GDN reparameterized leaves untouched (not 'kernel'/'bias')
        gdn = [n for n in flat_p if "gdn" in n.lower() and not n.endswith(("kernel", "bias"))]
        assert gdn, "expected GDN beta/gamma leaves"
        for n in gdn:
            np.testing.assert_array_equal(
                np.asarray(flat_p[n]), np.asarray(flat_q[n])
            )

    def test_schemes_differ_and_are_deterministic(self):
        from lic_tpu.utils.init import SCHEMES, apply_init_scheme

        p = self._params()
        outs = {}
        for s in SCHEMES:
            a = apply_init_scheme(jax.random.PRNGKey(3), p, s)
            b = apply_init_scheme(jax.random.PRNGKey(3), p, s)
            la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
            for x, y in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            outs[s] = float(
                sum(jnp.sum(jnp.abs(v)) for v in jax.tree.leaves(a))
            )
        assert len({round(v, 3) for v in outs.values()}) > 1

    def test_trunc_normal_bounds(self):
        from lic_tpu.utils.init import trunc_normal_array

        x = trunc_normal_array(jax.random.PRNGKey(0), (4096,), std=0.02)
        assert float(jnp.max(x)) <= 2.0 and float(jnp.min(x)) >= -2.0
        assert 0.015 < float(jnp.std(x)) < 0.025


class TestUtils:
    def test_analyze_data(self):
        from lic_tpu.utils.analyze import analyze_data

        stats = analyze_data(np.asarray([1.0, -2.0, 3.0]), log_fn=lambda s: None)
        assert stats["min"] == -2.0 and stats["max"] == 3.0

    def test_erf(self):
        from lic_tpu.utils.analyze import effective_receptive_field, erf_heatmap

        def fn(x):  # 3x3 mean filter as a toy model
            k = jnp.ones((3, 3, 1, 1)) / 9.0
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        x = jnp.zeros((1, 9, 9, 1))
        score = effective_receptive_field(fn, x)
        assert score.shape == (9, 9)
        assert score[4, 4] > 0 and score[0, 0] == 0
        hm = erf_heatmap(score)
        assert hm.max() <= 1.0

    def test_dump_feature_heatmaps(self, tmp_path):
        from lic_tpu.utils.analyze import dump_feature_heatmaps

        feats = np.random.default_rng(0).standard_normal((1, 8, 6, 5))
        n = dump_feature_heatmaps(
            feats, str(tmp_path), prefix="t", max_channels=3, annot_grid=True
        )
        import os

        if n:  # matplotlib present: 3 per-channel renders + 1 grid
            assert n == 4
            assert os.path.exists(tmp_path / "t_0_heat.png")
            assert os.path.exists(tmp_path / "t_grid.png")

    def test_span_profiler(self):
        from lic_tpu.utils.profiling import reset_spans, span, span_stats

        reset_spans()
        with span("test"):
            pass
        assert span_stats()["test"]["count"] == 1


class TestHaar:
    def test_dwt_idwt_exact_roundtrip(self):
        from lic_tpu.layers.haar import haar_dwt2, haar_idwt2, haar_pyramid

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 16, 12, 3)).astype(np.float32))
        y = haar_dwt2(x)
        assert y.shape == (2, 8, 6, 12)
        back = haar_idwt2(y)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)
        # orthonormal: energy preserved
        np.testing.assert_allclose(
            float(jnp.sum(x * x)), float(jnp.sum(y * y)), rtol=1e-5
        )
        pyr = haar_pyramid(x, levels=2)
        assert pyr[0].shape == (2, 8, 6, 12) and pyr[1].shape == (2, 4, 3, 12)
