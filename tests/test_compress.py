"""Real-bitstream tests: rANS round-trips, CDF quantization, and full
model-level compress→decompress reconstruction parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.coding.codec import FactorizedCoder, GaussianCoder, get_scale_table
from lic_tpu.coding.rans import RansCodec, pmf_to_quantized_cdf
from lic_tpu.config import CodecConfig
from lic_tpu.models import CodecModel
from lic_tpu.models.compress import ChannelCoder


class TestRansCore:
    def test_roundtrip_with_escapes(self):
        rng = np.random.default_rng(0)
        xs = np.arange(-20, 21)
        rows, offs = [], []
        for s in (0.5, 1.0, 3.0, 8.0):
            pmf = np.exp(-0.5 * (xs / s) ** 2)
            pmf /= pmf.sum() * 1.0001
            rows.append(pmf_to_quantized_cdf(pmf))
            offs.append(-20)
        codec = RansCodec(np.stack(rows), np.asarray(offs))
        syms = rng.integers(-60, 60, size=5000).astype(np.int32)
        idx = rng.integers(0, 4, size=5000).astype(np.int32)
        blob = codec.encode(syms, idx)
        np.testing.assert_array_equal(codec.decode(blob, idx), syms)

    def test_rate_near_entropy(self):
        rng = np.random.default_rng(1)
        xs = np.arange(-20, 21)
        pmf = np.exp(-0.5 * (xs / 3.0) ** 2)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf * 0.9999)
        codec = RansCodec(cdf[None], np.asarray([-20]))
        syms = np.clip(rng.normal(0, 3, 20000).round(), -20, 20).astype(np.int32)
        idx = np.zeros(20000, np.int32)
        blob = codec.encode(syms, idx)
        ent = -(pmf * np.log2(pmf)).sum()
        bits_per_sym = len(blob) * 8 / 20000
        assert bits_per_sym < ent + 0.05, (bits_per_sym, ent)

    def test_quantized_cdf_properties(self):
        pmf = np.asarray([0.5, 0.3, 0.15, 0.05])
        cdf = pmf_to_quantized_cdf(pmf * 0.999)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert (np.diff(cdf.astype(np.int64)) >= 1).all()  # every slot codable

    def test_truncated_stream_raises(self):
        xs = np.arange(-20, 21)
        pmf = np.exp(-0.5 * (xs / 3.0) ** 2)
        pmf /= pmf.sum()
        codec = RansCodec(
            pmf_to_quantized_cdf(pmf * 0.9999)[None], np.asarray([-20])
        )
        syms = np.clip(
            np.random.default_rng(4).normal(0, 3, 2000).round(), -20, 20
        ).astype(np.int32)
        idx = np.zeros(2000, np.int32)
        blob = codec.encode(syms, idx)
        with pytest.raises(ValueError, match="rANS"):
            codec.decode(blob[: len(blob) // 2], idx)
        with pytest.raises(ValueError, match="rANS"):
            corrupt = bytearray(blob)
            corrupt[len(blob) // 2] ^= 0xFF
            codec.decode(bytes(corrupt), idx)


class TestGaussianCoder:
    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        gc = GaussianCoder()
        means = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
        scales = (np.abs(rng.standard_normal((1, 8, 8, 16))) * 3 + 0.05).astype(
            np.float32
        )
        y = means + scales * rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
        blob = gc.encode(y, means, scales)
        out = gc.decode(blob, means, scales)
        np.testing.assert_allclose(out, np.round(y - means) + means, atol=1e-5)

    def test_scale_indexes_lower_bound(self):
        gc = GaussianCoder()
        idx = gc.scale_indexes(np.asarray([0.0, 0.11, 1.0, 1000.0]))
        table = get_scale_table()
        assert (table[idx] >= np.asarray([0.11, 0.11, 1.0, table[-1]]) - 1e-6).all()

    def test_device_scale_idx_matches_host(self):
        """The on-device index computation (wire-efficient codec path) binds
        σ to the same table rows as the host coder.  Consistency only
        requires device==device (both codec ends run the same jitted fn),
        but matching the host semantics keeps the CDF tables honest; at
        exact bin boundaries fp32-vs-float64 may differ by one row."""
        import jax.numpy as jnp

        from lic_tpu.models.compress import _dev_scale_idx

        gc = GaussianCoder()
        rng = np.random.default_rng(11)
        sigma = np.exp(rng.uniform(-3, 6, (4096,))).astype(np.float32)
        host = gc.scale_indexes(sigma)
        dev = np.asarray(
            _dev_scale_idx(
                jnp.asarray(sigma), jnp.asarray(gc.scale_table, jnp.float32)
            )
        ).astype(np.int32)
        assert np.abs(dev - host).max() <= 1
        assert (dev == host).mean() > 0.999


class TestModelCompress:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic",
        )
        model = CodecModel(cfg)
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
        )
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        return model, v["params"], x

    def test_compress_decompress_matches_forward(self, setup):
        model, params, x = setup
        coder = ChannelCoder(model, params)
        blob = coder.compress(x)
        assert len(blob) > 8
        rec = coder.decompress(blob)
        # decoded reconstruction must equal the eval-mode forward recon
        out = model.apply({"params": params}, x, training=False)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(out.x_tilde), atol=1e-4
        )

    def test_real_bpp_close_to_estimate(self, setup):
        model, params, x = setup
        coder = ChannelCoder(model, params)
        blob = coder.compress(x)
        real_bpp = len(blob) * 8 / (128 * 128)
        out = model.apply({"params": params}, x, training=False)
        est_bpp = float(out.bpp)
        # untrained model → large rates; real bitstream should be within
        # ~15% + escape overhead of the likelihood estimate
        assert real_bpp < est_bpp * 1.2 + 0.3, (real_bpp, est_bpp)

    def test_arbitrary_size_roundtrip(self, setup):
        """Non-/64 sizes: compress pads internally, decompress crops back."""
        model, params, _ = setup
        coder = ChannelCoder(model, params)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 100, 90, 3)).astype(np.float32))
        blob = coder.compress(x)
        rec = coder.decompress(blob)
        assert rec.shape == (1, 100, 90, 3)
        from lic_tpu.data.pad import pad_to_multiple

        xp, _ = pad_to_multiple(x, 64)
        out = model.apply({"params": params}, xp, training=False)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(out.x_tilde)[:, :100, :90], atol=1e-4
        )

    def test_model_identity_checked(self, setup):
        model, params, x = setup
        enc = ChannelCoder(model, params, name="net_a")
        blob = enc.compress(x)
        dec = ChannelCoder(model, params, name="net_b")
        with pytest.raises(ValueError, match="net_a"):
            dec.decompress(blob)
        with pytest.raises(ValueError, match="magic"):
            enc.decompress(b"XXXX" + blob[4:])

    def test_batch_path_matches_single(self, setup):
        """compress_batch/decompress_batch (batched device passes + host
        coding overlap) produce byte-identical streams and identical
        reconstructions to the per-image path."""
        model, params, _ = setup
        coder = ChannelCoder(model, params)
        rng = np.random.default_rng(13)
        xs = jnp.asarray(rng.uniform(-1, 1, (3, 128, 128, 3)).astype(np.float32))
        blobs = coder.compress_batch(xs)
        for i in range(3):
            single = coder.compress(xs[i : i + 1])
            assert blobs[i] == single, f"stream {i} differs from single path"
        rec = coder.decompress_batch(blobs)
        rec0 = coder.decompress(blobs[0])
        np.testing.assert_allclose(
            np.asarray(rec[0:1]), np.asarray(rec0), atol=1e-4
        )

    def test_undecodable_hyper_rejected(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="latent_unet",
            swatten=False, syntax="basic",
        )
        model = CodecModel(cfg)
        with pytest.raises(ValueError, match="not decodable"):
            ChannelCoder(model, params={})


class TestWavefront:
    def test_groups_partition_and_causality(self):
        """Every position appears exactly once; every unmasked context cell
        of a position lies on a strictly earlier wavefront."""
        from lic_tpu.models.compress import wavefront_groups

        h, w = 7, 11
        seen = np.zeros((h, w), bool)
        t_of = np.full((h, w), -1, np.int64)
        groups = wavefront_groups(h, w)
        for t, (ps, qs) in enumerate(groups):
            assert not seen[ps, qs].any()
            seen[ps, qs] = True
            t_of[ps, qs] = t
        assert seen.all()
        # context cells: patch[i,j] -> (p+i-3, q+j-2), masked (3,2),(3,3)
        for p in range(h):
            for q in range(w):
                for i in range(4):
                    for j in range(4):
                        if i == 3 and j >= 2:
                            continue
                        pp, qq = p + i - 3, q + j - 2
                        if 0 <= pp < h and 0 <= qq < w:
                            assert t_of[pp, qq] < t_of[p, q]

    def test_stream_decoder_matches_oneshot(self):
        from lic_tpu.coding.rans import RansCodec, pmf_to_quantized_cdf

        rng = np.random.default_rng(5)
        xs = np.arange(-10, 11)
        pmf = np.exp(-0.5 * (xs / 2.0) ** 2)
        pmf /= pmf.sum() * 1.0001
        codec = RansCodec(
            np.stack([pmf_to_quantized_cdf(pmf)] * 3),
            np.asarray([-10, -10, -10]),
        )
        syms = rng.integers(-15, 15, 500).astype(np.int32)
        idx = rng.integers(0, 3, 500).astype(np.int32)
        blob = codec.encode(syms, idx)
        dec = codec.stream_decoder(blob)
        outs = [dec.decode(idx[i : i + 37]) for i in range(0, 500, 37)]
        dec.finish()
        np.testing.assert_array_equal(np.concatenate(outs), syms)


class TestNeuralSyntaxCompress:
    def test_scan_context_matches_training_path(self):
        """The wavefront scan's per-position (μ, σ-row) must equal the
        TRAINING path's prediction: ``block_sample`` (masked y, unmasked
        hyper) + the same context head on the full rounded plane.  This is
        the geometry contract — a shifted gather window round-trips fine
        (encoder and decoder share it) but silently destroys the rate
        model a trained checkpoint was optimized for."""
        from lic_tpu.entropy.context import block_sample
        from lic_tpu.models import CodecModel, build_model
        from lic_tpu.models.compress import ChannelCoder

        model = build_model("neural_syntax")
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        coder = ChannelCoder(model, v["params"])
        cfg = model.cfg

        z3 = coder._analyze(x)
        z2_int = jnp.round(coder._ns_ha(z3))
        h2 = coder._ns_hs(z2_int)
        y_int = np.asarray(jnp.round(z3[..., cfg.M:])).astype(np.int32)[0]
        hy, wy, c = y_int.shape

        # device scan, encode mode (full plane known)
        fn, groups, n_lanes, p_max, _ = coder._ns_scan(hy, wy)
        _, rows_dev, mu_dev, _, _, _ = fn(
            jnp.asarray(np.asarray(h2, np.float32)),
            jnp.zeros((1, 2 * n_lanes), jnp.int32),
            jnp.asarray(y_int)[None], jnp.int32(0),
        )
        # (T, B=1, P, C) → (T, P, C)
        mu_dev, rows_dev = np.asarray(mu_dev)[:, 0], np.asarray(rows_dev)[:, 0]

        # training path: block_sample patches + the same head
        ypat = block_sample(jnp.asarray(y_int, jnp.float32)[None], masked=True)
        hpat = block_sample(h2, masked=False)
        mu_ref, sg_ref = model.apply(
            v, jnp.concatenate([ypat, hpat], axis=-1),
            method=CodecModel.ns_context_head,
        )
        mu_ref = np.asarray(jnp.round(mu_ref)).reshape(hy, wy, c)

        n_match = n_tot = 0
        for t, (ps, qs) in enumerate(groups):
            n_match += (mu_dev[t, : len(ps)] == mu_ref[ps, qs]).sum()
            n_tot += len(ps) * c
        # identical math in different batch shapes: allow a vanishing
        # fraction of fp32 round()-boundary flips, nothing systematic
        assert n_match / n_tot > 0.999, f"{n_match}/{n_tot}"

    def test_roundtrip_matches_forward(self):
        """The wavefront-scheduled sequential decode reproduces the jitted
        eval forward exactly (same integer latents → same reconstruction)."""
        from lic_tpu.models import build_model

        model = build_model("neural_syntax")
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        coder = ChannelCoder(model, v["params"])
        blob = coder.compress(x)
        assert len(blob) > 12
        rec = coder.decompress(blob)
        out = model.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(out.x_tilde), atol=1e-4
        )

    def test_real_bpp_close_to_estimate(self):
        from lic_tpu.models import build_model

        model = build_model("neural_syntax")
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        coder = ChannelCoder(model, v["params"])
        real_bpp = len(coder.compress(x)) * 8 / (128 * 128)
        est_bpp = float(model.apply(v, x, training=False).bpp)
        assert real_bpp < est_bpp * 1.2 + 0.3, (real_bpp, est_bpp)


class TestDecodableUnetHyper:
    def test_roundtrip_matches_forward(self):
        """The decodable U-Net hyper (skip pyramid re-synthesized from coded
        ẑ) emits a real bitstream that reproduces the eval forward."""
        from lic_tpu.models import build_model

        # keep the CPU test light: the unet_dec hyper path is what's under
        # test; transforms/attention are covered elsewhere
        model = build_model(
            "net_unet_ha_hs_dec", transform="plain", swatten=False,
            syntax="basic",
        )
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        coder = ChannelCoder(model, v["params"], name="net_unet_ha_hs_dec")
        blob = coder.compress(x)
        rec = coder.decompress(blob)
        out = model.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(out.x_tilde), atol=1e-4
        )


class TestEntroformerCompress:
    def test_roundtrip_matches_forward(self):
        from lic_tpu.models import get_config

        cfg = get_config("entroformer_cb")
        model = CodecModel(cfg)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        coder = ChannelCoder(model, v["params"])
        blob = coder.compress(x)
        rec = coder.decompress(blob)
        out = model.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(out.x_tilde), atol=1e-4
        )

    def test_real_bpp_close_to_estimate(self):
        """Coded bits must track the forward's likelihood estimate — the
        invariant that catches a decode-consistent-but-wrong context (the
        stream would still roundtrip; only the rate model would suffer)."""
        from lic_tpu.models import get_config

        cfg = get_config("entroformer_cb")
        model = CodecModel(cfg)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        coder = ChannelCoder(model, v["params"])
        real_bpp = len(coder.compress(x)) * 8 / (128 * 128)
        est_bpp = float(model.apply(v, x, training=False).bpp)
        assert real_bpp < est_bpp * 1.2 + 0.3, (real_bpp, est_bpp)

    def test_ns_batched_matches_single_and_rejects_truncation(self):
        """The wavefront scan batches across images (each stays its own
        L-lane rANS stream): batched bytes == per-image bytes, batched
        decode == per-image decode, and truncation is caught loudly."""
        import pytest

        from lic_tpu.models import build_model

        model = build_model("neural_syntax")
        rng = np.random.default_rng(13)
        xs = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            xs[:1], training=True,
        )
        coder = ChannelCoder(model, v["params"], name="neural_syntax")
        blobs = coder.compress_batch(xs)
        assert blobs[0] == coder.compress(xs[:1])
        recs = coder.decompress_batch(blobs)
        np.testing.assert_array_equal(
            np.asarray(recs[:1]), np.asarray(coder.decompress(blobs[0]))
        )
        np.testing.assert_array_equal(
            np.asarray(recs[1:]), np.asarray(coder.decompress(blobs[1]))
        )
        with pytest.raises(ValueError, match="corrupt or truncated"):
            coder.decompress(blobs[0][: len(blobs[0]) - 40])

    def test_batched_matches_single_and_rejects_truncation(self):
        """The checkerboard pass rides the same single-dispatch contract as
        the charm slice chain: batched bytes == per-image bytes, and the
        interleaved rANS final-state check catches truncation."""
        import pytest

        from lic_tpu.models import get_config

        cfg = get_config("entroformer_cb")
        model = CodecModel(cfg)
        rng = np.random.default_rng(8)
        xs = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            xs[:1], training=True,
        )
        coder = ChannelCoder(model, v["params"])
        blobs = coder.compress_batch(xs)
        assert blobs[0] == coder.compress(xs[:1])
        recs = coder.decompress_batch(blobs)
        np.testing.assert_array_equal(
            np.asarray(recs[:1]), np.asarray(coder.decompress(blobs[0]))
        )
        with pytest.raises(ValueError, match="corrupt or truncated"):
            coder.decompress(blobs[0][: len(blobs[0]) - 40])


class TestPallasDrainE2E:
    """Whole-codec roundtrips with the pallas rANS drain forced on
    (interpret mode on CPU): streams encoded by the scan path decode to
    the exact eval-forward reconstruction through the pallas kernel, for
    every AR family (charm slices / checkerboard / NS wavefronts)."""

    @pytest.fixture(autouse=True)
    def _force_pallas(self):
        from lic_tpu.coding.pallas_rans import set_pallas_rans

        set_pallas_rans(True, interpret=True)
        yield
        set_pallas_rans(None)

    def _roundtrip(self, model, params, x, name="m"):
        coder = ChannelCoder(model, params, name=name)
        blob = coder.compress(x)
        rec = coder.decompress(blob)
        out = model.apply({"params": params}, x, training=False)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(out.x_tilde), atol=1e-4
        )
        return blob

    def test_charm_slices(self):
        cfg = CodecConfig(
            family="charm", transform="plain", hyper="classic_dual",
            swatten=False, syntax="basic",
        )
        model = CodecModel(cfg)
        rng = np.random.default_rng(40)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        blob = self._roundtrip(model, v["params"], x)
        # encode drains are cond-skipped in both lowerings → same bytes
        from lic_tpu.coding.pallas_rans import set_pallas_rans

        set_pallas_rans(False)
        scan_coder = ChannelCoder(model, v["params"], name="m")
        assert scan_coder.compress(x) == blob

    def test_entroformer_checkerboard(self):
        from lic_tpu.models import get_config

        cfg = get_config("entroformer_cb")
        model = CodecModel(cfg)
        rng = np.random.default_rng(41)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        self._roundtrip(model, v["params"], x, name="entroformer_cb")

    def test_neural_syntax_wavefront(self):
        from lic_tpu.models import build_model

        model = build_model("neural_syntax")
        rng = np.random.default_rng(42)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        blob = self._roundtrip(model, v["params"], x, name="neural_syntax")
        # batched wavefront scan through the kernel: per-image bytes and
        # reconstructions must match the B=1 path exactly
        coder = ChannelCoder(model, v["params"], name="neural_syntax")
        xs = jnp.concatenate([x, -x], axis=0)
        blobs = coder.compress_batch(xs)
        assert blobs[0] == blob
        recs = coder.decompress_batch(blobs)
        np.testing.assert_array_equal(
            np.asarray(recs[:1]), np.asarray(coder.decompress(blob))
        )
