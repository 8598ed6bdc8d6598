"""Variable-rate gain units (beyond reference): one checkpoint, K rates.

The gain ramp init makes bpp monotone in the rate index from step 0, so
ordering/roundtrip invariants hold without training.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lic_tpu.config import CodecConfig, TrainConfig
from lic_tpu.models import CodecModel
from lic_tpu.models.compress import ChannelCoder


CFG = CodecConfig(
    family="charm", transform="plain", hyper="classic_dual",
    swatten=False, syntax="basic", gain_units=4, gain_span=4.0,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CodecModel(CFG)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )
    return model, v["params"]


def _x(seed=0, n=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (n, 64, 64, 3)).astype(np.float32))


class TestGainUnits:
    def test_bpp_monotone_in_rate(self, model_and_params):
        model, params = model_and_params
        x = _x()
        fwd = jax.jit(
            lambda p, xx, r: model.apply(
                {"params": p}, xx, training=False, rate=r
            ).bpp
        )
        bpps = [float(fwd(params, x, jnp.float32(k))) for k in range(4)]
        assert all(b2 > b1 for b1, b2 in zip(bpps, bpps[1:])), bpps
        # continuous rate lands between its neighbors
        mid = float(fwd(params, x, jnp.float32(1.5)))
        assert bpps[1] < mid < bpps[2]

    def test_rate_none_is_rate_zero(self, model_and_params):
        model, params = model_and_params
        x = _x(1)
        out0 = model.apply({"params": params}, x, training=False)
        outr = model.apply(
            {"params": params}, x, training=False, rate=jnp.float32(0.0)
        )
        np.testing.assert_array_equal(
            np.asarray(out0.x_tilde), np.asarray(outr.x_tilde)
        )

    def test_roundtrip_per_rate_and_header_rate(self, model_and_params):
        model, params = model_and_params
        x = _x(2)
        sizes = []
        for k in (0.0, 3.0):
            coder = ChannelCoder(model, params, rate=k)
            blob = coder.compress(x)
            sizes.append(len(blob))
            out = jax.jit(
                lambda p, xx: model.apply(
                    {"params": p}, xx, training=False, rate=jnp.float32(k)
                ).x_tilde
            )(params, x)
            # a rate-0 coder must decode a rate-k stream identically (the
            # rate rides the header)
            dec = ChannelCoder(model, params, rate=0.0)
            rec = dec.decompress(blob)
            np.testing.assert_allclose(
                np.asarray(rec), np.asarray(out), atol=1e-4
            )
        assert sizes[1] > sizes[0]  # higher rate -> more bytes

    def test_mixed_rate_batch(self, model_and_params):
        """One batch can mix operating points: per-image gains broadcast
        on device, per-image rates ride the headers, and batched bytes
        equal the per-image single-rate coders' bytes."""
        model, params = model_and_params
        xs = _x(5, n=2)
        coder = ChannelCoder(model, params)
        blobs = coder.compress_batch(xs, rates=[0.0, 3.0])
        c0 = ChannelCoder(model, params, rate=0.0)
        c3 = ChannelCoder(model, params, rate=3.0)
        assert blobs[0] == c0.compress(xs[:1])
        assert blobs[1] == c3.compress(xs[1:2])
        recs = np.asarray(coder.decompress_batch(blobs))
        np.testing.assert_array_equal(
            recs[0], np.asarray(c0.decompress(blobs[0]))[0]
        )
        np.testing.assert_array_equal(
            recs[1], np.asarray(c3.decompress(blobs[1]))[0]
        )

    def test_multi_rate_train_step(self, model_and_params):
        from lic_tpu.training.train import (
            create_state, make_optimizer, make_train_step,
        )

        model, params = model_and_params
        tc = TrainConfig(
            batch_size=2, crop_size=64,
            lmbda_list=(0.0025, 0.0067, 0.013, 0.05),
        )
        opt = make_optimizer(tc, steps_per_epoch=10)
        x = _x(3, n=2)
        state = create_state(model, opt, x, seed=0, params=params)
        step = jax.jit(make_train_step(model, tc, opt))
        g0 = np.asarray(state.params["log_gain"]).copy()
        for _ in range(3):
            state, metrics = step(state, x)
            assert np.isfinite(float(metrics["loss"]))
        assert not np.array_equal(
            g0, np.asarray(state.params["log_gain"])
        ), "gain vectors did not train"

    def test_eval_harness_rate(self, model_and_params):
        from lic_tpu.config import EvalConfig
        from lic_tpu.evaluation.eval import evaluate_image

        model, params = model_and_params
        x = _x(7)
        r0 = evaluate_image(model, params, x, EvalConfig(rate=0.0))
        r3 = evaluate_image(model, params, x, EvalConfig(rate=3.0))
        assert r3["bpp"] > r0["bpp"]

    def test_rejected_outside_charm(self):
        bad = CodecConfig(
            family="charm", context="entroformer", gain_units=2,
            transform="plain", hyper="elic", syntax="none",
        )
        model = CodecModel(bad)
        with pytest.raises(ValueError, match="gain_units"):
            model.init(
                {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                jnp.zeros((1, 64, 64, 3), jnp.float32), training=True,
            )
