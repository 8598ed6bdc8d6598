"""Target-bpp rate control over gain-unit checkpoints (beyond reference).

The gain ramp init makes bpp monotone in the continuous rate index from
step 0 (see test_gain_units), so the bisection solver is testable at
random init: solved operating points must bracket the target and order
themselves with it, and the solved rate must round-trip through the real
bitstream path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lic_tpu.config import CodecConfig
from lic_tpu.models import CodecModel
from lic_tpu.models.compress import ChannelCoder
from lic_tpu.serving import solve_rate_for_bpp

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


def _x(seed=0, h=64, w=64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))


def _bpp(model, params, x, rate):
    out = model.apply(
        {"params": params}, x, training=False, rate=jnp.float32(rate)
    )
    return float(out.bpp)


class TestSolveRate:
    def test_hits_target_within_tol(self, model_and_params):
        model, params = model_and_params
        x = _x()
        lo = _bpp(model, params, x, 0.0)
        hi = _bpp(model, params, x, 3.0)
        target = 0.5 * (lo + hi)
        rate, est = solve_rate_for_bpp(
            model, params, x, target, tol=0.02, max_iters=16
        )
        assert 0.0 < rate < 3.0
        assert abs(est - target) <= 0.02 * target
        # the reported estimate is the model's bpp at that rate
        np.testing.assert_allclose(
            est, _bpp(model, params, x, rate), rtol=1e-5
        )

    def test_solved_rates_order_with_targets(self, model_and_params):
        model, params = model_and_params
        x = _x(1)
        lo = _bpp(model, params, x, 0.0)
        hi = _bpp(model, params, x, 3.0)
        t1, t2 = lo + 0.25 * (hi - lo), lo + 0.75 * (hi - lo)
        r1, _ = solve_rate_for_bpp(model, params, x, t1)
        r2, _ = solve_rate_for_bpp(model, params, x, t2)
        assert r1 < r2

    def test_out_of_span_targets_clamp(self, model_and_params):
        model, params = model_and_params
        x = _x(2)
        lo = _bpp(model, params, x, 0.0)
        hi = _bpp(model, params, x, 3.0)
        rate, est = solve_rate_for_bpp(model, params, x, lo * 0.5)
        assert rate == 0.0 and est > lo * 0.5
        rate, est = solve_rate_for_bpp(model, params, x, hi * 2.0)
        assert rate == 3.0 and est < hi * 2.0

    def test_non_multiple_of_64_renormalizes(self, model_and_params):
        """A 50×70 image pads to 64×128 internally; the solver's estimate
        is per TRUE pixel, so it must exceed the padded-pixel bpp by the
        pad ratio at the same rate."""
        model, params = model_and_params
        x = _x(3, h=50, w=70)
        from lic_tpu.data.pad import pad_to_multiple

        padded, _ = pad_to_multiple(x)
        b_padded = _bpp(model, params, padded, 0.0)
        # clamped low target → endpoint estimate, renormalized
        _, est = solve_rate_for_bpp(model, params, x, 1e-4)
        np.testing.assert_allclose(
            est, b_padded * (64 * 128) / (50 * 70), rtol=1e-5
        )

    def test_gain_free_model_raises(self):
        model = CodecModel(CFG.replace(gain_units=0))
        with pytest.raises(ValueError, match="gain_units"):
            solve_rate_for_bpp(model, None, _x(), 0.5)

    def test_solved_rate_roundtrips_real_bitstream(self, model_and_params):
        """compress(rate=solved) must produce a decodable stream whose
        reconstruction equals the jitted forward at that rate (the rate
        rides the header — the decoding coder was built rate-free)."""
        model, params = model_and_params
        x = _x(4)
        lo = _bpp(model, params, x, 0.0)
        hi = _bpp(model, params, x, 3.0)
        rate, _ = solve_rate_for_bpp(model, params, x, 0.5 * (lo + hi))
        coder = ChannelCoder(model, params)
        blob = coder.compress(x, rate=rate)
        rec = coder.decompress(blob)
        want = jax.jit(
            lambda p, xx: model.apply(
                {"params": p}, xx, training=False, rate=jnp.float32(rate)
            ).x_tilde
        )(params, x)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(want), atol=1e-5
        )

    def test_rate_on_gain_free_compress_raises(self):
        model = CodecModel(CFG.replace(gain_units=0))
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        coder = ChannelCoder(model, v["params"])
        with pytest.raises(ValueError, match="gain units"):
            coder.compress(x, rate=1.0)
