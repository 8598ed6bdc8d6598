"""Entropy-model tests: likelihoods vs closed-form Gaussian integrals and a
torch restatement of the CompressAI formulas; factorized-prior sanity."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from lic_tpu.entropy import EntropyBottleneck, GaussianConditional, GaussianModel


class TestGaussianModel:
    def test_matches_closed_form(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 8, 8, 3)).astype(np.float32) * 3
        mu = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        sigma = (np.abs(rng.standard_normal((4, 8, 8, 3))) + 0.2).astype(np.float32)

        gm = GaussianModel()
        lik = np.asarray(gm(jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(mu)))
        expected = stats.norm.cdf((x - mu + 0.5) / sigma) - stats.norm.cdf(
            (x - mu - 0.5) / sigma
        )
        expected = np.maximum(expected, 1e-8)
        np.testing.assert_allclose(lik, expected, rtol=1e-4, atol=1e-6)

    def test_likelihood_bound(self):
        gm = GaussianModel(likelihood_bound=1e-8)
        # far tail → clamped
        lik = gm(jnp.asarray([100.0]), jnp.asarray([0.3]), jnp.asarray([0.0]))
        np.testing.assert_allclose(np.asarray(lik), 1e-8)


class TestGaussianConditional:
    def test_likelihood_matches_compressai_formula(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((256,)).astype(np.float32) * 4
        scales = (np.abs(rng.standard_normal((256,))) * 2 + 0.01).astype(np.float32)
        means = rng.standard_normal((256,)).astype(np.float32)

        gc = GaussianConditional()
        lik = np.asarray(gc.likelihood(jnp.asarray(x), jnp.asarray(scales), jnp.asarray(means)))

        s = np.maximum(scales, 0.11)
        v = np.abs(x - means)
        expected = 0.5 * (
            stats.norm.sf(-(0.5 - v) / s) - stats.norm.sf(-(-0.5 - v) / s)
        ) * 2  # 0.5*erfc(-u/sqrt2) = sf(-u)
        expected = stats.norm.cdf((0.5 - v) / s) - stats.norm.cdf((-0.5 - v) / s)
        np.testing.assert_allclose(lik, expected, rtol=1e-4, atol=1e-7)

    def test_eval_quantize_mean_offset(self):
        gc = GaussianConditional()
        x = jnp.asarray([1.3, -0.6], jnp.float32)
        means = jnp.asarray([0.25, 0.25], jnp.float32)
        out = gc.quantize(x, "dequantize", means)
        np.testing.assert_allclose(np.asarray(out), [1.25, -0.75])

    def test_call_train_vs_eval(self):
        gc = GaussianConditional()
        key = jax.random.PRNGKey(0)
        x = jnp.ones((16,)) * 0.7
        scales = jnp.ones((16,)) * 0.5
        means = jnp.zeros((16,))
        out_t, lik_t = gc(x, scales, means, training=True, key=key)
        assert float(jnp.max(jnp.abs(out_t - x))) <= 0.5
        out_e, lik_e = gc(x, scales, means, training=False)
        np.testing.assert_allclose(np.asarray(out_e), 1.0)
        assert lik_e.shape == x.shape

    def test_scale_lower_bound_grad_is_ste(self):
        gc = GaussianConditional()

        def f(s):
            return jnp.sum(gc.likelihood(jnp.asarray([0.2]), s, jnp.asarray([0.0])))

        g = jax.grad(f)(jnp.asarray([0.05]))  # below bound
        # gradient should be zero or pass-through per STE rule; at least finite
        assert np.isfinite(np.asarray(g)).all()


class TestEntropyBottleneck:
    def _make(self, c=8):
        eb = EntropyBottleneck(channels=c)
        x = jnp.zeros((2, 4, 4, c))
        params = eb.init(jax.random.PRNGKey(0), x, training=False)
        return eb, params

    def test_shapes_and_modes(self):
        eb, params = self._make()
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32) * 3)
        out_e, lik_e = eb.apply(params, x, training=False)
        assert out_e.shape == x.shape and lik_e.shape == x.shape
        # eval outputs are medians-offset integers
        med = np.asarray(eb.apply(params, method=lambda m: m.medians))
        resid = np.asarray(out_e) - med[None, None, None, :]
        np.testing.assert_allclose(resid, np.round(resid), atol=1e-5)

        out_t, lik_t = eb.apply(
            params, x, training=True, key=jax.random.PRNGKey(1)
        )
        assert float(jnp.max(jnp.abs(out_t - x))) <= 0.5
        assert float(jnp.min(lik_t)) >= 1e-9

    def test_pmf_normalizes(self):
        eb, params = self._make(c=4)
        pmf = np.asarray(
            eb.apply(params, -200, 200, method=lambda m, a, b: m.pmf_table(a, b))
        )
        assert pmf.shape == (4, 401)
        totals = pmf.sum(axis=1)
        # init_scale=10 → heavy tails at init; bulk of mass inside ±200
        np.testing.assert_allclose(totals, 1.0, atol=5e-3)

    def test_aux_loss_finite_and_positive(self):
        eb, params = self._make()
        aux = eb.apply(params, method=lambda m: m.aux_loss())
        assert float(aux) > 0 and np.isfinite(float(aux))

    def test_likelihood_trains_toward_data(self):
        """A few SGD steps on -log p should increase data likelihood."""
        import optax

        eb = EntropyBottleneck(channels=2)
        rng = np.random.default_rng(3)
        data = jnp.asarray(rng.standard_normal((64, 1, 1, 2)).astype(np.float32) * 2)
        params = eb.init(jax.random.PRNGKey(0), data, training=False)

        def loss_fn(p, key):
            _, lik = eb.apply(p, data, training=True, key=key)
            return -jnp.mean(jnp.log2(lik))

        opt = optax.adam(1e-2)

        @jax.jit
        def step(p, state, key):
            key, sub = jax.random.split(key)
            loss, g = jax.value_and_grad(loss_fn)(p, sub)
            updates, state = opt.update(g, state)
            return optax.apply_updates(p, updates), state, key, loss

        state = opt.init(params)
        key = jax.random.PRNGKey(42)
        p = params
        losses = []
        for i in range(50):
            p, state, key, loss = step(p, state, key)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
