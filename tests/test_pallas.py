"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.layers.pallas_gdn import gdn_fused


def _ref_gdn(x, gamma, beta, inverse):
    norm = jnp.einsum("...i,oi->...o", x * x, gamma) + beta
    return x * jnp.sqrt(norm) if inverse else x / jnp.sqrt(norm)


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_fused_matches_reference(inverse):
    rng = np.random.default_rng(0)
    c = 32
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
    gamma = jnp.asarray(
        (0.1 * np.eye(c) + 0.01 * np.abs(rng.standard_normal((c, c)))).astype(
            np.float32
        )
    )
    beta = jnp.asarray(np.ones(c, np.float32))
    y = gdn_fused(x, gamma, beta, inverse, True)  # interpret=True on CPU
    y_ref = _ref_gdn(x, gamma, beta, inverse)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_fused_vjp_matches_autodiff(inverse):
    rng = np.random.default_rng(1)
    c = 16
    x = jnp.asarray(rng.standard_normal((64, c)).astype(np.float32))
    gamma = jnp.asarray(
        (0.1 * np.eye(c) + 0.01 * np.abs(rng.standard_normal((c, c)))).astype(
            np.float32
        )
    )
    beta = jnp.asarray(np.ones(c, np.float32))
    g = jnp.asarray(rng.standard_normal((64, c)).astype(np.float32))

    def f_fused(x, gamma, beta):
        return gdn_fused(x, gamma, beta, inverse, True)

    def f_ref(x, gamma, beta):
        return _ref_gdn(x, gamma, beta, inverse)

    _, vjp_f = jax.vjp(f_fused, x, gamma, beta)
    _, vjp_r = jax.vjp(f_ref, x, gamma, beta)
    for a, b in zip(vjp_f(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
