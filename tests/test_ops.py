"""L1 op tests: STE gradients bit-exact vs hand-derived values and vs a
PyTorch re-statement of the reference autograd functions
(``/root/reference/ops/bound_ops.py``, ``ops/ops.py``, ``ops/parametrizers.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.ops import (
    NonNegativeParametrizer,
    bypass_round,
    lower_bound,
    noise_quant,
    quantize_ste_offset,
    ste_round,
    upper_bound,
)


def _torch_lower_bound_grad(x_np, bound, g_np):
    """Reference backward: pass grad iff (x >= bound) | (grad < 0)."""
    import torch

    x = torch.tensor(x_np, requires_grad=True)
    b = torch.tensor(bound)

    class LB(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x, bound):
            ctx.save_for_backward(x, bound)
            return torch.max(x, bound)

        @staticmethod
        def backward(ctx, grad_output):
            x, bound = ctx.saved_tensors
            pass_through = (x >= bound) | (grad_output < 0)
            return pass_through.type(grad_output.dtype) * grad_output, None

    y = LB.apply(x, b)
    y.backward(torch.tensor(g_np))
    return y.detach().numpy(), x.grad.numpy()


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.0, 0.5, 2.0], dtype=jnp.float32)
        np.testing.assert_array_equal(
            lower_bound(x, 0.5), np.array([0.5, 0.5, 0.5, 2.0], np.float32)
        )

    def test_grad_semantics(self):
        # Hand-derived: grad passes iff x >= bound OR upstream grad < 0.
        x = jnp.array([-1.0, -1.0, 2.0, 2.0, 0.5], dtype=jnp.float32)
        g = jnp.array([1.0, -1.0, 1.0, -1.0, 3.0], dtype=jnp.float32)
        _, vjp = jax.vjp(lambda v: lower_bound(v, 0.5), x)
        (gx,) = vjp(g)
        np.testing.assert_array_equal(
            gx, np.array([0.0, -1.0, 1.0, -1.0, 3.0], np.float32)
        )

    def test_bitexact_vs_torch(self):
        rng = np.random.default_rng(0)
        x_np = rng.standard_normal((64, 33)).astype(np.float32)
        g_np = rng.standard_normal((64, 33)).astype(np.float32)
        bound = 0.1
        y_t, gx_t = _torch_lower_bound_grad(x_np, bound, g_np)
        y_j, vjp = jax.vjp(lambda v: lower_bound(v, jnp.float32(bound)), jnp.asarray(x_np))
        (gx_j,) = vjp(jnp.asarray(g_np))
        np.testing.assert_array_equal(np.asarray(y_j), y_t)
        np.testing.assert_array_equal(np.asarray(gx_j), gx_t)

    def test_upper_bound_mirror(self):
        x = jnp.array([-1.0, 2.0, 2.0, -1.0], dtype=jnp.float32)
        g = jnp.array([1.0, 1.0, -1.0, -1.0], dtype=jnp.float32)
        y = upper_bound(x, 0.5)
        np.testing.assert_array_equal(y, np.array([-1.0, 0.5, 0.5, -1.0], np.float32))
        _, vjp = jax.vjp(lambda v: upper_bound(v, 0.5), x)
        (gx,) = vjp(g)
        # pass iff x <= bound or g > 0
        np.testing.assert_array_equal(gx, np.array([1.0, 1.0, 0.0, -1.0], np.float32))


class TestSteRound:
    def test_forward_half_to_even(self):
        x = jnp.array([0.5, 1.5, 2.5, -0.5, -1.5, 1.2], dtype=jnp.float32)
        np.testing.assert_array_equal(
            ste_round(x), np.array([0.0, 2.0, 2.0, -0.0, -2.0, 1.0], np.float32)
        )

    def test_identity_grad(self):
        x = jnp.linspace(-3, 3, 13, dtype=jnp.float32)
        g = jnp.arange(13, dtype=jnp.float32) - 6.0
        _, vjp = jax.vjp(ste_round, x)
        (gx,) = vjp(g)
        np.testing.assert_array_equal(gx, g)

    def test_bitexact_vs_torch(self):
        import torch

        rng = np.random.default_rng(1)
        x_np = rng.standard_normal((128,)).astype(np.float32) * 10
        xt = torch.tensor(x_np, requires_grad=True)
        yt = torch.round(xt) - xt.detach() + xt
        yt.backward(torch.ones_like(xt) * 2.0)
        yj = ste_round(jnp.asarray(x_np))
        np.testing.assert_array_equal(np.asarray(yj), yt.detach().numpy())
        _, vjp = jax.vjp(ste_round, jnp.asarray(x_np))
        (gx,) = vjp(jnp.full((128,), 2.0, jnp.float32))
        np.testing.assert_array_equal(np.asarray(gx), xt.grad.numpy())

    def test_bypass_round_alias(self):
        x = jnp.array([1.4, -2.6], dtype=jnp.float32)
        np.testing.assert_array_equal(bypass_round(x), ste_round(x))

    def test_quantize_ste_offset(self):
        x = jnp.array([1.3, -0.2], dtype=jnp.float32)
        off = jnp.array([0.25, 0.25], dtype=jnp.float32)
        # round(x - off) + off
        np.testing.assert_allclose(
            quantize_ste_offset(x, off), np.array([1.25, 0.25], np.float32)
        )


class TestNonNegativeParametrizer:
    def test_roundtrip_matches_reference(self):
        # Mirrors ops/parametrizers.py __main__ smoke: init then apply eye*0.1.
        p = NonNegativeParametrizer()
        gamma = 0.1 * jnp.eye(5, dtype=jnp.float32)
        stored = p.init(gamma)
        out = p(stored)
        np.testing.assert_allclose(np.asarray(out), np.asarray(gamma), atol=1e-9)

    def test_bitexact_vs_torch(self):
        import torch

        rng = np.random.default_rng(2)
        x_np = np.abs(rng.standard_normal((32, 32))).astype(np.float32)

        ped = (2.0 ** -18) ** 2
        bound = (0.0 + (2.0 ** -18) ** 2) ** 0.5
        stored_np = np.sqrt(
            np.maximum(x_np + np.float32(ped), np.float32(ped))
        ).astype(np.float32)
        xt = torch.tensor(stored_np, requires_grad=True)

        class LB(torch.autograd.Function):
            @staticmethod
            def forward(ctx, x, bound):
                ctx.save_for_backward(x, bound)
                return torch.max(x, bound)

            @staticmethod
            def backward(ctx, grad_output):
                x, bound = ctx.saved_tensors
                pt = (x >= bound) | (grad_output < 0)
                return pt.type(grad_output.dtype) * grad_output, None

        yt = LB.apply(xt, torch.tensor(bound)) ** 2 - ped
        gup = torch.ones_like(yt)
        yt.backward(gup)

        p = NonNegativeParametrizer()
        stored = p.init(jnp.asarray(x_np))
        # init may differ by 1 ulp (XLA sqrt vs numpy sqrt rounding); the
        # bit-exactness requirement applies to forward/grad from identical
        # stored parameters, checked below.
        np.testing.assert_allclose(
            np.asarray(stored), xt.detach().numpy(), rtol=3e-7, atol=0
        )
        yj, vjp = jax.vjp(p, jnp.asarray(stored_np))
        np.testing.assert_array_equal(np.asarray(yj), yt.detach().numpy())
        (gj,) = vjp(jnp.ones_like(yj))
        np.testing.assert_array_equal(np.asarray(gj), xt.grad.numpy())


class TestNoiseQuant:
    def test_eval_mode(self):
        x = jnp.array([0.4, 0.6, -0.5, 200.0, -200.0], dtype=jnp.float32)
        y = noise_quant(x, training=False, table_range=128)
        # floor(x + 0.5), clamped to [-128, 127]
        np.testing.assert_array_equal(
            y, np.array([0.0, 1.0, 0.0, 127.0, -128.0], np.float32)
        )

    def test_train_mode_bounded_noise(self):
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1000,), jnp.float32)
        y = noise_quant(x, key=key, training=True)
        assert float(jnp.max(jnp.abs(y))) <= 0.5

    def test_train_mode_requires_key(self):
        with pytest.raises(ValueError):
            noise_quant(jnp.zeros((2,)), training=True)
