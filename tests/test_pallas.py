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


class TestPolyphaseDeconv:
    @pytest.mark.parametrize("case", [
        # (h, w, cin, cout, k, s, p, op) — the codec's deconv configurations
        (9, 7, 3, 5, 5, 2, 3, 1),    # g_s up (pre-padded input)
        (8, 6, 4, 6, 5, 2, 2, 1),    # hyper up
        (4, 4, 2, 3, 3, 2, 1, 1),    # generic 3x3
    ])
    def test_matches_dilated_form(self, case):
        from jax import lax

        from lic_tpu.layers.polyphase import conv_transpose2d_polyphase

        h, w, cin, cout, k, s, p, op = case
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        kern = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
        )
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        ref = lax.conv_general_dilated(
            x, kern, (1, 1), ((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = conv_transpose2d_polyphase(x, kern, s, p, op)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("case", [
        (9, 7, 3, 5, 5, 2, 3, 1),
        (8, 6, 4, 6, 5, 2, 2, 1),
        (4, 4, 2, 3, 3, 2, 1, 1),
    ])
    def test_subpel_matches_dilated_form(self, case):
        """The subpel lowering (one dense conv → s²·C_out + pixel shuffle,
        the default for narrow outputs) is exact."""
        from jax import lax

        from lic_tpu.layers.polyphase import conv_transpose2d_subpel

        h, w, cin, cout, k, s, p, op = case
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        kern = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
        )
        pad_lo, pad_hi = k - 1 - p, k - 1 - p + op
        ref = lax.conv_general_dilated(
            x, kern, (1, 1), ((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = conv_transpose2d_subpel(x, kern, s, p, op)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestPallasConv5s2:
    def test_matches_xla_conv(self):
        from jax import lax

        from lic_tpu.layers.pallas_conv import conv5s2_pallas

        rng = np.random.default_rng(4)
        for shape, co in [((2, 16, 24, 5), 7), ((1, 64, 96, 3), 9)]:
            x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            k = jnp.asarray(
                rng.standard_normal((5, 5, shape[-1], co)).astype(np.float32)
            )
            ref = lax.conv_general_dilated(
                x, k, (2, 2), ((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            got = conv5s2_pallas(x, k, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
            )

    def test_conv2d_pallas_switch_forward_and_grad(self):
        """Conv2d routes wide-channel conv5s2 through the Pallas kernel when
        enabled; forward matches XLA and the custom-VJP backward matches the
        XLA autodiff gradients (trainable path)."""
        from lic_tpu.layers.conv import Conv2d, set_pallas_conv

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)).astype(np.float32))
        m = Conv2d(16, kernel_size=5, stride=2, padding=(1, 2, 1, 2))
        params = m.init(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            return jnp.sum(m.apply(p, xx) ** 2)

        ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        set_pallas_conv(True, interpret=True)
        try:
            got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        finally:
            set_pallas_conv(False)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )

    def test_gradients_match(self):
        from jax import lax

        from lic_tpu.layers.polyphase import conv_transpose2d_polyphase

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)).astype(np.float32))
        kern = jnp.asarray(
            rng.standard_normal((5, 5, 3, 4)).astype(np.float32) * 0.1
        )

        def f_poly(x, k):
            return jnp.sum(conv_transpose2d_polyphase(x, k, 2, 2, 1) ** 2)

        def f_ref(x, k):
            return jnp.sum(
                lax.conv_general_dilated(
                    x, k, (1, 1), ((2, 3), (2, 3)), lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) ** 2
            )

        gp = jax.grad(f_poly, argnums=(0, 1))(x, kern)
        gr = jax.grad(f_ref, argnums=(0, 1))(x, kern)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


class TestPallasWindowAttention:
    """Fused W-MSA kernel (layers/pallas_attn.py) vs the XLA windows path."""

    def _run_module(
        self, h, w, ws, ss, fused, nh=4, c=32, b=2, seed=5, fuse_proj=False
    ):
        from lic_tpu.layers.win_attention import (
            WinBasedAttention,
            set_pallas_attn,
        )

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        m = WinBasedAttention(dim=c, num_heads=nh, window_size=ws, shift_size=ss)
        params = m.init(jax.random.PRNGKey(0), x)
        # zero-init proj would hide attention-core bugs — randomize it
        params = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32) * 0.05
            ),
            params,
        )
        set_pallas_attn(fused, interpret=True, fuse_proj=fuse_proj)
        try:
            return m.apply(params, x), params, m, x
        finally:
            set_pallas_attn(False, fuse_proj=False)

    @pytest.mark.parametrize("fuse_proj", [False, True])
    @pytest.mark.parametrize(
        "h,w,ws,ss",
        [
            (16, 24, 8, 0),   # divisible, no shift (no mask)
            (16, 24, 8, 4),   # divisible, shifted (SW-MSA mask)
            (8, 12, 4, 2),    # small windows, shifted
            (14, 20, 8, 4),   # non-window-multiple (pad mask + shift)
            (12, 20, 8, 0),   # non-window-multiple, no shift (pad mask only)
        ],
    )
    def test_fused_matches_xla_path(self, h, w, ws, ss, fuse_proj):
        ref, params, m, x = self._run_module(h, w, ws, ss, fused=False)
        # the SAME params drive both paths — the fully-fused variant's
        # _DenseParams tree must be interchangeable with nn.Dense's
        got, _, _, _ = self._run_module(
            h, w, ws, ss, fused=True, fuse_proj=fuse_proj
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_fuse_proj_grad_matches_xla_path(self):
        from lic_tpu.layers.win_attention import (
            WinBasedAttention,
            set_pallas_attn,
        )

        rng = np.random.default_rng(17)
        b, h, w, c, nh, ws, ss = 1, 16, 16, 16, 4, 8, 4
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        m = WinBasedAttention(dim=c, num_heads=nh, window_size=ws, shift_size=ss)
        params = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32) * 0.05
            ),
            params,
        )

        def loss(p, xx):
            return jnp.sum(m.apply(p, xx) ** 2)

        ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        set_pallas_attn(True, interpret=True, fuse_proj=True)
        try:
            got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        finally:
            set_pallas_attn(False, fuse_proj=False)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)
        for a, bb in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=3e-4, atol=3e-4
            )

    def test_per_head_softmax_shift_no_underflow(self):
        """A head whose logits sit far below another head's must not NaN:
        the kernel's softmax shift is per-head (a global row max would
        underflow the low head's whole exp segment to 0/0).  Drive it via
        an extreme relative-position bias on head 0 only."""
        from lic_tpu.layers.pallas_attn import (
            _wba_reference,
            window_attention_fused,
        )

        rng = np.random.default_rng(3)
        b, hp, wp, c, nh, ws = 1, 8, 8, 16, 4, 8
        n = ws * ws
        qkv = jnp.asarray(
            rng.standard_normal((b, hp, wp, 3 * c)).astype(np.float32)
        )
        rel = np.zeros((n, nh * n), np.float32)
        rel[:, :n] = 200.0  # head 0 dominates by ~200 nats
        rel = jnp.asarray(rel)
        got = window_attention_fused(
            qkv, rel, None, ws=ws, nh=nh, interpret=True
        )
        assert np.isfinite(np.asarray(got)).all()
        ref = _wba_reference(qkv, rel, None, ws=ws, nh=nh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_grad_matches_xla_path(self):
        from lic_tpu.layers.win_attention import (
            WinBasedAttention,
            set_pallas_attn,
        )

        rng = np.random.default_rng(9)
        b, h, w, c, nh, ws, ss = 1, 16, 16, 16, 4, 8, 4
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        m = WinBasedAttention(dim=c, num_heads=nh, window_size=ws, shift_size=ss)
        params = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32) * 0.05
            ),
            params,
        )

        def loss(p, xx):
            return jnp.sum(m.apply(p, xx) ** 2)

        ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        set_pallas_attn(True, interpret=True)
        try:
            got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        finally:
            set_pallas_attn(False)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)
        for a, bb in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=3e-4, atol=3e-4
            )

    def test_cached_op_reused_across_traces(self):
        """The lru-cached custom_vjp op closes over the static mask; a
        second, separate jit trace hitting the same shape-config key must
        not see the first trace's constants (tracer-leak regression)."""
        from lic_tpu.layers.win_attention import (
            WinBasedAttention,
            set_pallas_attn,
        )

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((1, 16, 24, 32)).astype(np.float32))
        m = WinBasedAttention(dim=32, num_heads=4, window_size=8, shift_size=4)
        params = m.init(jax.random.PRNGKey(0), x)
        set_pallas_attn(True, interpret=True)
        try:
            a = jax.jit(lambda p, xx: m.apply(p, xx))(params, x)
            b = jax.jit(lambda p, xx: m.apply(p, xx) * 1.0)(params, x)
        finally:
            set_pallas_attn(False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestPackedConvS1:
    """K-remainder-packed stride-1 conv (layers/pallas_conv_s1.py)."""

    def test_matches_xla_conv(self):
        from jax import lax

        from lic_tpu.layers.pallas_conv_s1 import convk_s1_pallas

        rng = np.random.default_rng(5)
        for (k, shape, co) in [
            (3, (2, 16, 24, 192), 192),
            (7, (1, 16, 24, 192), 192),
            (3, (2, 8, 16, 160), 192),
            (5, (1, 16, 16, 192), 128),
            (3, (1, 10, 24, 192), 192),   # odd H exercises the th fallback
        ]:
            x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            w = jnp.asarray(
                rng.standard_normal((k, k, shape[-1], co)).astype(np.float32)
                * 0.05
            )
            ref = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            got = convk_s1_pallas(x, w, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
            )

    def test_fused_epilogue(self):
        """bias → leaky_relu → +skip ordering matches the ResidualBlock
        tail (conv, bias, activation, then residual add)."""
        from jax import lax

        from lic_tpu.layers.pallas_conv_s1 import convk_s1_pallas

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 192)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((3, 3, 192, 192)).astype(np.float32) * 0.05
        )
        b = jnp.asarray(rng.standard_normal((192,)).astype(np.float32))
        ref = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        ref = jax.nn.leaky_relu(ref) + x
        got = convk_s1_pallas(
            x, w, b, act="leaky_relu", residual=True, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_conv2d_switch_forward_and_grad(self):
        """Conv2d routes qualifying stride-1 convs through the packed kernel
        when enabled; forward matches XLA and the custom-VJP backward matches
        XLA autodiff (trainable path)."""
        from lic_tpu.layers.conv import Conv2d, set_packed_conv

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 192)).astype(np.float32))
        m = Conv2d(192, kernel_size=3, padding=1)
        params = m.init(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            return jnp.sum(m.apply(p, xx) ** 2)

        ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        set_packed_conv(True, interpret=True)
        try:
            got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        finally:
            set_packed_conv(False)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )

    def test_conv2d_fused_act_forward_and_grad(self):
        """fused_act='leaky_relu' through Conv2d takes the in-kernel
        bias+act epilogue on the packed path; forward + grads must match
        the XLA restatement."""
        from lic_tpu.layers.conv import Conv2d, set_packed_conv

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 192)).astype(np.float32))
        m = Conv2d(192, kernel_size=3, padding=1, fused_act="leaky_relu")
        params = m.init(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            return jnp.sum(m.apply(p, xx) ** 2)

        ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        set_packed_conv(True, interpret=True)
        try:
            got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        finally:
            set_packed_conv(False)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )
