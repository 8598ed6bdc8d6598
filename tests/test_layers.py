"""Layer tests: torch-parity for the tricky padding arithmetic, GDN math,
window-attention round-trips, and shape checks mirroring the reference's
smoke ``__main__`` blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.layers import (
    GDN,
    Conv2d,
    ConvTranspose2d,
    SubpelConv2d,
    SWAtten,
    SpatialTransformer,
    WinBasedAttention,
    WinNoShiftAttention,
    WMSA,
    window_partition,
    window_reverse,
)


class TestConvParity:
    def test_down_padding_shape(self):
        """ZeroPad2d((1,2,1,2)) + Conv(5, s2) halves even spatial dims."""
        m = Conv2d(8, kernel_size=5, stride=2, padding=(1, 2, 1, 2))
        x = jnp.zeros((2, 64, 48, 3))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (2, 32, 24, 8)

    def test_down_conv_values_vs_torch(self):
        import torch

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 10, 12, 3)).astype(np.float32)
        w = rng.standard_normal((4, 3, 5, 5)).astype(np.float32) * 0.1
        b = rng.standard_normal((4,)).astype(np.float32)

        xt = torch.tensor(x).permute(0, 3, 1, 2)
        yt = torch.nn.functional.conv2d(
            torch.nn.functional.pad(xt, (1, 2, 1, 2)),
            torch.tensor(w),
            torch.tensor(b),
            stride=2,
        )
        yt = yt.permute(0, 2, 3, 1).numpy()

        m = Conv2d(4, kernel_size=5, stride=2, padding=(1, 2, 1, 2))
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # torch weight (out, in, kh, kw) → flax HWIO (kh, kw, in, out)
        params = {"params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }}
        yj = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yj), yt, rtol=1e-5, atol=1e-5)

    def test_conv_transpose_parity_vs_torch(self):
        """ZeroPad2d((1,0,1,0)) + ConvTranspose2d(5,2,3,op=1): H → 2H, values
        match torch given the documented weight mapping."""
        import torch

        rng = np.random.default_rng(1)
        h, wdt = 9, 7
        cin, cout = 3, 5
        x = rng.standard_normal((2, h, wdt, cin)).astype(np.float32)
        wt = rng.standard_normal((cin, cout, 5, 5)).astype(np.float32) * 0.1
        bt = rng.standard_normal((cout,)).astype(np.float32)

        xt = torch.tensor(x).permute(0, 3, 1, 2)
        xt = torch.nn.functional.pad(xt, (1, 0, 1, 0))
        yt = torch.nn.functional.conv_transpose2d(
            xt, torch.tensor(wt), torch.tensor(bt), stride=2, padding=3,
            output_padding=1,
        )
        yt = yt.permute(0, 2, 3, 1).numpy()
        assert yt.shape == (2, 2 * h, 2 * wdt, cout)

        # our module consumes the already-padded input and needs the
        # kernel mapping kernel[a,b,i,o] = W_t[i,o,4-a,4-b]
        kj = wt.transpose(2, 3, 0, 1)[::-1, ::-1].transpose(0, 1, 2, 3)
        kj = np.ascontiguousarray(np.flip(wt.transpose(2, 3, 0, 1), (0, 1)))
        m = ConvTranspose2d(cout, kernel_size=5, stride=2, padding=3, output_padding=1)
        xp = jnp.pad(jnp.asarray(x), ((0, 0), (1, 0), (1, 0), (0, 0)))
        params = {"params": {"kernel": jnp.asarray(kj), "bias": jnp.asarray(bt)}}
        yj = m.apply(params, xp)
        assert yj.shape == yt.shape
        np.testing.assert_allclose(np.asarray(yj), yt, rtol=1e-5, atol=1e-5)

    def test_subpel_conv_matches_torch_pixelshuffle(self):
        import torch

        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 4, 4, 6)).astype(np.float32)
        w = rng.standard_normal((8 * 4, 6, 3, 3)).astype(np.float32) * 0.1
        b = np.zeros((32,), np.float32)

        xt = torch.tensor(x).permute(0, 3, 1, 2)
        yt = torch.nn.functional.conv2d(xt, torch.tensor(w), torch.tensor(b), padding=1)
        yt = torch.nn.functional.pixel_shuffle(yt, 2).permute(0, 2, 3, 1).numpy()

        m = SubpelConv2d(8, r=2)
        params = {"params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }}
        yj = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yj), yt, rtol=1e-5, atol=1e-5)


class TestIm2colConv:
    """The narrow-input im2col lowering (``conv.py::_conv_im2col``) must be
    numerically identical to XLA's conv for every (k, stride, padding) it
    gates on — it is the default path for RGB entry convs."""

    @pytest.mark.parametrize(
        "cin,k,stride,padding",
        [
            (3, 5, 2, (1, 2, 1, 2)),   # plain g_a layer 0 (model/net.py:97-98)
            (3, 3, 1, 1),              # rich g_a RB convs / HAN first conv
            (3, 3, 2, 1),              # ResidualBlockWithStride entry
            (16, 3, 1, 1),             # syntax-width feature maps
            (3, 7, 1, 3),              # conv7x7 on narrow inputs
        ],
    )
    def test_matches_xla_conv(self, cin, k, stride, padding):
        from lic_tpu.layers.conv import (
            _conv_im2col,
            _use_im2col,
            set_im2col_conv,
        )

        # the lowering is off by default (measured loss vs s2d on v5e —
        # conv.py § narrow-input convs) but must stay exact for experiments
        set_im2col_conv(True)
        try:
            assert _use_im2col(cin, k)
        finally:
            set_im2col_conv(False)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 18, 14, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, k, cin, 32)).astype(np.float32) * 0.1
        )
        from lic_tpu.layers.conv import _norm_padding

        ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=_norm_padding(padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = _conv_im2col(x, w, stride, padding)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_gradients_match_xla(self):
        from lic_tpu.layers.conv import _conv_im2col, _norm_padding

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((1, 12, 10, 3)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((5, 5, 3, 8)).astype(np.float32) * 0.1)

        def loss_im2col(xx, ww):
            return jnp.sum(_conv_im2col(xx, ww, 2, (1, 2, 1, 2)) ** 2)

        def loss_ref(xx, ww):
            y = jax.lax.conv_general_dilated(
                xx, ww, window_strides=(2, 2),
                padding=_norm_padding((1, 2, 1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y ** 2)

        gx1, gw1 = jax.grad(loss_im2col, (0, 1))(x, w)
        gx2, gw2 = jax.grad(loss_ref, (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-5)

    def test_switch_off_restores_xla_path(self):
        from lic_tpu.layers.conv import set_im2col_conv

        m = Conv2d(8, kernel_size=5, stride=2, padding=(1, 2, 1, 2))
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((1, 16, 16, 3)).astype(np.float32)
        )
        params = m.init(jax.random.PRNGKey(0), x)
        y_on = m.apply(params, x)
        try:
            set_im2col_conv(False)
            y_off = m.apply(params, x)
        finally:
            set_im2col_conv(True)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=2e-5, atol=2e-5
        )


class TestTinyConvLowerings:
    """1×1-as-matmul and VPU-stencil lowerings for the tiny-channel convs
    of the rich transforms' entry stack (ResidualBottleneck(3))."""

    @pytest.mark.parametrize(
        "cin,cout,k,stride,padding",
        [
            (3, 1, 1, 1, 0),    # RB(3) squeeze
            (1, 3, 1, 1, 0),    # RB(3) expand
            (3, 192, 1, 2, 0),  # RBS strided skip
            (1, 1, 3, 1, 1),    # RB(3) middle 3x3
            (3, 8, 3, 1, 1),
        ],
    )
    def test_matches_xla(self, cin, cout, k, stride, padding):
        from lic_tpu.layers.conv import set_tiny_conv

        m = Conv2d(cout, kernel_size=k, stride=stride, padding=padding)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, 16, 12, cin)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(params, x)
        try:
            set_tiny_conv(True)
            got = m.apply(params, x)
        finally:
            set_tiny_conv(False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("k,padding", [(5, (1, 2, 1, 2)), (3, 1)])
    def test_narrow_s2d_matches_xla(self, k, padding):
        from lic_tpu.layers.conv import set_narrow_s2d

        m = Conv2d(24, kernel_size=k, stride=2, padding=padding)
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((2, 20, 16, 3)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(params, x)
        try:
            set_narrow_s2d(True)
            got = m.apply(params, x)

            def loss(v):
                return jnp.sum(m.apply(params, v) ** 2)

            g_s2d = jax.grad(loss)(x)
        finally:
            set_narrow_s2d(False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

        def loss_ref(v):
            return jnp.sum(m.apply(params, v) ** 2)

        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(
            np.asarray(g_s2d), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )

    def test_gradients_flow(self):
        from lic_tpu.layers.conv import set_tiny_conv
        from lic_tpu.layers import ResidualBottleneck

        rb = ResidualBottleneck(3)
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
        params = rb.init(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            return jnp.sum(rb.apply(p, xx) ** 2)

        g_ref = jax.grad(loss, 1)(params, x)
        try:
            set_tiny_conv(True)
            g_tiny = jax.grad(loss, 1)(params, x)
        finally:
            set_tiny_conv(False)
        np.testing.assert_allclose(
            np.asarray(g_tiny), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )


class TestGDN:
    def _torch_gdn(self, x, beta_p, gamma_p, inverse):
        """Reference model/gdn.py forward (fp32)."""
        import torch

        ped = np.float32((2.0 ** -18) ** 2)
        beta_bound = np.float32((1e-6 + (2.0 ** -18) ** 2) ** 0.5)
        gamma_bound = np.float32(2.0 ** -18)
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        beta = torch.clamp(torch.tensor(beta_p), min=float(beta_bound)) ** 2 - ped
        gamma = torch.clamp(torch.tensor(gamma_p), min=float(gamma_bound)) ** 2 - ped
        c = x.shape[-1]
        norm = torch.nn.functional.conv2d(xt ** 2, gamma.view(c, c, 1, 1), beta)
        norm = torch.sqrt(norm)
        out = xt * norm if inverse else xt / norm
        return out.permute(0, 2, 3, 1).numpy()

    @pytest.mark.parametrize("inverse", [False, True])
    def test_forward_vs_torch(self, inverse):
        rng = np.random.default_rng(3)
        c = 16
        x = rng.standard_normal((2, 8, 8, c)).astype(np.float32)
        beta_p = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5
        gamma_p = (np.abs(rng.standard_normal((c, c))) * 0.1 + 0.01).astype(np.float32)

        m = GDN(c, inverse=inverse)
        params = {"params": {"beta": jnp.asarray(beta_p), "gamma": jnp.asarray(gamma_p)}}
        yj = m.apply(params, jnp.asarray(x))
        yt = self._torch_gdn(x, beta_p, gamma_p, inverse)
        np.testing.assert_allclose(np.asarray(yj), yt, rtol=2e-5, atol=2e-5)

    def test_identity_at_init_is_stable(self):
        """At init (beta=1, gamma=0.1·I): y = x / sqrt(1 + 0.1 x²)."""
        c = 4
        m = GDN(c)
        x = jnp.ones((1, 2, 2, c), jnp.float32) * 2.0
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        expected = 2.0 / np.sqrt(1.0 + 0.1 * 4.0)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)


class TestWindowAttention:
    def test_partition_reverse_roundtrip(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 7)).astype(np.float32))
        w = window_partition(x, 8)
        assert w.shape == (2 * 2 * 3, 64, 7)
        back = window_reverse(w, 8, 16, 24)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_win_based_attention_smoke(self):
        """Mirrors layers/win_attention.py:211-216 smoke: shape-preserving."""
        m = WinBasedAttention(dim=192, num_heads=8, window_size=4, shift_size=2)
        x = jnp.zeros((2, 8, 8, 192))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape

    def test_shifted_mask_matches_torch_reference(self):
        """The numpy SW-MSA mask equals the reference's torch construction."""
        import torch

        from lic_tpu.layers.win_attention import swin_shift_mask

        h = w = 8
        ws, ss = 4, 2
        img_mask = torch.zeros((1, h, w, 1))
        h_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
        w_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
        cnt = 0
        for hs in h_slices:
            for wsl in w_slices:
                img_mask[:, hs, wsl, :] = cnt
                cnt += 1
        mw = img_mask.view(1, h // ws, ws, w // ws, ws, 1)
        mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
        am = mw.unsqueeze(1) - mw.unsqueeze(2)
        am = am.masked_fill(am != 0, float(-100.0)).masked_fill(am == 0, float(0.0))
        ours = swin_shift_mask(h, w, ws, ss)
        np.testing.assert_array_equal(ours, am.numpy())

    def test_pad_tokens_are_masked_out(self):
        """Non-window-multiple inputs: the layer pads to the window grid but
        pad tokens must be invisible — the output over real tokens equals
        brute-force attention restricted to the real tokens only."""
        from lic_tpu.layers.win_attention import relative_position_index

        ws, c, nh = 4, 8, 2
        hd = c // nh
        m = WinBasedAttention(dim=c, num_heads=nh, window_size=ws, shift_size=0)
        rng = np.random.default_rng(7)
        # single partial window: 3x2 real tokens inside the 4x4 grid
        x = jnp.asarray(rng.standard_normal((1, 3, 2, c)).astype(np.float32))
        params = jax.device_get(m.init(jax.random.PRNGKey(0), x))
        # the residual proj kernel is zero-init — randomize it so the
        # attention branch actually contributes (otherwise the test is vacuous)
        params["params"]["attn"]["proj"]["kernel"] = (
            rng.standard_normal((c, c)).astype(np.float32) * 0.3
        )
        y = np.asarray(m.apply(params, x))[0]

        # ---- brute force over real tokens only ----
        p = params["params"]["attn"]
        tokens = np.asarray(x[0]).reshape(-1, c)          # 6 real tokens
        # window positions of the real tokens in the padded 4x4 canvas
        pos = np.array([i * ws + j for i in range(3) for j in range(2)])
        qkv = tokens @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        qkv = qkv.reshape(-1, 3, nh, hd).transpose(1, 2, 0, 3)  # (3, nh, n, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(0, 2, 1)          # (nh, n, n)
        bias = p["relative_position_bias_table"][
            relative_position_index(ws)[np.ix_(pos, pos)]
        ].transpose(2, 0, 1)
        attn = attn + bias
        attn = np.exp(attn - attn.max(-1, keepdims=True))
        attn = attn / attn.sum(-1, keepdims=True)
        out = (attn @ v).transpose(1, 0, 2).reshape(-1, c)
        out = out @ p["proj"]["kernel"] + p["proj"]["bias"]
        expect = tokens + out
        np.testing.assert_allclose(
            y.reshape(-1, c), expect, rtol=2e-5, atol=2e-5
        )

    def test_sub_window_shifted_shapes(self):
        """Sub-window and non-multiple dims run (padded+masked) for both
        shifted and unshifted blocks and preserve shape."""
        for (h, w), ss in [((2, 2), 0), ((3, 6), 2), ((10, 2), 2)]:
            m = WinBasedAttention(dim=8, num_heads=2, window_size=4, shift_size=ss)
            x = jnp.asarray(
                np.random.default_rng(1)
                .standard_normal((1, h, w, 8))
                .astype(np.float32)
            )
            y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
            assert y.shape == x.shape
            assert np.isfinite(np.asarray(y)).all()

    def test_win_noshift_attention_shape(self):
        m = WinNoShiftAttention(dim=32, num_heads=8, window_size=4, shift_size=2)
        x = jnp.zeros((1, 16, 16, 32))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape


class TestSwin:
    def test_wmsa_shape(self):
        m = WMSA(input_dim=64, output_dim=64, head_dim=16, window_size=4,
                 block_type="SW")
        x = jnp.zeros((2, 16, 16, 64))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape

    def test_wmsa_pad_tokens_invisible(self):
        """Non-multiple widths: a fully-real window's output is unchanged
        by the padded sibling window (W-MSA is window-local + pad-masked)."""
        rng = np.random.default_rng(3)
        m = WMSA(input_dim=16, output_dim=16, head_dim=8, window_size=4,
                 block_type="W")
        x = jnp.asarray(rng.standard_normal((1, 4, 6, 16)).astype(np.float32))
        params = jax.device_get(m.init(jax.random.PRNGKey(0), x))
        params["params"]["linear"]["kernel"] = (
            rng.standard_normal((16, 16)).astype(np.float32) * 0.3
        )
        full = np.asarray(m.apply(params, x))
        left = np.asarray(m.apply(params, x[:, :, :4]))
        np.testing.assert_allclose(full[:, :, :4], left, rtol=1e-5, atol=1e-5)
        assert np.isfinite(full).all()

    def test_wmsa_sub_window_shifted(self):
        """Sub-window latents (the 4x4 latent of a 64px crop vs ws=8) run
        padded+masked through both W and SW blocks."""
        for bt in ("W", "SW"):
            m = WMSA(input_dim=16, output_dim=16, head_dim=8, window_size=8,
                     block_type=bt)
            x = jnp.asarray(
                np.random.default_rng(5)
                .standard_normal((2, 4, 4, 16))
                .astype(np.float32)
            )
            y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
            assert y.shape == x.shape
            assert np.isfinite(np.asarray(y)).all()

    def test_swatten_shape(self):
        # slice 2 of the ChARM loop: input 192 + 2*48 = 288 channels
        m = SWAtten(input_dim=288, output_dim=288, head_dim=16, window_size=8,
                    inter_dim=128)
        x = jnp.zeros((1, 16, 16, 288))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape


class TestSpatialTransformer:
    def test_shape_and_zero_init_identity(self):
        m = SpatialTransformer(in_channels=96, n_heads=8, d_head=12, depth=2)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 96)).astype(np.float32))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape
        # proj_out is zero-initialized → module is the identity at init
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
