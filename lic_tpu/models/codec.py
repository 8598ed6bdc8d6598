"""The codec core: one configurable model covering both reference families.

* ``family='neural_syntax'`` — the hyperprior + spatial-context + neural-
  syntax model (``model/net.py:429-874``): latent split into content /
  syntax streams, ``PredictionModel_Context`` over causal patches for the
  content, pooled hyper prediction for the syntax, per-image generated
  decoder conv.
* ``family='charm'`` — the channel-conditional slice models
  (``source_net[_WAM]``, ``net_ga``, ``net_ha``, ``net_unet_ha_hs[_1]``,
  ``Net_unet[_1|_005_5]``): 4-slice conditional entropy coding with
  optional SWAtten and LRP, pluggable hyper paths, syntax decoder tail.

TPU design notes
----------------
- The 4-slice chain is sequential by construction (slice i conditions on
  decoded slices < i).  It stays a statically-unrolled 4-step loop — four
  fat NHWC convs, each MXU-bound; no dynamic shapes.
- The hyper decoder runs ONCE with two heads where the reference ran the
  same module twice (``net_unet_ha_hs.py:892-895``).
- Noise quantization threads explicit PRNG (flax 'noise' rng stream).
- bpp counts hyper bits by default (the reference's ChARM train bpp
  forgot them — defect §8.7; set ``count_hyper_bpp=False`` for strict
  reference-parity numbers).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import CodecConfig
from ..entropy import EntropyBottleneck, GaussianConditional, GaussianModel
from ..entropy.context import PredictionModelContext
from ..layers import Conv2d
from ..layers.blocks import gelu
from ..layers.swin import SWAtten
from ..ops import bypass_round, quantize_ste_offset, ste_round
from .han import HANHead, mean_shift
from .hyper import (
    ClassicHyperAnalysis,
    ClassicHyperSynthesis,
    DecodableUnetHyperSynthesis,
    ElicHyperAnalysis,
    ElicHyperSynthesis,
    LatentUnet,
    UnetHyperAnalysis,
    UnetHyperSynthesis,
)
from .syntax import ConvGenerator, PredictionModelSyntax, SyntaxModel, batch_conv
from .transforms import AnalysisTransform, SynthesisTransform


class CodecOutput(NamedTuple):
    x_tilde: jax.Array          # reconstruction in [-1, 1] domain
    bpp: jax.Array              # total estimated bits-per-pixel (scalar)
    mse: jax.Array              # mean squared error in the [-1, 1] domain
    bpp_y: jax.Array
    bpp_z: jax.Array
    bpp_syntax: jax.Array
    extras: Dict[str, jax.Array]


def _bpp(likelihood: jax.Array, num_pixels) -> jax.Array:
    """Σ log p / (−log 2 · num_pixels) — reference bpp accounting
    (``model/net.py:831-834``)."""
    return jnp.sum(jnp.log(likelihood)) / (-np.log(2.0) * num_pixels)


class _CharmSliceStack(nn.Module):
    """cc_mean/cc_scale/lrp conv stack: conv3→GELU→conv3→GELU→conv3
    (``net_unet_ha_hs.py:756-764``)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(224, kernel_size=3, padding=1, name="c0")(x)
        x = gelu(x)
        x = Conv2d(128, kernel_size=3, padding=1, name="c1")(x)
        x = gelu(x)
        return Conv2d(self.out_channels, kernel_size=3, padding=1, name="c2")(x)


class CodecModel(nn.Module):
    cfg: CodecConfig

    def setup(self):
        cfg = self.cfg
        N, M = cfg.N, cfg.M

        # 'rbs' is a g_s-only family (synthesisTransformModel_RBS,
        # Net_unet.py:371-419); the analysis side stays 'rich'.
        ga_variant = "rich" if cfg.transform == "rbs" else cfg.transform
        self.g_a = AnalysisTransform(N, ga_variant)
        gs_out = M if (cfg.syntax != "none" and cfg.syntax_decoder) else 3
        self.g_s = SynthesisTransform(N, gs_out, cfg.transform)

        # ---- syntax machinery ----
        if cfg.syntax != "none":
            self.syntax_model = SyntaxModel(M, M, cfg.syntax)
            if cfg.syntax_decoder:
                self.conv_weights_gen = ConvGenerator(M, M)
            # PredictionModel_Syntax codes the syntax stream.  Only the
            # neural_syntax forward consumes it; the reference's ChARM
            # nets construct it equally unused (SURVEY §2.4) and never
            # entropy-code their syntax vector — our real streams pack it
            # as raw i16 header bytes (~32 B/image, uncounted in bpp,
            # matching the reference's accounting).  Kept for charm too:
            # dropping the subtree would break strict checkpoint loads
            # and depart from the reference's parameter surface.
            if cfg.code_syntax:
                self.prediction_model_syntax = PredictionModelSyntax(
                    dim=M, outdim=2 * M,
                    variant="wam" if cfg.syntax == "wam" else "basic",
                )

        # ---- hyper path ----
        if cfg.family == "neural_syntax":
            self.ha_model = ClassicHyperAnalysis(N)
            self.hs_model = ClassicHyperSynthesis(N)
            self.z2_sigma = self.param(
                "z2_sigma", lambda k: jnp.ones((1, 1, 1, N), jnp.float32)
            )
            self.prediction_model = PredictionModelContext(
                dim=N, outdim=2 * (N - M)
            )
            self.gm_z2 = GaussianModel(1e-8)
            self.gm_content = GaussianModel(1e-8)
            self.gm_syntax = GaussianModel(1e-8)
        else:
            hyper = cfg.hyper
            if hyper == "classic_dual":
                self.h_a = ClassicHyperAnalysis(N)
                self.h_mean_s = ClassicHyperSynthesis(N)
                self.h_scale_s = ClassicHyperSynthesis(N)
                self.entropy_bottleneck = EntropyBottleneck(N)
            elif hyper == "elic":
                self.h_a = ElicHyperAnalysis()
                self.h_mean_s = ElicHyperSynthesis(N)
                self.h_scale_s = ElicHyperSynthesis(N)
                self.entropy_bottleneck = EntropyBottleneck(192)
            elif hyper == "unet":
                self.h_a = UnetHyperAnalysis(N)
                if cfg.shared_hyper_decoder:
                    self.h_s = UnetHyperSynthesis(N, two_heads=True)
                else:
                    self.h_s_scale = UnetHyperSynthesis(N)
                    self.h_s_means = UnetHyperSynthesis(N)
                self.entropy_bottleneck = EntropyBottleneck(512)
            elif hyper == "unet_dec":
                # decodable U-Net hyper: skips re-synthesized from ẑ only
                self.h_a = UnetHyperAnalysis(N)
                if cfg.shared_hyper_decoder:
                    self.h_s = DecodableUnetHyperSynthesis(N, two_heads=True)
                else:
                    self.h_s_scale = DecodableUnetHyperSynthesis(N)
                    self.h_s_means = DecodableUnetHyperSynthesis(N)
                self.entropy_bottleneck = EntropyBottleneck(512)
            elif hyper == "latent_unet":
                self.unet = LatentUnet(
                    N, N,
                    variant="res" if cfg.unet_variant != "conv1x1" else "conv1x1",
                    two_heads=cfg.shared_hyper_decoder,
                )
                if not cfg.shared_hyper_decoder:
                    self.unet_b = LatentUnet(
                        N, N,
                        variant="res" if cfg.unet_variant != "conv1x1" else "conv1x1",
                    )
            else:
                raise ValueError(f"unknown charm hyper: {hyper}")

            self.gaussian_conditional = GaussianConditional()
            if cfg.context == "entroformer":
                from ..layers.entroformer import (
                    EntroformerConfig,
                    EntroformerContext,
                )

                ed = cfg.entro_dim_mult * N
                self.entro_context = EntroformerContext(
                    latent_channels=N,
                    mode="checkerboard",
                    cfg=EntroformerConfig(
                        dim=ed,
                        num_layers=cfg.entro_layers,
                        num_heads=cfg.entro_heads,
                        dim_head=ed // cfg.entro_heads,
                        attn_topk=cfg.entro_topk,
                    ),
                )
            ns = cfg.num_slices
            slice_ch = N // ns
            # support width for slice i: max_support_slices < 0 means ALL
            # previous slices (the slice-loop convention) — a bare
            # min(i, -1) would be -1 and silently shrink every SWAtten
            n_sup = lambda i: (
                i if cfg.max_support_slices < 0
                else min(i, cfg.max_support_slices)
            )
            if cfg.context == "entroformer":
                pass  # slice machinery unused
            elif cfg.swatten:
                self.atten_mean = [
                    SWAtten(
                        N + slice_ch * n_sup(i),
                        N + slice_ch * n_sup(i),
                        head_dim=16, window_size=cfg.swatten_window,
                        inter_dim=128,
                    )
                    for i in range(ns)
                ]
                self.atten_scale = [
                    SWAtten(
                        N + slice_ch * n_sup(i),
                        N + slice_ch * n_sup(i),
                        head_dim=16, window_size=cfg.swatten_window,
                        inter_dim=128,
                    )
                    for i in range(ns)
                ]
            if cfg.context != "entroformer":
                self.cc_mean_transforms = [
                    _CharmSliceStack(slice_ch) for _ in range(ns)
                ]
                self.cc_scale_transforms = [
                    _CharmSliceStack(slice_ch) for _ in range(ns)
                ]
                if cfg.lrp:
                    self.lrp_transforms = [
                        _CharmSliceStack(slice_ch) for _ in range(ns)
                    ]

        # ---- post-processing ----
        if cfg.post_processing:
            if cfg.syntax == "none":
                raise ValueError(
                    "post_processing=True needs a syntax stream: the HAN "
                    "tail's second generated conv consumes the syntax "
                    "vector (model/net.py:813-817)"
                )
            self.han = HANHead(is_high=cfg.is_high)
            self.conv_weights_gen_han = ConvGenerator(M, 64)

        # ---- variable-rate gain units (beyond reference) ----
        # K learned per-channel (gain, inverse-gain) pairs scale the latent
        # before quantization / after dequantization; parameters live in
        # log space so continuous rates are LINEAR interpolation here ==
        # exponential interpolation of the gains (Cui et al.).  Init is a
        # log-spaced amplitude ramp (unit K-1 = gain_span x unit 0), so
        # bpp is monotone in the rate index from step 0.
        if cfg.gain_units:
            if cfg.family != "charm" or cfg.context == "entroformer":
                raise ValueError(
                    "gain_units currently supports the charm slice family"
                )
            K = cfg.gain_units
            span = float(np.log(cfg.gain_span))
            ramp_1d = (
                np.zeros(1, np.float32)  # K=1: neutral gain, not span^-1/2
                if K == 1
                else np.linspace(-span / 2, span / 2, K, dtype=np.float32)
            )
            ramp = np.broadcast_to(ramp_1d[:, None], (K, cfg.N)).copy()
            self.log_gain = self.param(
                "log_gain", lambda _k: jnp.asarray(ramp)
            )
            self.log_inv_gain = self.param(
                "log_inv_gain", lambda _k: jnp.asarray(-ramp)
            )

    # ------------------------------------------------------------------

    def _noise_key(self):
        return self.make_rng("noise")

    def _gain_vectors(self, rate) -> Tuple[jax.Array, jax.Array]:
        """(gain, inverse_gain) for a continuous rate index in [0, K−1].
        Linear interpolation of the log-gain rows == exponential
        interpolation of the gains; integer rates hit the learned rows
        exactly.  A scalar rate returns (N,) vectors; a (B,) rate vector
        returns (B, 1, 1, N) — per-image operating points in one batch."""
        K = self.cfg.gain_units
        r = jnp.clip(jnp.asarray(rate, jnp.float32), 0.0, float(K - 1))
        lo = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, K - 1)
        hi = jnp.minimum(lo + 1, K - 1)
        a = r[..., None] - lo[..., None].astype(jnp.float32)
        g = jnp.exp((1 - a) * self.log_gain[lo] + a * self.log_gain[hi])
        ig = jnp.exp(
            (1 - a) * self.log_inv_gain[lo] + a * self.log_inv_gain[hi]
        )
        if r.ndim:  # (B,) → broadcast over NHWC
            g = g[:, None, None, :]
            ig = ig[:, None, None, :]
        return g, ig

    def _decode_tail(
        self,
        x_tilde,
        syntax_rounded,
        use_post_processing=True,
        stop_base_grad=False,
    ):
        """g_s output → RGB via the per-image generated conv (+ optional
        tanh + HAN post-processing).

        ``use_post_processing=False`` skips the HAN tail even when the
        model carries one — the reference's content-adaptive tuning loop
        sets ``net.post_processing = False`` for the duration of the
        per-image encoder overfit (``eval_net.py:171``).

        ``stop_base_grad=True`` cuts the gradient at the HAN input (the
        two-phase HAN-only training, ``train_net_unet.py:125-134``): with
        every base parameter frozen, torch autograd prunes the backward
        below the HAN tail's inputs; under ``jax.grad`` the equivalent is
        an explicit ``stop_gradient``, which also frees the entire
        encoder/decoder/entropy backward's activation memory."""
        cfg = self.cfg
        if cfg.syntax != "none" and cfg.syntax_decoder:
            w = self.conv_weights_gen(syntax_rounded)
            x_bf = batch_conv(w, x_tilde)
            if cfg.tanh_after_syntax:
                x_bf = jnp.tanh(x_bf)
        else:
            x_bf = x_tilde
        if stop_base_grad:
            x_bf = jax.lax.stop_gradient(x_bf)
            syntax_rounded = jax.lax.stop_gradient(syntax_rounded)
        if cfg.post_processing and use_post_processing:
            feats = self.han(x_bf)
            w2 = self.conv_weights_gen_han(syntax_rounded)
            out = batch_conv(w2, feats)
            out = mean_shift(out, sign=1)
            return out
        return x_bf

    # ------------------------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        training: bool = True,
        use_post_processing: bool = True,
        rate=None,
        stop_base_grad: bool = False,
    ) -> CodecOutput:
        """``rate``: continuous gain-unit index in [0, K−1]; only meaningful
        when ``cfg.gain_units`` > 0 (None → index 0).
        ``stop_base_grad``: see :meth:`_decode_tail` (phase-2 HAN-only
        training)."""
        if self.cfg.family == "neural_syntax":
            return self._forward_neural_syntax(
                x, training, use_post_processing, stop_base_grad
            )
        return self._forward_charm(
            x, training, use_post_processing, rate, stop_base_grad
        )

    # ---------------------------------------------- neural syntax family

    def _forward_neural_syntax(
        self, x, training, use_post_processing=True, stop_base_grad=False
    ):
        cfg = self.cfg
        N, M = cfg.N, cfg.M
        b, h, w, _ = x.shape
        num_pixels = b * h * w

        z3 = self.g_a(x)
        z2 = self.ha_model(z3)
        z2_rounded = bypass_round(z2)
        h2 = self.hs_model(z2_rounded)

        syntax = self.syntax_model(z3[..., :M])          # (B,1,1,M)
        syntax_rounded = bypass_round(syntax)
        content = z3[..., M:]
        content_rounded = bypass_round(content)

        if training:
            key = self._noise_key()
            k1, k2, k3 = jax.random.split(key, 3)
            z2_in = z2 + jax.random.uniform(k1, z2.shape, z2.dtype, -0.5, 0.5)
            content_in = content + jax.random.uniform(
                k2, content.shape, content.dtype, -0.5, 0.5
            )
            syntax_in = syntax + jax.random.uniform(
                k3, syntax.shape, syntax.dtype, -0.5, 0.5
            )
        else:
            z2_in, content_in, syntax_in = z2_rounded, content_rounded, syntax_rounded

        # |σ| with a floor (departure from the reference's raw signed
        # parameter, net.py:706): a channel driven through σ=0 would go
        # negative — upper < lower, likelihood pinned at the 1e-8 clip
        # whose gradient is zero (permanently stuck) — and the wavefront
        # coder already builds its pmf from |σ| (ns_z2_sigma), so this
        # keeps the train-time rate estimate consistent with coded bits.
        z2_scale = jnp.maximum(jnp.abs(self.z2_sigma), 1e-4)
        z2_lik = self.gm_z2(z2_in, z2_scale, jnp.zeros_like(z2_scale))

        mu_c, sigma_c = self.prediction_model(content_rounded, h2, masked=True)
        content_lik = self.gm_content(content_in, sigma_c, mu_c)

        # intended semantics (σ = exp head), not the reference's swapped
        # unpack (defect §8.10)
        mu_s, sigma_s = self.prediction_model_syntax(h2)
        syntax_lik = self.gm_syntax(syntax_in, sigma_s, mu_s)

        x_tilde = self.g_s(content_rounded)
        x_tilde = self._decode_tail(
            x_tilde, syntax_rounded, use_post_processing, stop_base_grad
        )

        bpp_z = _bpp(z2_lik, num_pixels)
        bpp_y = _bpp(content_lik, num_pixels)
        bpp_s = _bpp(syntax_lik, num_pixels)
        bpp = bpp_z + bpp_y + bpp_s
        mse = jnp.mean((x_tilde - x) ** 2)

        return CodecOutput(
            x_tilde=x_tilde, bpp=bpp, mse=mse,
            bpp_y=bpp_y, bpp_z=bpp_z, bpp_syntax=bpp_s,
            extras={
                "y_hat": content_rounded,
                "syntax": syntax_rounded,
                "content_mu": mu_c,
                "content_sigma": sigma_c,
            },
        )

    # ------------------------------------------------------- charm family

    def _hyper_forward(self, z3, training):
        """Run the configured hyper path.

        Returns (latent_scales, latent_means, z_likelihood | None, z_hat | None).
        """
        cfg = self.cfg
        if cfg.hyper == "latent_unet":
            # conditions on the UNQUANTIZED latent; nothing is coded
            # (Net_unet.py:1014-1015 — kept as-is, flagged non-coded)
            if cfg.shared_hyper_decoder:
                scales, means = self.unet(z3)
            else:
                scales = self.unet(z3)
                means = self.unet_b(z3)
            return scales, means, None, None

        if cfg.hyper in ("unet", "unet_dec"):
            z, middle, skip1, inp = self.h_a(z3)
        else:
            z = self.h_a(z3)

        key = self._noise_key() if training else None
        _, z_lik = self.entropy_bottleneck(z, training=training, key=key)
        medians = self.entropy_bottleneck.medians  # (C,)
        z_hat = quantize_ste_offset(z, medians[None, None, None, :])

        if cfg.hyper == "unet":
            if cfg.shared_hyper_decoder:
                scales, means = self.h_s(z_hat, middle, skip1, inp)
            else:
                scales = self.h_s_scale(z_hat, middle, skip1, inp)
                means = self.h_s_means(z_hat, middle, skip1, inp)
        elif cfg.hyper == "unet_dec":
            # encoder-side skips are NOT consumed — ẑ is the whole message
            if cfg.shared_hyper_decoder:
                scales, means = self.h_s(z_hat)
            else:
                scales = self.h_s_scale(z_hat)
                means = self.h_s_means(z_hat)
        else:
            scales = self.h_scale_s(z_hat)
            means = self.h_mean_s(z_hat)
        return scales, means, z_lik, z_hat

    def _forward_charm(
        self,
        x,
        training,
        use_post_processing=True,
        rate=None,
        stop_base_grad=False,
    ):
        cfg = self.cfg
        N, M = cfg.N, cfg.M
        b, h, w, _ = x.shape
        num_pixels = b * h * w

        z3 = self.g_a(x)
        inv_gain = None
        if cfg.gain_units:
            g, inv_gain = self._gain_vectors(0.0 if rate is None else rate)
            z3 = z3 * g  # everything downstream codes the gained latent
        yh, yw = z3.shape[1], z3.shape[2]

        latent_scales, latent_means, z_lik, _ = self._hyper_forward(z3, training)

        if cfg.syntax != "none":
            syntax = self.syntax_model(z3[..., :M])
            syntax_rounded = bypass_round(syntax)
        else:
            syntax_rounded = None

        if cfg.context == "entroformer":
            return self._entroformer_entropy(
                x, z3, latent_scales, latent_means, z_lik, syntax_rounded,
                training, num_pixels, use_post_processing,
            )

        ns = cfg.num_slices
        y_slices = jnp.split(z3, ns, axis=-1)
        y_hat_slices = []
        y_liks = []
        mus, sigmas = [], []
        for i, y_slice in enumerate(y_slices):
            support = (
                y_hat_slices
                if cfg.max_support_slices < 0
                else y_hat_slices[: cfg.max_support_slices]
            )
            mean_support = jnp.concatenate([latent_means] + support, axis=-1)
            if cfg.swatten:
                mean_support = self.atten_mean[i](mean_support)
            mu = self.cc_mean_transforms[i](mean_support)[:, :yh, :yw, :]

            scale_support = jnp.concatenate([latent_scales] + support, axis=-1)
            if cfg.swatten:
                scale_support = self.atten_scale[i](scale_support)
            scale = self.cc_scale_transforms[i](scale_support)[:, :yh, :yw, :]

            key = self._noise_key() if training else None
            _, y_lik = self.gaussian_conditional(
                y_slice, scale, mu, training=training, key=key
            )
            y_liks.append(y_lik)
            mus.append(mu)
            sigmas.append(scale)

            y_hat_slice = ste_round(y_slice - mu) + mu
            if cfg.lrp:
                lrp_in = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
                lrp = 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_in))
                y_hat_slice = y_hat_slice + lrp
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        y_likelihoods = jnp.concatenate(y_liks, axis=-1)

        x_tilde = self.g_s(y_hat * inv_gain if inv_gain is not None else y_hat)
        x_tilde = self._decode_tail(
            x_tilde, syntax_rounded, use_post_processing, stop_base_grad
        )

        bpp_y = _bpp(y_likelihoods, num_pixels)
        if z_lik is not None and cfg.count_hyper_bpp:
            bpp_z = _bpp(z_lik, num_pixels)
        else:
            bpp_z = jnp.zeros(())
        bpp = bpp_y + bpp_z
        mse = jnp.mean((x_tilde - x) ** 2)

        return CodecOutput(
            x_tilde=x_tilde, bpp=bpp, mse=mse,
            bpp_y=bpp_y, bpp_z=bpp_z, bpp_syntax=jnp.zeros(()),
            extras={
                "y_hat": y_hat,
                "means": jnp.concatenate(mus, axis=-1),
                "scales": jnp.concatenate(sigmas, axis=-1),
            },
        )

    # ------------------------------------------------ bitstream sub-passes
    #
    # Piecewise entry points for the real encode/decode pipeline
    # (lic_tpu.models.compress).  Only hyper paths whose decoder consumes
    # nothing but coded data are decodable: 'classic_dual', 'elic' and
    # 'unet_dec' (the skip pyramid re-synthesized from coded z_hat).
    # The reference's U-Net hyper feeds *encoder-side activations* —
    # including z3 itself — into its decoder as skip tensors
    # (net_unet_ha_hs.py:880,892), and the latent U-Net conditions on the
    # unquantized latent (Net_unet.py:1014), so neither defines a decodable
    # bitstream as designed; compress.py rejects them.

    def analyze(self, x, rate=None):
        """Encoder transform: x → z3 (gained when the model carries gain
        units — the coded latent IS the gained latent, so every downstream
        sub-pass stays rate-agnostic except ``synthesize``)."""
        z3 = self.g_a(x)
        if self.cfg.gain_units:
            g, _ = self._gain_vectors(0.0 if rate is None else rate)
            z3 = z3 * g
        return z3

    def hyper_encode(self, z3):
        z = self.h_a(z3)
        if self.cfg.hyper in ("unet", "unet_dec"):
            z = z[0]
        return z

    def eb_medians(self):
        return self.entropy_bottleneck.medians

    def eb_pmf_table(self, min_sym: int, max_sym: int):
        return self.entropy_bottleneck.pmf_table(min_sym, max_sym)

    def hyper_decode(self, z_hat):
        """z_hat → (latent_scales, latent_means) — decodable hypers only."""
        assert self.cfg.hyper in ("classic_dual", "elic", "unet_dec")
        if self.cfg.hyper == "unet_dec":
            if self.cfg.shared_hyper_decoder:
                return self.h_s(z_hat)
            return self.h_s_scale(z_hat), self.h_s_means(z_hat)
        return self.h_scale_s(z_hat), self.h_mean_s(z_hat)

    def syntax_from_latent(self, z3):
        return bypass_round(self.syntax_model(z3[..., : self.cfg.M]))

    def charm_entropy_params(self, latent_means, latent_scales, support, i: int):
        """(μ, σ, mean_support) for slice ``i`` given decoded ``support``."""
        yh, yw = latent_means.shape[1], latent_means.shape[2]
        mean_support = jnp.concatenate([latent_means] + list(support), axis=-1)
        if self.cfg.swatten:
            mean_support = self.atten_mean[i](mean_support)
        mu = self.cc_mean_transforms[i](mean_support)[:, :yh, :yw, :]
        scale_support = jnp.concatenate([latent_scales] + list(support), axis=-1)
        if self.cfg.swatten:
            scale_support = self.atten_scale[i](scale_support)
        sigma = self.cc_scale_transforms[i](scale_support)[:, :yh, :yw, :]
        return mu, sigma, mean_support

    def charm_apply_lrp(self, mean_support, y_hat_slice, i: int):
        if not self.cfg.lrp:
            return y_hat_slice
        lrp_in = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return y_hat_slice + 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_in))

    def synthesize(self, y_hat, syntax_rounded, rate=None):
        """y_hat (+ syntax vector) → reconstruction.  ``rate`` selects the
        inverse gain for gain-unit models (decoded latents are gained)."""
        if self.cfg.gain_units:
            _, ig = self._gain_vectors(0.0 if rate is None else rate)
            y_hat = y_hat * ig
        x_tilde = self.g_s(y_hat)
        return self._decode_tail(x_tilde, syntax_rounded)

    # ----------------------- neural-syntax bitstream sub-passes
    #
    # The reference never wrote the position-sequential decode its spatial
    # context model implies (``model/net.py:219-319,766-790`` — SURVEY
    # §7.8).  These entry points expose the pieces the wavefront coder in
    # ``models/compress.py`` schedules: the 4×4 causal context admits an
    # anti-diagonal (t = 2·row + col) wavefront where every wavefront's
    # positions are mutually independent.

    def ns_hyper_encode(self, z3):
        """z3 → z2 (unrounded; symbols are round(z2))."""
        return self.ha_model(z3)

    def ns_hyper_decode(self, z2_int):
        """Integer ẑ2 → hyper features h2."""
        return self.hs_model(z2_int)

    def ns_z2_sigma(self):
        # same |σ| + floor as the training likelihood (keeps coded bits
        # consistent with the rate estimate)
        return jnp.maximum(jnp.abs(self.z2_sigma), 1e-4)[0, 0, 0]  # (N,)

    def ns_syntax_params(self, h2):
        """(μ, σ) for the syntax vector — depends only on coded ẑ2."""
        return self.prediction_model_syntax(h2)

    def ns_context_head(self, merged):
        """(μ, σ) from prebuilt (P, 4, 4, c_y+c_h) context patches."""
        return self.prediction_model.head(merged)

    def entro_predict(self, y_in, latent_scales, latent_means, h_emb=None):
        """One checkerboard context pass: (μ, σ) given the currently-decoded
        latent ``y_in`` (zeros where unknown) and the hyper features.
        ``h_emb``: precomputed ``entro_embed_hyper`` output — the shared
        prefix of the two passes (skips re-embedding the hyper)."""
        hyper = jnp.concatenate([latent_scales, latent_means], axis=-1)
        return self.entro_context._run(
            y_in, hyper, None, (y_in.shape[1], y_in.shape[2]), h_emb=h_emb
        )

    def entro_embed_hyper(self, latent_scales, latent_means):
        """Embed the hyper features once for both checkerboard passes."""
        hyper = jnp.concatenate([latent_scales, latent_means], axis=-1)
        return self.entro_context.embed_hyper(hyper)

    # ------------------------------------------ entroformer context path

    def _entroformer_entropy(
        self, x, z3, latent_scales, latent_means, z_lik, syntax_rounded,
        training, num_pixels, use_post_processing=True,
    ):
        """Checkerboard masked-attention entropy coding over y: anchors are
        predicted from the hyper alone, non-anchors from the decoded anchor
        half — decode-consistent in 2 device passes (the TPU answer to the
        reference's never-implemented AR decode; BASELINE config #4)."""
        from ..layers.entroformer import checkerboard_masks

        cfg = self.cfg
        hyper = jnp.concatenate([latent_scales, latent_means], axis=-1)
        b, yh, yw, c = z3.shape
        anchor = jnp.asarray(
            checkerboard_masks(yh, yw)[0], z3.dtype
        )[None, :, :, None]

        # pass 1: anchors from the hyper only.  _run is invoked directly
        # (as entro_predict does for the bitstream path) — going through
        # EntroformerContext.__call__ would run the transformer twice per
        # call, 4 passes per step where these 2 suffice.
        mu1, s1 = self.entro_context._run(
            jnp.zeros_like(z3), hyper, None, (yh, yw)
        )
        y_hat_anchor = (ste_round(z3 - mu1) + mu1) * anchor
        # pass 2: non-anchors see decoded anchors
        mu2, s2 = self.entro_context._run(y_hat_anchor, hyper, None, (yh, yw))
        mu = anchor * mu1 + (1 - anchor) * mu2
        sigma = anchor * s1 + (1 - anchor) * s2

        key = self._noise_key() if training else None
        _, y_lik = self.gaussian_conditional(
            z3, sigma, mu, training=training, key=key
        )
        y_hat = ste_round(z3 - mu) + mu

        x_tilde = self.g_s(y_hat)
        x_tilde = self._decode_tail(x_tilde, syntax_rounded, use_post_processing)

        bpp_y = _bpp(y_lik, num_pixels)
        bpp_z = (
            _bpp(z_lik, num_pixels)
            if (z_lik is not None and cfg.count_hyper_bpp)
            else jnp.zeros(())
        )
        mse = jnp.mean((x_tilde - x) ** 2)
        return CodecOutput(
            x_tilde=x_tilde, bpp=bpp_y + bpp_z, mse=mse,
            bpp_y=bpp_y, bpp_z=bpp_z, bpp_syntax=jnp.zeros(()),
            extras={"y_hat": y_hat, "means": mu, "scales": sigma},
        )

    # ---------------------------------------------------------- aux loss

    def entropy_aux_loss(self) -> jax.Array:
        """Factorized-prior quantile loss (0 when no EntropyBottleneck)."""
        if self.cfg.family == "charm" and self.cfg.hyper in (
            "classic_dual", "elic", "unet", "unet_dec"
        ):
            return self.entropy_bottleneck.aux_loss()
        return jnp.zeros(())
