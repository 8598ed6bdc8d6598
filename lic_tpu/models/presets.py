"""Preset registry: one ``CodecConfig`` per reference ``Net`` file.

The reference ships ~10 copy-pasted 1k-line model files (SURVEY.md §2.5);
each row below reproduces one of them as a configuration of the shared
codec core.  ``build_model(name)`` returns the flax module.
"""

from __future__ import annotations

from typing import Dict

from ..config import CodecConfig
from .codec import CodecModel

PRESETS: Dict[str, CodecConfig] = {
    # model/net.py — the original Neural-Syntax hyperprior + spatial-context
    # model (plain GDN transforms, classic hyper, PredictionModel_Context).
    "neural_syntax": CodecConfig(
        family="neural_syntax",
        transform="plain",
        hyper="classic",
        syntax="basic",
        tanh_after_syntax=False,   # net.py has no tanh after batch_conv
        code_syntax=True,
    ),
    # model/source_net.py — ChARM transition model: plain transforms,
    # classic dual hyper + EntropyBottleneck, no SWAtten in the loop.
    "source_net": CodecConfig(
        family="charm",
        transform="plain",
        hyper="classic_dual",
        swatten=False,
        syntax="basic",
    ),
    # model/source_net_WAM.py — source_net + Win_noShift gates in g_a/g_s.
    "source_net_wam": CodecConfig(
        family="charm",
        transform="plain_wam",
        hyper="classic_dual",
        swatten=False,
        syntax="basic",
    ),
    # model/net_ga.py — rich transforms + ELIC conv hyper + SWAtten (the
    # reference eval entry point, eval_net.py:16).
    "net_ga": CodecConfig(
        family="charm",
        transform="rich",
        hyper="elic",
        swatten=True,
        syntax="wam",
    ),
    # model/net_ha.py — plain transforms + split U-Net hyper + SWAtten.
    "net_ha": CodecConfig(
        family="charm",
        transform="plain",
        hyper="unet",
        swatten=True,
        syntax="wam",
    ),
    # model/net_unet_ha_hs.py — the "full" model: rich transforms + U-Net
    # hyper + SWAtten + WAM syntax.
    "net_unet_ha_hs": CodecConfig(
        family="charm",
        transform="rich",
        hyper="unet",
        swatten=True,
        syntax="wam",
    ),
    # Decodable flagship (no reference counterpart by design): the
    # net_unet_ha_hs architecture with the skip pyramid re-synthesized from
    # coded ẑ only, so it emits REAL bitstreams (the reference's U-Net hyper
    # decoder consumes encoder-side activations, net_unet_ha_hs.py:880,892,
    # and therefore cannot decode).
    "net_unet_ha_hs_dec": CodecConfig(
        family="charm",
        transform="rich",
        hyper="unet_dec",
        swatten=True,
        syntax="wam",
    ),
    # model/net_unet_ha_hs_1.py — g_s outputs RGB directly (syntax conv
    # bypassed), separate scale/means U-Net decoders.
    "net_unet_ha_hs_1": CodecConfig(
        family="charm",
        transform="rich",
        hyper="unet",
        shared_hyper_decoder=False,
        swatten=True,
        syntax="wam",
        syntax_decoder=False,
    ),
    # model/Net_unet.py — rich transforms + UNCODED latent-U-Net mean/scale
    # (SpatialTransformer U-Net on the unquantized latent; the reference
    # training entry point, train_net_unet.py:16).
    "net_unet": CodecConfig(
        family="charm",
        transform="rich",
        hyper="latent_unet",
        unet_variant="res",
        swatten=True,
        syntax="wam",
        count_hyper_bpp=False,     # nothing coded on the hyper path
    ),
    # model/Net_unet_1.py — Net_unet with the Unet_new (conv1x1-branch)
    # latent U-Net.
    "net_unet_1": CodecConfig(
        family="charm",
        transform="rich",
        hyper="latent_unet",
        unet_variant="conv1x1",
        swatten=True,
        syntax="wam",
        count_hyper_bpp=False,
    ),
    # model/Net_unet_005_5.py — λ=0.05 twin of Net_unet_1 with the 'res'
    # U-Net (diff-verified identical architecture to Net_unet otherwise).
    "net_unet_005_5": CodecConfig(
        family="charm",
        transform="rich",
        hyper="latent_unet",
        unet_variant="res",
        swatten=True,
        syntax="wam",
        count_hyper_bpp=False,
    ),
    # The Entroformer path the reference implies but never ships (missing
    # model/Block.py; cit_he/cit_hd refs at Net_unet.py:862-863): masked-
    # attention AR entropy coding over the latent — checkerboard two-pass,
    # decodable, TPU-parallel (BASELINE config #4).
    "entroformer_cb": CodecConfig(
        family="charm",
        transform="plain",
        hyper="elic",
        context="entroformer",
        syntax="basic",
    ),
    # reference-sized Entroformer context (entroformer_helper.py:12-69:
    # 6 layers, 6 heads, dim_head 64 → dim 384 = 2N): the capacity point
    # for the VERDICT-r4 fair-shot sweep.
    "entroformer_cb_full": CodecConfig(
        family="charm",
        transform="plain",
        hyper="elic",
        context="entroformer",
        syntax="basic",
        entro_layers=6,
        entro_heads=6,
        entro_dim_mult=2,
    ),
    # beyond reference — variable-rate source_net: 4 learned gain-unit
    # pairs span the reference's λ family {0.0025, 0.0067, 0.013, 0.05}
    # from ONE checkpoint, with continuous rates by exponential gain
    # interpolation (train with TrainConfig.lmbda_list).
    "source_net_vr": CodecConfig(
        family="charm",
        transform="plain",
        hyper="classic_dual",
        swatten=False,
        syntax="basic",
        gain_units=4,
    ),
}


def get_config(name: str, **overrides) -> CodecConfig:
    cfg = PRESETS[name]
    return cfg.replace(**overrides) if overrides else cfg


def build_model(name: str, **overrides) -> CodecModel:
    return CodecModel(get_config(name, **overrides))
