"""Reference (PyTorch) checkpoint importer + reference-model loader.

Two jobs:

1. ``install_reference_shims()`` + ``load_reference_net()`` make the
   UNMODIFIED reference tree at ``/root/reference`` importable under
   torch-cpu: the three modules missing from the tree (``model/Haar.py``,
   ``model/Block.py``, ``model/DepthwiseSeparableConv.py`` — SURVEY defect
   §8.1) and the absent third-party deps (compressai, timm, torchvision)
   are provided as faithful shims.  The compressai entropy models are
   torch restatements of the published CompressAI semantics (the same
   semantics ``lic_tpu.entropy`` implements in JAX); the compressai.layers
   blocks follow the published block definitions.  The reference's
   ``parse_args()``-in-``__init__`` (defect §8.8) is defused by patching
   ``sys.argv`` for the construction.

2. ``import_source_net_wam(state_dict)`` maps a reference
   ``model/source_net_WAM.py`` state dict onto lic_tpu's
   ``source_net_wam`` preset parameters (NCHW→HWIO transposes, torch
   deconv→correlation-HWIO flip, Linear transposes; GDN/EB parameters are
   stored in identical reparameterized spaces on both sides and copy
   straight through).  Reference modules that the reference forward never
   executes (``atten_mean``/``atten_scale`` — the slice-loop SWAtten is
   commented out at ``source_net_WAM.py:893,899`` — ``prediction_model``,
   ``prediction_model_syntax``, ``z2_sigma``, ``conv_1``/``conv_2``) are
   skipped and reported.

CLI:
    python tools/import_torch.py --ckpt ref.ckpt --out params.npz \
        [--post_processing]

Parity evidence lives in ``tests/test_torch_import.py``: a randomly
initialized reference ``source_net_WAM.Net`` and the imported lic_tpu
model agree on reconstruction and per-element likelihoods at fp32
tolerance on a fixed input.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_ROOT = os.environ.get("LIC_TPU_REFERENCE", "/root/reference")


# ======================================================================
# shims
# ======================================================================

def _make_timm_shim():
    import torch
    from torch import nn

    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = types.ModuleType("timm.models")
    registry = types.ModuleType("timm.models.registry")

    def register_model(fn=None, *a, **k):
        if fn is None:
            return lambda f: f
        return fn

    registry.register_model = register_model
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        """Stochastic depth (timm semantics); identity at eval."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(
                keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            )
            return x / keep * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.to_2tuple = to_2tuple
    timm.data = data
    timm.models = models
    models.registry = registry
    models.layers = layers
    return {
        "timm": timm,
        "timm.data": data,
        "timm.models": models,
        "timm.models.registry": registry,
        "timm.models.layers": layers,
    }


def _make_compressai_shim():
    import math

    import torch
    from torch import nn
    import torch.nn.functional as F

    # ---------------- entropy models (CompressAI semantics; the same
    # math lic_tpu/entropy implements in JAX) ----------------

    class EntropyBottleneck(nn.Module):
        def __init__(self, channels, filters=(3, 3, 3, 3), init_scale=10.0,
                     tail_mass=1e-9, likelihood_bound=1e-9):
            super().__init__()
            self.channels = channels
            self.filters = tuple(filters)
            self.likelihood_bound = likelihood_bound
            fs = (1,) + self.filters + (1,)
            scale = init_scale ** (1.0 / (len(self.filters) + 1))
            for i in range(len(self.filters) + 1):
                init = math.log(math.expm1(1.0 / scale / fs[i + 1]))
                m = torch.full((channels, fs[i + 1], fs[i]), init)
                self.register_parameter(f"_matrix{i}", nn.Parameter(m))
                b = torch.empty(channels, fs[i + 1], 1).uniform_(-0.5, 0.5)
                self.register_parameter(f"_bias{i}", nn.Parameter(b))
                if i < len(self.filters):
                    f = torch.zeros(channels, fs[i + 1], 1)
                    self.register_parameter(f"_factor{i}", nn.Parameter(f))
            q = torch.tensor([-init_scale, 0.0, init_scale])
            self.quantiles = nn.Parameter(
                q.repeat(channels, 1, 1)  # (C, 1, 3)
            )

        def _get_medians(self):
            return self.quantiles[:, :, 1:2].detach()

        def _logits_cumulative(self, inputs):
            logits = inputs
            k = len(self.filters) + 1
            for i in range(k):
                logits = torch.matmul(
                    F.softplus(getattr(self, f"_matrix{i}")), logits
                ) + getattr(self, f"_bias{i}")
                if i < k - 1:
                    factor = torch.tanh(getattr(self, f"_factor{i}"))
                    logits = logits + factor * torch.tanh(logits)
            return logits

        def forward(self, x):
            # channel-major (C, 1, N)
            c = self.channels
            shape = x.shape
            perm = x.transpose(0, 1).reshape(c, 1, -1)
            medians = self.quantiles[:, :, 1:2].detach()
            if self.training:
                outputs = perm + torch.empty_like(perm).uniform_(-0.5, 0.5)
            else:
                outputs = torch.round(perm - medians) + medians
            v0 = self._logits_cumulative(outputs - 0.5)
            v1 = self._logits_cumulative(outputs + 0.5)
            sign = -torch.sign(v0 + v1).detach()
            likelihood = torch.abs(
                torch.sigmoid(sign * v1) - torch.sigmoid(sign * v0)
            )
            likelihood = torch.clamp(likelihood, min=self.likelihood_bound)
            out = outputs.reshape(c, *shape[0:1], *shape[2:]).transpose(0, 1)
            lik = likelihood.reshape(c, *shape[0:1], *shape[2:]).transpose(0, 1)
            return out, lik

    _SQRT2 = math.sqrt(2.0)

    class GaussianConditional(nn.Module):
        def __init__(self, scale_table=None, scale_bound=0.11,
                     likelihood_bound=1e-9, tail_mass=1e-9):
            super().__init__()
            self.scale_bound = scale_bound
            self.likelihood_bound = likelihood_bound

        @staticmethod
        def _standardized_cumulative(x):
            return 0.5 * torch.erfc(-x / _SQRT2)

        def forward(self, inputs, scales, means=None):
            if self.training:
                outputs = inputs + torch.empty_like(inputs).uniform_(-0.5, 0.5)
            else:
                outputs = inputs if means is None else inputs - means
                outputs = torch.round(outputs)
                if means is not None:
                    outputs = outputs + means
            values = outputs if means is None else outputs - means
            scales = torch.clamp(scales, min=self.scale_bound)
            values = torch.abs(values)
            upper = self._standardized_cumulative((0.5 - values) / scales)
            lower = self._standardized_cumulative((-0.5 - values) / scales)
            likelihood = torch.clamp(
                upper - lower, min=self.likelihood_bound
            )
            return outputs, likelihood

    # ---------------- layers ----------------

    def conv1x1(in_ch, out_ch, stride=1):
        return nn.Conv2d(in_ch, out_ch, kernel_size=1, stride=stride)

    def conv3x3(in_ch, out_ch, stride=1):
        return nn.Conv2d(in_ch, out_ch, kernel_size=3, stride=stride, padding=1)

    def subpel_conv3x3(in_ch, out_ch, r=1):
        return nn.Sequential(
            nn.Conv2d(in_ch, out_ch * r ** 2, kernel_size=3, padding=1),
            nn.PixelShuffle(r),
        )

    class ResidualBlock(nn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.conv1 = conv3x3(in_ch, out_ch)
            self.leaky_relu = nn.LeakyReLU(inplace=True)
            self.conv2 = conv3x3(out_ch, out_ch)
            if in_ch != out_ch:
                self.skip = conv1x1(in_ch, out_ch)
            else:
                self.skip = None

        def forward(self, x):
            identity = x
            out = self.conv1(x)
            out = self.leaky_relu(out)
            out = self.conv2(out)
            out = self.leaky_relu(out)
            if self.skip is not None:
                identity = self.skip(x)
            return out + identity

    class ResidualBlockWithStride(nn.Module):
        def __init__(self, in_ch, out_ch, stride=2):
            super().__init__()
            # import the reference's own GDN so parameter space matches
            from model.gdn import GDN

            self.conv1 = conv3x3(in_ch, out_ch, stride=stride)
            self.leaky_relu = nn.LeakyReLU(inplace=True)
            self.conv2 = conv3x3(out_ch, out_ch)
            self.gdn = GDN(out_ch)
            if stride != 1 or in_ch != out_ch:
                self.skip = conv1x1(in_ch, out_ch, stride=stride)
            else:
                self.skip = None

        def forward(self, x):
            identity = x
            out = self.conv1(x)
            out = self.leaky_relu(out)
            out = self.conv2(out)
            out = self.gdn(out)
            if self.skip is not None:
                identity = self.skip(x)
            return out + identity

    class ResidualBlockUpsample(nn.Module):
        def __init__(self, in_ch, out_ch, upsample=2):
            super().__init__()
            from model.gdn import IGDN

            self.subpel_conv = subpel_conv3x3(in_ch, out_ch, upsample)
            self.leaky_relu = nn.LeakyReLU(inplace=True)
            self.conv = conv3x3(out_ch, out_ch)
            self.igdn = IGDN(out_ch)
            self.upsample = subpel_conv3x3(in_ch, out_ch, upsample)

        def forward(self, x):
            identity = self.upsample(x)
            out = self.subpel_conv(x)
            out = self.leaky_relu(out)
            out = self.conv(out)
            out = self.igdn(out)
            return out + identity

    class AttentionBlock(nn.Module):
        """CompressAI attention block: two ResidualUnit branches + gate."""

        def __init__(self, N):
            super().__init__()

            class ResidualUnit(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.conv = nn.Sequential(
                        conv1x1(N, N // 2), nn.ReLU(inplace=True),
                        conv3x3(N // 2, N // 2), nn.ReLU(inplace=True),
                        conv1x1(N // 2, N),
                    )
                    self.relu = nn.ReLU(inplace=True)

                def forward(self, x):
                    return self.relu(self.conv(x) + x)

            self.conv_a = nn.Sequential(
                ResidualUnit(), ResidualUnit(), ResidualUnit()
            )
            self.conv_b = nn.Sequential(
                ResidualUnit(), ResidualUnit(), ResidualUnit(),
                conv1x1(N, N),
            )

        def forward(self, x):
            a = self.conv_a(x)
            b = self.conv_b(x)
            return x + a * torch.sigmoid(b)

    compressai = types.ModuleType("compressai")
    em = types.ModuleType("compressai.entropy_models")
    em.EntropyBottleneck = EntropyBottleneck
    em.GaussianConditional = GaussianConditional
    ly = types.ModuleType("compressai.layers")
    ly.AttentionBlock = AttentionBlock
    ly.ResidualBlock = ResidualBlock
    ly.ResidualBlockUpsample = ResidualBlockUpsample
    ly.ResidualBlockWithStride = ResidualBlockWithStride
    ly.conv3x3 = conv3x3
    ly.subpel_conv3x3 = subpel_conv3x3
    ans = types.ModuleType("compressai.ans")

    class _NoRans:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                "compressai.ans shim: the reference never exercises its "
                "rANS coder; lic_tpu ships its own (lic_tpu/coding)"
            )

    ans.BufferedRansEncoder = _NoRans
    ans.RansDecoder = _NoRans
    compressai.entropy_models = em
    compressai.layers = ly
    compressai.ans = ans
    return {
        "compressai": compressai,
        "compressai.entropy_models": em,
        "compressai.layers": ly,
        "compressai.ans": ans,
    }


def _make_missing_model_shims():
    """model/Haar.py, model/Block.py, model/DepthwiseSeparableConv.py —
    missing from the reference tree (imported at e.g. model/net.py:26,
    model/Net_unet.py:30,35,45; SURVEY §8.1)."""
    from torch import nn

    haar = types.ModuleType("model.Haar")

    def define_G(*a, **k):
        # the hookup is commented out everywhere (e.g. net.py:455);
        # an Identity keeps any stray construction harmless
        return nn.Identity()

    haar.define_G = define_G

    block = types.ModuleType("model.Block")

    class _Missing:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                "model/Block.py is missing from the reference tree "
                "(TransHyperScale/ConvTransBlock_*); lic_tpu's equivalents "
                "live in lic_tpu/layers/entroformer.py"
            )

    block.TransHyperScale = _Missing
    block.ConvTransBlock_ha = _Missing
    block.ConvTransBlock_hs = _Missing

    dsc = types.ModuleType("model.DepthwiseSeparableConv")

    class DepthwiseSeparableConv(nn.Module):
        """Depthwise 3x3 + pointwise 1x1 (the standard construction the
        missing module's call sites imply, net_unet_ha_hs.py:536-542)."""

        def __init__(
            self, in_ch=None, out_ch=None, kernel_size=3, stride=1,
            in_channels=None, out_channels=None,
        ):
            super().__init__()
            in_ch = in_ch if in_ch is not None else in_channels
            out_ch = out_ch if out_ch is not None else out_channels
            out_ch = out_ch or in_ch
            self.depthwise = nn.Conv2d(
                in_ch, in_ch, kernel_size, stride,
                padding=kernel_size // 2, groups=in_ch,
            )
            self.pointwise = nn.Conv2d(in_ch, out_ch, 1)

        def forward(self, x):
            return self.pointwise(self.depthwise(x))

    dsc.DepthwiseSeparableConv = DepthwiseSeparableConv

    # model/visual_Feature.py exists but is import-broken under current
    # matplotlib (`plt.style.use('seaborn-whitegrid')` was removed in
    # mpl 3.6); net_ga does `from .visual_Feature import *` and calls the
    # heatmap dump inside forward (net_ga.py:61,990).  No-op shim — the
    # parity tests drive submodules directly and never hit the dump.
    vf = types.ModuleType("model.visual_Feature")
    vf.visual_FeatureMap_heat = lambda *a, **k: None
    vf.visual_FeatureMap = lambda *a, **k: None
    vf.Analyze_data = lambda *a, **k: None
    return {
        "model.Haar": haar,
        "model.Block": block,
        "model.DepthwiseSeparableConv": dsc,
        "model.visual_Feature": vf,
    }


def _make_torchvision_shim():
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    datasets = types.ModuleType("torchvision.datasets")
    utils = types.ModuleType("torchvision.utils")

    def to_pil_image(*a, **k):
        raise NotImplementedError("torchvision shim: debug I/O path")

    def save_image(*a, **k):
        raise NotImplementedError("torchvision shim: debug I/O path")

    functional.to_pil_image = to_pil_image
    transforms.functional = functional
    utils.save_image = save_image
    tv.transforms = transforms
    tv.datasets = datasets
    tv.utils = utils
    return {
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": functional,
        "torchvision.datasets": datasets,
        "torchvision.utils": utils,
    }


def _patch_torch_cpu_only() -> None:
    """The reference hard-codes CUDA placement inside module constructors
    (e.g. ``NoiseQuant.__init__`` at ``source_net_WAM.py:240``:
    ``.to(torch.device("cuda"))``).  Redirect cuda targets to cpu so the
    unmodified tree runs under torch-cpu."""
    import torch

    def _is_cuda(d):
        return (isinstance(d, str) and d.startswith("cuda")) or (
            isinstance(d, torch.device) and d.type == "cuda"
        )

    orig_to = torch.Tensor.to

    def to_cpu(self, *args, **kwargs):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = to_cpu
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def install_reference_shims(ref_root: str = REF_ROOT) -> None:
    """Idempotent: seed sys.modules with the shims and put the reference
    tree on sys.path so ``import model.source_net_WAM`` works."""
    if "compressai" in sys.modules:
        return
    _patch_torch_cpu_only()
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    mods = {}
    mods.update(_make_timm_shim())
    mods.update(_make_compressai_shim())
    mods.update(_make_torchvision_shim())
    # the 'model' package must exist before its missing submodules are
    # seeded (relative imports resolve to absolute 'model.X' names)
    import importlib

    importlib.import_module("model")
    mods.update(_make_missing_model_shims())
    sys.modules.update(mods)


def load_reference_net(
    train_size=(1, 64, 64, 3),
    test_size=None,
    is_high=False,
    post_processing=False,
    module="model.source_net_WAM",
):
    """Construct the reference Net under torch-cpu, argv defused."""
    install_reference_shims()
    import importlib

    mod = importlib.import_module(module)
    argv, sys.argv = sys.argv, [sys.argv[0]]  # defect §8.8 workaround
    try:
        net = mod.Net(
            train_size, test_size or train_size, is_high, post_processing
        )
    finally:
        sys.argv = argv
    return net


# ======================================================================
# state-dict → lic_tpu params
# ======================================================================

def _conv_w(t: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kh, kw) → HWIO (kh, kw, I, O)."""
    return np.ascontiguousarray(t.transpose(2, 3, 1, 0))


def _deconv_w(t: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) → correlation HWIO with the
    spatial flip (lic_tpu/layers/conv.py::ConvTranspose2d docstring)."""
    return np.ascontiguousarray(t[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _linear_w(t: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) → flax Dense (I, O)."""
    return np.ascontiguousarray(t.T)


def _set(params, path, value):
    node = params
    parts = path.split("/")
    for p in parts[:-1]:
        node = node[p]
    leaf = parts[-1]
    assert leaf in node, f"no such param: {path}"
    have = tuple(np.shape(node[leaf]))
    want = tuple(value.shape)
    assert have == want, f"{path}: shape {want} != expected {have}"
    node[leaf] = value.astype(np.float32)


def _map_conv(out, sd, tk, fk, deconv=False):
    _set(out, f"{fk}/kernel", (_deconv_w if deconv else _conv_w)(sd.pop(f"{tk}.weight")))
    _set(out, f"{fk}/bias", sd.pop(f"{tk}.bias"))


def _map_gdn(out, sd, tk, fk):
    # both sides store beta/gamma in the sqrt-reparameterized space with
    # the same (out, in) gamma orientation — straight copy
    _set(out, f"{fk}/beta", sd.pop(f"{tk}.beta"))
    _set(out, f"{fk}/gamma", sd.pop(f"{tk}.gamma"))
    sd.pop(f"{tk}.reparam_offset", None)  # constant buffers (2^-18, its
    sd.pop(f"{tk}.pedestal", None)        # square) — baked into lic_tpu


def _map_linear(out, sd, tk, fk):
    _set(out, f"{fk}/kernel", _linear_w(sd.pop(f"{tk}.weight")))
    _set(out, f"{fk}/bias", sd.pop(f"{tk}.bias"))


def _map_rb(out, sd, tk, fk):
    """compressai ResidualBlock → lic_tpu ResidualBlock (Conv2d_0/_1)."""
    _map_conv(out, sd, f"{tk}.conv1", f"{fk}/Conv2d_0")
    _map_conv(out, sd, f"{tk}.conv2", f"{fk}/Conv2d_1")
    if f"{tk}.skip.weight" in sd:
        _map_conv(out, sd, f"{tk}.skip", f"{fk}/Conv2d_2")


def _map_wba(out, sd, tk, fk):
    """WinBasedAttention: attn.{qkv, proj, relative_position_bias_table}."""
    _map_linear(out, sd, f"{tk}.attn.qkv", f"{fk}/attn/qkv")
    _map_linear(out, sd, f"{tk}.attn.proj", f"{fk}/attn/proj")
    _set(
        out, f"{fk}/attn/relative_position_bias_table",
        sd.pop(f"{tk}.attn.relative_position_bias_table"),
    )
    sd.pop(f"{tk}.attn.relative_position_index", None)  # static buffer


def _map_wnsa(out, sd, tk, fk):
    """Win_noShift_Attention (layers/layers.py:56-111)."""
    for i in range(3):
        _map_rb(out, sd, f"{tk}.conv_a.{i}", f"{fk}/conv_a_{i}")
    seq = [
        ("0", "wba0", _map_wba), ("1", "c1x1", _map_conv),
        ("2", "wba1", _map_wba), ("3", "rb1", _map_rb),
        ("4", "c3x3", _map_conv), ("5", "wba2", _map_wba),
        ("6", "rb2", _map_rb), ("7", "c7x7", _map_conv),
        ("8", "wba3", _map_wba), ("9", "rb3", _map_rb),
    ]
    for idx, name, fn in seq:
        fn(out, sd, f"{tk}.conv_b.{idx}", f"{fk}/{name}")


def _map_ru(out, sd, tk, fk):
    """CompressAI ResidualUnit: conv.{0,2,4} = 1x1 / 3x3 / 1x1."""
    for j, c in ((0, "Conv2d_0"), (2, "Conv2d_1"), (4, "Conv2d_2")):
        _map_conv(out, sd, f"{tk}.conv.{j}", f"{fk}/{c}")


def _map_rbott(out, sd, tk, fk):
    """net_ga ResidualBottleneck (``net_ga.py:90-104``): branch.{0,2,4}."""
    for j, c in ((0, "Conv2d_0"), (2, "Conv2d_1"), (4, "Conv2d_2")):
        _map_conv(out, sd, f"{tk}.branch.{j}", f"{fk}/{c}")


def _map_rbs(out, sd, tk, fk):
    """CompressAI ResidualBlockWithStride: conv1/conv2/gdn (+skip)."""
    _map_conv(out, sd, f"{tk}.conv1", f"{fk}/Conv2d_0")
    _map_conv(out, sd, f"{tk}.conv2", f"{fk}/Conv2d_1")
    _map_gdn(out, sd, f"{tk}.gdn", f"{fk}/GDN_0")
    if f"{tk}.skip.weight" in sd:
        _map_conv(out, sd, f"{tk}.skip", f"{fk}/Conv2d_2")


def _map_ln(out, sd, tk, fk):
    _set(out, f"{fk}/scale", sd.pop(f"{tk}.weight"))
    _set(out, f"{fk}/bias", sd.pop(f"{tk}.bias"))


def _map_swin_tblock(out, sd, tk, fk):
    """Block_1 (``Block_unet.py:260-283``): ln→WMSA→ln→MLP."""
    _map_ln(out, sd, f"{tk}.ln1", f"{fk}/ln1")
    _map_ln(out, sd, f"{tk}.ln2", f"{fk}/ln2")
    _map_linear(out, sd, f"{tk}.msa.embedding_layer", f"{fk}/msa/embedding_layer")
    _map_linear(out, sd, f"{tk}.msa.linear", f"{fk}/msa/linear")
    # torch stores (heads, 2w-1, 2w-1) (``Block_unet.py:184-194``);
    # ours is (2w-1, 2w-1, heads) indexed then heads-major transposed
    rel = sd.pop(f"{tk}.msa.relative_position_params")
    _set(out, f"{fk}/msa/relative_position_params", rel.transpose(1, 2, 0))
    _map_linear(out, sd, f"{tk}.mlp.0", f"{fk}/mlp_fc1")
    _map_linear(out, sd, f"{tk}.mlp.2", f"{fk}/mlp_fc2")


def _map_swatten(out, sd, tk, fk):
    """SWAtten (``net_ga.py:145-170``): 1x1 in → AttentionBlock gate whose
    b-branch sees the SwinBlock features → 1x1 out."""
    _map_conv(out, sd, f"{tk}.in_conv", f"{fk}/in_conv")
    _map_conv(out, sd, f"{tk}.out_conv", f"{fk}/out_conv")
    for j in range(3):
        _map_ru(out, sd, f"{tk}.conv_a.{j}", f"{fk}/gate/ResidualUnit_{j}")
        _map_ru(out, sd, f"{tk}.conv_b.{j}", f"{fk}/gate/ResidualUnit_{3 + j}")
    _map_conv(out, sd, f"{tk}.conv_b.3", f"{fk}/gate/Conv2d_0")
    _map_swin_tblock(
        out, sd, f"{tk}.non_local_block.block_1", f"{fk}/non_local_block/block_1"
    )
    _map_swin_tblock(
        out, sd, f"{tk}.non_local_block.block_2", f"{fk}/non_local_block/block_2"
    )


def _map_eb(out, sd, tk, fk, n_filters=4):
    for i in range(n_filters + 1):
        _set(out, f"{fk}/matrix_{i}", sd.pop(f"{tk}._matrix{i}"))
        _set(out, f"{fk}/bias_{i}", sd.pop(f"{tk}._bias{i}"))
        if i < n_filters:
            _set(out, f"{fk}/factor_{i}", sd.pop(f"{tk}._factor{i}"))
    _set(out, f"{fk}/quantiles", sd.pop(f"{tk}.quantiles"))


def import_source_net_wam(
    state_dict, template_params, post_processing=False, verbose=True
):
    """Map a reference source_net_WAM state dict onto a params tree shaped
    like lic_tpu's ``source_net_wam`` preset (``template_params`` from
    ``model.init``; returned tree has every mapped leaf replaced).

    Reference: ``/root/reference/model/source_net_WAM.py:632-837`` (module
    construction) and ``:839-1001`` (the executed forward).
    """
    import jax

    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    out = jax.tree.map(np.asarray, template_params)
    # make mutable nested dicts
    out = jax.tree_util.tree_map(np.asarray, out)

    def to_mutable(d):
        return {
            k: to_mutable(v) if isinstance(v, dict) else v
            for k, v in d.items()
        }

    out = to_mutable(jax.device_get(out))

    # ---- g_a: a_model.transform — ZeroPad entries hold no params
    _map_conv(out, sd, "a_model.transform.1", "g_a/down0")
    _map_gdn(out, sd, "a_model.transform.2", "g_a/gdn0")
    _map_conv(out, sd, "a_model.transform.4", "g_a/down1")
    _map_gdn(out, sd, "a_model.transform.5", "g_a/gdn1")
    _map_wnsa(out, sd, "a_model.transform.6", "g_a/wam0")
    _map_conv(out, sd, "a_model.transform.8", "g_a/down2")
    _map_gdn(out, sd, "a_model.transform.9", "g_a/gdn2")
    _map_conv(out, sd, "a_model.transform.11", "g_a/down3")
    _map_wnsa(out, sd, "a_model.transform.12", "g_a/wam1")

    # ---- g_s: s_model.transform
    _map_wnsa(out, sd, "s_model.transform.0", "g_s/wam0")
    _map_conv(out, sd, "s_model.transform.2", "g_s/up0/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.3", "g_s/igdn0")
    _map_conv(out, sd, "s_model.transform.5", "g_s/up1/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.6", "g_s/igdn1")
    _map_wnsa(out, sd, "s_model.transform.7", "g_s/wam1")
    _map_conv(out, sd, "s_model.transform.9", "g_s/up2/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.10", "g_s/igdn2")
    _map_conv(out, sd, "s_model.transform.12", "g_s/up3/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.13", "g_s/igdn3")

    # ---- classic dual hyper
    _map_conv(out, sd, "h_a.transform.0", "h_a/c0")
    _map_conv(out, sd, "h_a.transform.2", "h_a/c1")
    _map_conv(out, sd, "h_a.transform.4", "h_a/c2")
    for side in ("h_mean_s", "h_scale_s"):
        _map_conv(out, sd, f"{side}.transform.0", f"{side}/d0", deconv=True)
        _map_conv(out, sd, f"{side}.transform.2", f"{side}/d1", deconv=True)
        # stride-1 ConvTranspose ≡ conv with flipped/swapped kernel — the
        # same _deconv_w mapping lands it in our Conv2d's HWIO layout
        _map_conv(out, sd, f"{side}.transform.4", f"{side}/c2", deconv=True)

    # ---- entropy bottleneck
    _map_eb(out, sd, "entropy_bottleneck", "entropy_bottleneck")

    # ---- charm slice stacks
    for group in ("cc_mean_transforms", "cc_scale_transforms", "lrp_transforms"):
        for i in range(4):
            for j, cname in ((0, "c0"), (2, "c1"), (4, "c2")):
                _map_conv(out, sd, f"{group}.{i}.{j}", f"{group}_{i}/{cname}")

    # ---- syntax
    _map_conv(out, sd, "syntax_model.down0", "syntax_model/down0")
    _map_conv(out, sd, "syntax_model.down1", "syntax_model/down1")
    _map_conv(out, sd, "syntax_model.conv", "syntax_model/out_conv")
    for j, fc in ((0, "fc0"), (2, "fc1"), (4, "fc2")):
        _map_linear(out, sd, f"conv_weights_gen.transform.{j}", f"conv_weights_gen/{fc}")

    if post_processing:
        _map_han(out, sd)

    # ---- leftovers: modules the reference builds but its forward never
    # executes (SWAtten lists — slice-loop calls commented at :893,899 —
    # syntax/context prediction heads, z2 machinery, HAN when not mapped)
    dead_prefixes = (
        "atten_mean.", "atten_scale.", "prediction_model.",
        "prediction_model_syntax.", "v_z2_sigma", "z2_sigma",
        "conv_1.", "conv_2.", "y_sampler.", "h_sampler.",
        "test_y_sampler.", "test_h_sampler.", "HAN.",
        "conv_weights_gen_HAN.", "add_mean.",
        "entropy_bottleneck_z2.", "entropy_bottleneck_z3.",
        "entropy_bottleneck_z3_syntax.", "gaussian_conditional.",
    )
    skipped = [k for k in sd if k.startswith(dead_prefixes)]
    unmapped = [k for k in sd if not k.startswith(dead_prefixes)]
    if verbose and skipped:
        print(f"skipped {len(skipped)} dead-module keys (never executed by "
              f"the reference forward): {sorted({k.split('.')[0] for k in skipped})}")
    assert not unmapped, f"unmapped reference keys: {unmapped[:10]}"
    return out


def import_net_ga(state_dict, template_params, verbose=True):
    """Map a reference ``model/net_ga.py`` state dict (the reference's EVAL
    entry — ``eval_net.py:16``) onto lic_tpu's ``net_ga`` preset.

    Reference: ``net_ga.py:735-944`` (construction), ``:984-1100`` (the
    executed forward: rich a_model, effective second synthesisTransformModel
    ``:364-403``, ELIC h_a + dual subpel hyper heads, SWAtten slice stacks,
    Syntax_Model with DepthwiseSeparableConv, conv_weights_gen).
    """
    import jax

    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }

    def to_mutable(d):
        return {
            k: to_mutable(v) if isinstance(v, dict) else v for k, v in d.items()
        }

    out = to_mutable(jax.device_get(jax.tree.map(np.asarray, template_params)))

    # ---- g_a: rich analysis (a_model.transform; 5/14 are ZeroPads)
    for i in range(3):
        _map_rbott(out, sd, f"a_model.transform.{i}", f"g_a/rb0_{i}")
    _map_rbs(out, sd, "a_model.transform.3", "g_a/rbs0")
    _map_gdn(out, sd, "a_model.transform.4", "g_a/gdn0")
    _map_conv(out, sd, "a_model.transform.6", "g_a/down1")
    _map_gdn(out, sd, "a_model.transform.7", "g_a/gdn1")
    _map_wnsa(out, sd, "a_model.transform.8", "g_a/wam0")
    for i in range(3):
        _map_rbott(out, sd, f"a_model.transform.{9 + i}", f"g_a/rb1_{i}")
    _map_rbs(out, sd, "a_model.transform.12", "g_a/rbs1")
    _map_gdn(out, sd, "a_model.transform.13", "g_a/gdn2")
    _map_conv(out, sd, "a_model.transform.15", "g_a/down3")
    _map_wnsa(out, sd, "a_model.transform.16", "g_a/wam1")

    # ---- g_s: the effective (second) synthesisTransformModel
    _map_wnsa(out, sd, "s_model.transform.0", "g_s/wam0")
    _map_conv(out, sd, "s_model.transform.2", "g_s/up0/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.3", "g_s/igdn0")
    _map_conv(out, sd, "s_model.transform.5", "g_s/up1/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.6", "g_s/igdn1")
    _map_wnsa(out, sd, "s_model.transform.7", "g_s/wam1")
    _map_conv(out, sd, "s_model.transform.9", "g_s/up2/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.10", "g_s/igdn2")
    _map_conv(out, sd, "s_model.transform.12", "g_s/up3/deconv", deconv=True)
    _map_gdn(out, sd, "s_model.transform.13", "g_s/igdn3")

    # ---- ELIC hyper: conv-GELU stack down, two subpel heads up
    for i, j in enumerate((0, 2, 4, 6, 8)):
        _map_conv(out, sd, f"h_a.{j}", f"h_a/c{i}")
    for side in ("h_mean_s", "h_scale_s"):
        _map_conv(out, sd, f"{side}.0", f"{side}/c0")
        _map_conv(out, sd, f"{side}.2.0", f"{side}/up0")  # subpel conv
        _map_conv(out, sd, f"{side}.4", f"{side}/c1")
        _map_conv(out, sd, f"{side}.6.0", f"{side}/up1")
        _map_conv(out, sd, f"{side}.8", f"{side}/c2")

    _map_eb(out, sd, "entropy_bottleneck", "entropy_bottleneck")

    # ---- slice stacks: SWAtten gates + conv-GELU chains
    for i in range(4):
        _map_swatten(out, sd, f"atten_mean.{i}.0", f"atten_mean_{i}")
        _map_swatten(out, sd, f"atten_scale.{i}.0", f"atten_scale_{i}")
    for group in ("cc_mean_transforms", "cc_scale_transforms", "lrp_transforms"):
        for i in range(4):
            for j, cname in ((0, "c0"), (2, "c1"), (4, "c2")):
                _map_conv(out, sd, f"{group}.{i}.{j}", f"{group}_{i}/{cname}")

    # ---- syntax path
    for i in range(3):
        _map_conv(
            out, sd, f"syntax_model.Depth_down{i}.depthwise",
            f"syntax_model/dw{i}/depthwise",
        )
        _map_conv(
            out, sd, f"syntax_model.Depth_down{i}.pointwise",
            f"syntax_model/dw{i}/pointwise",
        )
        _map_conv(out, sd, f"syntax_model.down{i}", f"syntax_model/down{i}")
    _map_wnsa(out, sd, "syntax_model.WAM", "syntax_model/wam")
    _map_conv(out, sd, "syntax_model.conv", "syntax_model/out_conv")
    for j, fc in ((0, "fc0"), (2, "fc1"), (4, "fc2")):
        _map_linear(
            out, sd, f"conv_weights_gen.transform.{j}", f"conv_weights_gen/{fc}"
        )

    # ---- leftovers: modules net_ga builds but its forward never executes
    dead_prefixes = (
        "prediction_model.", "prediction_model_syntax.", "v_z2_sigma",
        "z2_sigma", "conv_1.", "conv_2.", "y_sampler.", "h_sampler.",
        "test_y_sampler.", "test_h_sampler.", "HAN.",
        "conv_weights_gen_HAN.", "add_mean.", "gaussian_conditional.",
    )
    skipped = [k for k in sd if k.startswith(dead_prefixes)]
    unmapped = [k for k in sd if not k.startswith(dead_prefixes)]
    if verbose and skipped:
        print(
            f"skipped {len(skipped)} dead-module keys: "
            f"{sorted({k.split('.')[0] for k in skipped})}"
        )
    assert not unmapped, f"unmapped reference keys: {unmapped[:10]}"
    return out


def _map_han(out, sd, is_high=False):
    """HAN post-processing tail + its conv generator.

    Reference: ``model/han.py:220-285`` (HAN_Head), hooked at
    ``source_net_WAM.py:952-957``.  ``sub_mean``/``add_mean`` are popped
    unmapped: lic_tpu applies the DIV2K mean shift as the FIXED function
    the MeanShift construction intends, while the reference re-randomizes
    those convs through ``weight_init`` (``source_net_WAM.py:841``,
    defect register) — parity tests neutralize them on the torch side.
    """
    ng, nb = (6, 12) if is_high else (4, 8)
    _map_conv(out, sd, "HAN.head.0", "han/head")
    for g in range(ng):
        for r in range(nb):
            base = f"HAN.body.{g}.body.{r}.body"
            fk = f"han/group{g}/rcab{r}"
            _map_conv(out, sd, f"{base}.0", f"{fk}/c0")
            _map_conv(out, sd, f"{base}.2", f"{fk}/c1")
            _map_conv(out, sd, f"{base}.3.conv_du.0", f"{fk}/ca/fc0")
            _map_conv(out, sd, f"{base}.3.conv_du.2", f"{fk}/ca/fc1")
        _map_conv(out, sd, f"HAN.body.{g}.body.{nb}", f"han/group{g}/tail")
    _map_conv(out, sd, f"HAN.body.{ng}", "han/body_tail")
    # CSAM: torch Conv3d weight (1, 1, D, H, W) → ours (D, H, W, 1, 1)
    _set(out, "han/csa/conv", sd.pop("HAN.csa.conv.weight").transpose(2, 3, 4, 0, 1))
    _set(out, "han/csa/bias", sd.pop("HAN.csa.conv.bias"))
    _set(out, "han/csa/gamma", sd.pop("HAN.csa.gamma"))
    _set(out, "han/la/gamma", sd.pop("HAN.la.gamma"))
    _map_conv(out, sd, "HAN.last_conv", "han/last_conv")
    _map_conv(out, sd, "HAN.last", "han/last")
    for k in (
        "HAN.sub_mean.weight", "HAN.sub_mean.bias",
        "add_mean.weight", "add_mean.bias",
    ):
        sd.pop(k, None)
    for j, fc in ((0, "fc0"), (2, "fc1"), (4, "fc2")):
        _map_linear(
            out, sd, f"conv_weights_gen_HAN.transform.{j}",
            f"conv_weights_gen_han/{fc}",
        )


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="reference .ckpt/.pt path")
    ap.add_argument("--out", required=True, help="output params npz")
    ap.add_argument("--is_high", action="store_true")
    ap.add_argument(
        "--preset", default="source_net_wam",
        choices=("source_net_wam", "net_ga"),
        help="which reference model the checkpoint comes from",
    )
    args = ap.parse_args()

    import torch
    import jax

    from lic_tpu.models import build_model
    from lic_tpu.utils.checkpoint import save_params

    sd = torch.load(args.ckpt, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model = build_model(args.preset, is_high=args.is_high)
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = jax.eval_shape(
        lambda k: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, x, training=True
        ),
        jax.random.PRNGKey(0),
    )["params"]
    template = jax.tree.map(
        lambda s: np.zeros(s.shape, np.float32), template
    )
    importer = {
        "source_net_wam": import_source_net_wam,
        "net_ga": import_net_ga,
    }[args.preset]
    params = importer(sd, template)
    save_params(args.out, params)
    print(f"imported {args.ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
