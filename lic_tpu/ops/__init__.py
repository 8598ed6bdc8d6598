"""Differentiable-quantization ops (L1 of the reference layer map).

STE bound/rounding primitives with gradients that are bit-exact (fp32)
with the PyTorch reference (``/root/reference/ops/bound_ops.py``,
``ops/ops.py``, ``ops/parametrizers.py``, ``model/net.py:416-426``,
``model/Net_unet.py:295-308``).
"""

from .bounds import (
    lower_bound,
    upper_bound,
    NonNegativeParametrizer,
)
from .rounding import (
    additive_noise,
    ste_round,
    bypass_round,
    noise_quant,
    quantize_ste_offset,
)

__all__ = [
    "lower_bound",
    "upper_bound",
    "NonNegativeParametrizer",
    "additive_noise",
    "ste_round",
    "bypass_round",
    "noise_quant",
    "quantize_ste_offset",
]
