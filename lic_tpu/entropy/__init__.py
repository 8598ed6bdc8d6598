"""Entropy models: conditional Gaussian, factorized prior, context predictors.

The reference only ever exercises the *likelihood* path of its entropy
models (estimated bpp; ``.compress()`` is never called —
``model/net_ga.py:857,746``).  This package provides the likelihood path
with matching semantics plus quantized-CDF table computation for the real
bitstream backend in ``lic_tpu.coding``.
"""

from .gaussian import GaussianModel, GaussianConditional
from .factorized import EntropyBottleneck

__all__ = [
    "GaussianModel",
    "GaussianConditional",
    "EntropyBottleneck",
]
