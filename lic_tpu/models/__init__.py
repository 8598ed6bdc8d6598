"""Codec models (L3): one configurable core instead of ten 1k-line clones.

``CodecModel`` composes pluggable analysis/synthesis transforms, hyper
paths, entropy machinery, neural-syntax decoding and HAN post-processing;
``presets`` maps each reference ``Net`` file to a ``CodecConfig``.
"""

from .codec import CodecModel, CodecOutput
from .presets import PRESETS, build_model, get_config

__all__ = ["CodecModel", "CodecOutput", "PRESETS", "build_model", "get_config"]
