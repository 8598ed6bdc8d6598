"""Real bitstreams: host-side C++ rANS + device-computed CDF tables.

The reference never emits an actual bitstream (its bpp is likelihood-
estimated; CompressAI's ``.compress()`` is never called — SURVEY.md §2.7).
This package supplies that capability the TPU way: CDF tables are computed
on device from the trained entropy models, quantized on host, and coded by
a small C++ rANS core bound via ctypes.
"""

from .rans import RansCodec, pmf_to_quantized_cdf
from .codec import CodecCoder

__all__ = ["RansCodec", "pmf_to_quantized_cdf", "CodecCoder"]
