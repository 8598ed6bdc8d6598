"""lic_tpu — TPU-native learned image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``xiaobucc/learning-driven-image-compression-algorithm`` (the "reference",
a PyTorch/CUDA research codebase in the Neural-Syntax / ChARM lineage).

The reference's ~10 copy-pasted 1k-line ``Net`` files collapse here into a
single configurable codec core (`lic_tpu.models`) plus a preset registry
(`lic_tpu.models.presets`) — one preset per reference model file.

Layout (NHWC everywhere — TPU native), functional JAX (flax.linen),
explicit PRNG threading for noise quantization, `jax.sharding.Mesh` +
pjit for multi-chip scaling, and host-side C++ rANS for real bitstreams.
"""

__version__ = "0.1.0"
