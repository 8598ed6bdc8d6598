"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU-world analog of a fake backend — multi-chip sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices, so the full suite
is hardware-independent and fast.
"""

import os
import sys

# Must be set before jax is imported anywhere.  Force (not setdefault):
# the environment pre-sets JAX_PLATFORMS to the tunneled TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import lic_tpu` works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image's sitecustomize preloads jax with JAX_PLATFORMS=axon (the
# tunneled TPU), so the env var above can be too late — force via config
# (backends are still uninitialized at this point).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache — keeps repeated pytest runs fast.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
