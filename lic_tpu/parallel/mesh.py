"""Device mesh + sharding rules (the reference's only distribution mechanism
is single-process ``nn.DataParallel``, ``train_net_unet.py:152``).

TPU-native equivalents:

* data parallelism — batch sharded over the ``data`` mesh axis, parameters
  replicated; XLA inserts the gradient ``psum`` over ICI automatically when
  the jitted loss is differentiated under these shardings (no NCCL, no
  scatter/gather step like DataParallel).
* spatial parallelism — for full-resolution eval of large images, the NHWC
  height axis can be sharded over the ``spatial`` axis; XLA materializes
  halo exchanges for the conv stencils as ICI collectives.
* multi-host — ``jax.distributed.initialize()`` before mesh construction
  extends the same code path over DCN; nothing else changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D data mesh by default; pass ``axis_names=('data','spatial')`` and
    ``shape`` for a 2-D mesh.

    Asking for more devices than exist raises (a silent clamp would train
    on fewer chips than requested with no warning).  Multi-dimensional
    meshes over real TPUs go through ``mesh_utils.create_device_mesh`` so
    the axes respect the physical ICI topology (a naive reshape can place
    a halo-exchange axis across DCN); the virtual CPU platform keeps the
    deterministic reshape the tests rely on."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if (
        len(axis_names) > 1
        and devices
        and devices[0].platform not in ("cpu",)
        and n_devices in (None, len(jax.devices()))
    ):
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(
                tuple(shape), devices=devices
            )
            return Mesh(dev_array, axis_names)
        except Exception:
            pass  # fall back to the deterministic reshape
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh, axis: str = "spatial") -> NamedSharding:
    """Shard NHWC height over the given axis (large-image eval)."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))
