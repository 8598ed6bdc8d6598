"""Multi-host scale-out.

The reference's only distribution mechanism is single-process
``nn.DataParallel`` (``train_net_unet.py:152``).  Multi-host here is the
standard JAX recipe: ``jax.distributed.initialize`` connects the hosts over
DCN, after which the same mesh/pjit code path spans all processes — the
data mesh simply covers ``jax.device_count()`` global devices and gradient
psums ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the multi-host cluster.

    With NO explicit arguments this is idempotent-safe: a single-process
    setup with no cluster env configuration no-ops.  With explicit
    arguments a failure RE-RAISES — swallowing it would silently degrade
    a pod launch into N independent single-host trainings (wrong global
    batch, duplicate work, checkpoints overwriting each other)."""
    explicit = any(
        v is not None for v in (coordinator_address, num_processes, process_id)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        if explicit:
            raise
        # single-host run (no coordinator configured)
        pass


def global_mesh_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
