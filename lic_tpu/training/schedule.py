"""Learning-rate schedules.

* ``multistep`` — MultiStepLR×γ at epoch milestones, the schedule both
  reference phases actually use (``train_net_unet.py:129,133``).
* ``warmup_*`` — cosine / stage-decay / linear with linear warmup: the
  capability of the reference's unused ``LearningRateScheduler``
  (``model/util.py:96-157``), exposed as optax schedules.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import optax


def multistep(
    base_lr: float,
    milestones_epochs: Sequence[int],
    steps_per_epoch: int,
    gamma: float = 0.5,
) -> optax.Schedule:
    # cap at int32 (optimizer step counters are int32; larger boundaries
    # would overflow jit argument parsing)
    cap = 2 ** 31 - 1
    boundaries = {
        min(int(m) * steps_per_epoch, cap): gamma for m in milestones_epochs
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def warmup_cosine(
    base_lr: float, total_steps: int, warmup_steps: int = 0, end_lr: float = 0.0
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        # warmup_steps=0 means NO warmup: step 0 starts at base_lr
        init_value=base_lr if warmup_steps <= 0 else 0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=total_steps,
        end_value=end_lr,
    )


def warmup_stagedecay(
    base_lr: float,
    stage_steps: Sequence[int],
    stage_decay: float,
    warmup_steps: int = 0,
) -> optax.Schedule:
    stages = sorted(int(s) for s in stage_steps)

    def sched(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        # warmup_steps=0 means NO warmup: step 0 must use base_lr, not 0
        warm = (
            1.0 if warmup_steps <= 0
            else jnp.minimum(step / warmup_steps, 1.0)
        )
        n_past = jnp.sum(jnp.asarray([step >= s for s in stages]), axis=0)
        return base_lr * warm * (stage_decay ** n_past)

    return sched


def warmup_linear(
    base_lr: float, total_steps: int, warmup_steps: int = 0
) -> optax.Schedule:
    def sched(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        warm = (
            1.0 if warmup_steps <= 0
            else jnp.minimum(step / warmup_steps, 1.0)
        )
        frac = jnp.clip(1.0 - step / total_steps, 0.0, 1.0)
        return base_lr * warm * frac

    return sched
