"""Orbax checkpointing: params + optimizer state + step + RNG.

The reference checkpoints only ``state_dict`` every 100 epochs and restarts
the epoch counter on resume (``train_net_unet.py:222-227,118-120``; SURVEY
§5.4).  Here the full train state round-trips, saves are async (Orbax), and
``load_params``/``save_params`` give the eval-style params-only path.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


class CheckpointManager:
    """Thin wrapper over Orbax StandardCheckpointer with numeric step dirs."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer() if ocp else None

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{step:06d}")

    def save(self, state: Any, step: int) -> None:
        if self._ckptr is None:
            raise RuntimeError("orbax unavailable")
        self._ckptr.save(self._path(step), state, force=True)

    def latest_step(self) -> Optional[int]:
        if not os.path.isdir(self.directory):
            return None
        steps = [
            int(d) for d in os.listdir(self.directory) if d.isdigit()
        ]
        return max(steps) if steps else None

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        if self._ckptr is None:
            raise RuntimeError("orbax unavailable")
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._ckptr.restore(self._path(step), target)

    def wait(self) -> None:
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()


def save_params(path: str, params: Any) -> None:
    """Params-only save as a flat .npz (portable, no Orbax dir layout)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        arrays[name] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_params(path: str, template: Any, strict: bool = True) -> Any:
    """Restore a params pytree saved by ``save_params`` into ``template``'s
    structure.

    strict=True mirrors the reference's strict ``load_state_dict``
    (``eval_net.py:91``): every template leaf must be present with the
    right shape.  strict=False keeps the template's (freshly initialized)
    leaf for any missing or shape-mismatched entry — used to warm-start a
    ``post_processing=True`` model (fresh HAN tail) from a base-phase
    checkpoint, the reference's two-phase workflow
    (``train_net_unet.py:118-134``)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    skipped = []
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if name not in data:
            if strict:
                raise KeyError(f"checkpoint missing parameter {name}")
            skipped.append(name)
            leaves.append(leaf)
            continue
        arr = data[name]
        if arr.shape != leaf.shape:
            if strict:
                raise ValueError(
                    f"shape mismatch for {name}: ckpt {arr.shape} vs model {leaf.shape}"
                )
            skipped.append(name)
            leaves.append(leaf)
            continue
        leaves.append(arr.astype(leaf.dtype) if hasattr(leaf, "dtype") else arr)
    if skipped:
        print(f"load_params: kept fresh init for {len(skipped)} leaves "
              f"(e.g. {skipped[0]})")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
