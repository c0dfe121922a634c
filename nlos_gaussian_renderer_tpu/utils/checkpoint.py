"""Checkpoint save / restore (orbax).

Replaces the reference's `torch.save` of raw parameter tensors + a pickled
optimizer object (`nlos_helpers.py:30-38`, `gaussian_model.py:63-103`) with
orbax checkpointing of the full TrainState pytree (scene + optimizer state +
step + SH annealing state) — and, unlike the reference (which only restores
for evaluation, never into training, SURVEY.md §5), restoring here resumes
training exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from nlos_gaussian_renderer_tpu.train import TrainState


def _pack(tree):
    """Orbax rejects zero-size arrays (e.g. sh_rest at sh_degree=0) — swap
    them for a 1-element placeholder; `restore_checkpoint` swaps back."""
    return jax.tree.map(
        lambda x: np.zeros((1,), np.asarray(x).dtype) if np.asarray(x).size == 0 else x,
        tree,
    )


def save_checkpoint(path: str, state: TrainState, step: Optional[int] = None) -> str:
    """Save the TrainState under `path/<step>` (like `model/current_iter{N}`)."""
    step = int(state.step) if step is None else step
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        target = os.path.join(path, f"step_{step}")
        ckptr.save(target, _pack(jax.device_get(state)), force=True)
    return target


def restore_checkpoint(target: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by `save_checkpoint`.

    Args:
      target: path returned by save_checkpoint.
      template: a TrainState with matching structure/shapes (e.g. freshly
        created via `create_train_state`), used as the abstract target.
    """
    template = jax.device_get(template)
    abstract = jax.tree.map(
        ocp.utils.to_shape_dtype_struct, _pack(template)
    )
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(target), abstract)
    # Swap zero-size placeholders back to the template's empty arrays.
    return jax.tree.map(
        lambda t, r: t if np.asarray(t).size == 0 else r, template, restored
    )


def latest_checkpoint(path: str) -> Optional[str]:
    """Latest `step_*` checkpoint directory under path, or None."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(path, max(steps)[1])
