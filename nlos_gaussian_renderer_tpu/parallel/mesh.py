"""Device mesh construction for multi-chip NLOS training.

The reference is single-GPU only (SURVEY.md §2.3). The TPU-native parallel
surface for this workload:

  - `scan` axis: data parallelism over confocal scan points (the batch axis).
    Gradients are reduced with one psum — the only communication per step.
  - `gauss` axis: the Gaussian population is sharded; each shard renders its
    partial field and the per-sample fields are psum-reduced. Exact for every
    mode whose per-sample field is a sum over Gaussians (the default
    no-occlusion path and the aggregate-occlusion density), since the
    histogram is linear in the Gaussian population.

Collectives ride ICI via jax.shard_map + psum; DCN is never required for the
training step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("scan", "gauss"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a Mesh over the available devices.

    Args:
      axis_sizes: sizes per axis; default puts all devices on the first axis.
      axis_names: mesh axis names; default ('scan', 'gauss').
      devices: devices to use (default jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    axis_sizes = list(axis_sizes)
    assert int(np.prod(axis_sizes)) == n, (
        f"mesh {axis_sizes} does not cover {n} devices"
    )
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))
