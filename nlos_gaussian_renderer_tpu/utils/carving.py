"""Space-carving initialization (vectorized).

Reimplements the reference's nlos-neus-derived carving
(`gaussian_model/gaussian_utils.py:38-129`):
  1. detect the first-bounce time bin per scan pixel (first finite-difference
     rise above a threshold),
  2. vote: a carving-grid voxel is "outside" for a scan point if it is farther
     than that scan point's first-bounce radius; voxels outside for (almost)
     every scan point are feasible surface candidates,
  3. jittered resampling of feasible voxels into Gaussian init points
     (`utils/init.py:sample_from_feasible_space_jittering`).

The reference loops over pixels in Python (`detect_first_bounces`) and over
scan points one-by-one (`space_carving`); here both are batched array ops —
the voting is a chunked (voxels x scan-points) distance test on device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData


def detect_first_bounces(transient: np.ndarray, threshold: float = 1e-5) -> np.ndarray:
    """First bin where the histogram rises by > threshold, per scan pixel.

    Matches reference semantics (`gaussian_utils.py:38-50`): scans b from 1;
    returns 0 for pixels with an all-zero histogram or no rise.

    Args:
      transient: (L, M, N).
    Returns:
      (M, N) float bin indices.
    """
    diff = np.diff(transient, axis=0) > threshold  # (L-1, M, N)
    any_rise = diff.any(axis=0)
    first = diff.argmax(axis=0) + 1  # bin index of transient[b] - transient[b-1]
    nonzero = transient.sum(axis=0) != 0
    return np.where(any_rise & nonzero, first, 0).astype(np.float32)


def space_carving(
    data: NLOSData,
    carving_volume_size: int,
    ratio: float = 0.99,
    start: int = 0,
    threshold: float = 1e-5,
) -> np.ndarray:
    """Carve the hidden volume; return feasible voxel centers (world space).

    Matches `space_carving` (`gaussian_utils.py:53-129`): voxels farther than
    the first-bounce sphere of a scan point get that point's vote; voxels with
    votes > ratio * max_votes survive.

    Returns:
      (K, 3) feasible voxel centers (K >= 1; falls back to the volume center
      when carving eliminates everything).
    """
    vol_pos = np.asarray(data.volume_position, dtype=np.float32)
    vol_size = float(data.volume_size)
    cams = np.asarray(data.camera_grid_positions, dtype=np.float32)  # (3, MN)
    cams_shifted = cams - vol_pos[:, None]

    radii = detect_first_bounces(data.nlos_data[start:], threshold) + start
    radii = (radii * data.c * data.deltaT).reshape(-1)  # (MN,)

    s = carving_volume_size
    axis = np.linspace(-vol_size / 2, vol_size / 2, s, dtype=np.float32)
    coords = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1).reshape(-1, 3)

    if not np.any(radii > 0):
        return (coords + vol_pos).astype(np.float32)

    # Native C++ voter (csrc/nlos_native.cpp) with a NumPy fallback inside.
    from nlos_gaussian_renderer_tpu import native

    votes = native.space_carving_votes(
        coords, cams_shifted.T.astype(np.float32), radii.astype(np.float32)
    ).astype(np.int64)

    vote_threshold = votes.max() * ratio
    feasible = coords[votes > vote_threshold]
    if len(feasible) == 0:
        feasible = np.zeros((1, 3), dtype=np.float32)
    return (feasible + vol_pos).astype(np.float32)


def carved_init_points(
    data: NLOSData,
    rng: np.random.Generator,
    num: int,
    carving_volume_size: int,
    ratio: float = 0.99,
    rho_scale: float = 0.1,
    exact_mesh_sampling: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Space-carving + resampling init (reference
    `sample_from_feasible_space_jittering`, `gaussian_utils.py:131-166`).

    `exact_mesh_sampling` mirrors the reference's optional branch
    (`gaussian_utils.py:146-154`): mesh the carved set and sample ON the
    surface instead of jittering voxel centers (surface-nets replaces the
    open3d Poisson reconstruction)."""
    from nlos_gaussian_renderer_tpu.utils.init import (
        sample_from_feasible_space_jittering,
        sample_from_feasible_surface,
    )

    feasible = space_carving(data, carving_volume_size, ratio)
    pmin = data.volume_position - data.volume_size / 2
    pmax = data.volume_position + data.volume_size / 2
    sampler = (
        sample_from_feasible_surface if exact_mesh_sampling
        else sample_from_feasible_space_jittering
    )
    return sampler(
        rng, num, feasible, pmin, pmax, carving_volume_size, rho_scale=rho_scale
    )
