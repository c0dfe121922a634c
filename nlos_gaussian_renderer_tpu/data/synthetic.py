"""Synthetic confocal NLOS scene generator.

Renders ground-truth transients for a procedurally-placed Gaussian scene using
this package's own forward model, producing an `NLOSData` with the Zaragoza
schema — so tests, benchmarks, and end-to-end training never require the real
dataset (the reference's loader and data are absent from its repo).

Geometry convention (matches the Zaragoza setup implied by the reference):
the visible wall is the y=0 plane scanned over an (x, z) grid; the hidden
volume sits at positive y (so `volume_position[1]` — the mysterious radiometric
factor — is the wall-to-volume distance).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData
from nlos_gaussian_renderer_tpu.models.scene import GaussianScene, init_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.render import RenderSettings, render_histogram


def make_scan_grid(m: int, n: int, grid_half_extent: float = 0.4) -> np.ndarray:
    """(3, M*N) scan positions on the y=0 wall over an (x, z) grid."""
    xs = np.linspace(-grid_half_extent, grid_half_extent, m)
    zs = np.linspace(-grid_half_extent, grid_half_extent, n)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    pos = np.stack([xx.ravel(), np.zeros(m * n), zz.ravel()], axis=0)
    return pos.astype(np.float32)


def make_ground_truth_scene(
    rng: np.random.Generator,
    num_gaussians: int,
    volume_position: np.ndarray,
    volume_size: float,
    max_sh_degree: int = 0,
) -> GaussianScene:
    """A random Gaussian blob cluster inside the hidden volume."""
    half = 0.3 * volume_size
    points = volume_position[None, :] + rng.uniform(
        -half, half, size=(num_gaussians, 3)
    )
    rho = rng.uniform(0.3, 0.9, size=(num_gaussians, 1))
    scene = init_scene(
        points.astype(np.float32),
        rho.astype(np.float32),
        pmin=volume_position - volume_size / 2,
        pmax=volume_position + volume_size / 2,
        max_sh_degree=max_sh_degree,
        knn_scale_init=False,
    )
    # Give the GT scene solid opacities and visible scales.
    sigma = 0.06 * volume_size
    scene = GaussianScene(
        means=scene.means,
        log_scales=jnp.full_like(scene.log_scales, np.log(sigma)),
        quats=scene.quats,
        logit_opacities=jnp.full_like(scene.logit_opacities, gmath.inverse_sigmoid(0.8)),
        sh_dc=scene.sh_dc,
        sh_rest=scene.sh_rest,
        alive=scene.alive,
    )
    return scene


def make_synthetic_dataset(
    seed: int = 0,
    scan_m: int = 8,
    scan_n: int = 8,
    num_bins: int = 128,
    num_gt_gaussians: int = 16,
    volume_distance: float = 1.0,
    volume_size: float = 0.6,
    num_sampling_points: int = 16,
    start: Optional[int] = None,
    end: Optional[int] = None,
    settings: Optional[RenderSettings] = None,
    return_scene: bool = False,
):
    """Generate a synthetic confocal dataset by forward-rendering a GT scene.

    The total number of time bins L = num_bins; the rendered/supervised window
    [start, end) defaults to bins that bracket the volume's radial extent.

    Returns:
      NLOSData (and the GT GaussianScene if return_scene).
    """
    rng = np.random.default_rng(seed)
    volume_position = np.array([0.0, volume_distance, 0.0], dtype=np.float32)
    c = 1.0
    # Radial window covered by the volume from the farthest scan corner, with
    # margin; choose deltaT so the full volume fits inside [0, num_bins).
    r_far = volume_distance + volume_size
    delta_t = float(r_far * 1.25 / num_bins)
    if start is None:
        start = max(int((volume_distance - volume_size) / (c * delta_t)) - 2, 1)
    if end is None:
        end = min(int(r_far / (c * delta_t)) + 2, num_bins)

    if settings is None:
        settings = RenderSettings(
            num_sampling_points=num_sampling_points, start=start, end=end
        )
    else:
        settings = settings._replace(start=start, end=end)

    scene = make_ground_truth_scene(
        rng, num_gt_gaussians, volume_position, volume_size
    )
    box_points = gmath.volume_box_points(volume_position, volume_size)
    cam_grid = make_scan_grid(scan_m, scan_n)

    render = jax.jit(
        jax.vmap(
            lambda cam: render_histogram(
                scene,
                cam,
                box_points,
                c,
                delta_t,
                volume_position,
                scene.max_sh_degree,
                settings,
            )
        )
    )
    # Chunk the scan points: the dense GT render materializes an
    # (ns^2 * num_r, N_gt) matrix per camera, so a 256x256 scan grid vmapped
    # whole would need tens of GB. 256 cams/dispatch keeps it ~1 GB while
    # still feeding the MXU full batches; the pad rides the last chunk.
    cams_all = np.asarray(cam_grid.T, dtype=np.float32)  # (MN, 3)
    mn = cams_all.shape[0]
    cam_chunk = min(256, mn)
    pad = (-mn) % cam_chunk
    cams_pad = np.concatenate([cams_all, cams_all[:1].repeat(pad, 0)], 0)
    hists = np.concatenate(
        [
            np.asarray(render(jnp.asarray(cams_pad[i : i + cam_chunk])))
            for i in range(0, mn + pad, cam_chunk)
        ],
        axis=0,
    )[:mn]  # (MN, num_r)

    nlos = np.zeros((num_bins, scan_m, scan_n), dtype=np.float32)
    nlos[start:end] = hists.T.reshape(end - start, scan_m, scan_n)

    data = NLOSData(
        nlos_data=nlos,
        camera_position=np.array([0.0, -1.0, 0.0], dtype=np.float32),
        camera_grid_size=np.array([0.8, 0.8], dtype=np.float32),
        camera_grid_positions=cam_grid,
        camera_grid_points=np.array([scan_m, scan_n], dtype=np.int32),
        volume_position=volume_position,
        volume_size=float(volume_size),
        deltaT=delta_t,
        c=c,
    )
    if return_scene:
        return data, scene
    return data
