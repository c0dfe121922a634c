"""Spherical-shell sampling of the hidden volume for confocal transients.

Reimplements `spherical_sample_histogram` (reference `nlos_helpers.py:124-188`)
with static shapes: for a scan point on the visible wall, build a
(num_bins, ns, ns) grid over (radius r <-> time bin, polar theta, azimuth phi),
where the angular bounds are the min/max spherical coordinates of the hidden
volume's 8 box corners as seen from the scan point.

All shapes depend only on static config (start, end, num_sampling_points);
the *values* (angular bounds) depend on the traced camera position — jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from nlos_gaussian_renderer_tpu.ops import math as gmath


class ShellGrid(NamedTuple):
    """Sampling grid for one scan point.

    Attributes:
      points: (num_r, ns, ns, 3) world-space sample positions.
      r: (num_r,) radii (= bin distances, r_k = bin_index * c * deltaT).
      theta: (ns,) polar angles; phi: (ns,) azimuths.
      dtheta, dphi: scalar angular steps ((max-min)/ns, reference semantics).
      theta_min, theta_max, phi_min, phi_max: scalar angular bounds.
    """

    points: jnp.ndarray
    r: jnp.ndarray
    theta: jnp.ndarray
    phi: jnp.ndarray
    dtheta: jnp.ndarray
    dphi: jnp.ndarray
    theta_min: jnp.ndarray
    theta_max: jnp.ndarray
    phi_min: jnp.ndarray
    phi_max: jnp.ndarray


def shell_grid(
    camera_pos,
    box_points,
    num_sampling_points: int,
    start: int,
    end: int,
    c: float,
    delta_t: float,
) -> ShellGrid:
    """Build the spherical sampling grid for one confocal scan point.

    Args:
      camera_pos: (3,) scan position on the visible wall.
      box_points: (8, 3) hidden-volume cube corners (world space).
      num_sampling_points: angular resolution ns (static).
      start, end: time-bin window (static); num_r = end - start.
      c, delta_t: light speed and bin duration; r = bin * c * delta_t.

    Returns:
      ShellGrid with (num_r, ns, ns, 3) world-space points.

    Reference parity notes (`nlos_helpers.py:145-188`):
      - angular bounds from the 8 corners shifted to the camera frame,
      - theta/phi/r are inclusive linspaces over [min, max] with ns / num_r
        points; dtheta = (max-min)/ns (not ns-1),
      - I1 == start and I2 == end exactly (floor/ceil of integer products).
    """
    camera_pos = jnp.asarray(camera_pos)
    ns = num_sampling_points
    num_r = end - start

    rel = jnp.asarray(box_points) - camera_pos[None, :]
    sph = gmath.cartesian_to_spherical(rel)  # (8, 3)
    theta_min = jnp.min(sph[:, 1])
    theta_max = jnp.max(sph[:, 1])
    phi_min = jnp.min(sph[:, 2])
    phi_max = jnp.max(sph[:, 2])

    theta = jnp.linspace(theta_min, theta_max, ns)
    phi = jnp.linspace(phi_min, phi_max, ns)
    dtheta = (theta_max - theta_min) / ns
    dphi = (phi_max - phi_min) / ns

    r_min = start * c * delta_t
    r_max = end * c * delta_t
    r = jnp.linspace(r_min, r_max, num_r)

    sin_t = jnp.sin(theta)
    # Unit ray directions (ns, ns, 3) over (theta, phi).
    dirs = jnp.stack(
        [
            sin_t[:, None] * jnp.cos(phi)[None, :],
            sin_t[:, None] * jnp.sin(phi)[None, :],
            jnp.cos(theta)[:, None] * jnp.ones((1, ns)),
        ],
        axis=-1,
    )
    points = r[:, None, None, None] * dirs[None] + camera_pos
    return ShellGrid(
        points=points,
        r=r,
        theta=theta,
        phi=phi,
        dtheta=dtheta,
        dphi=dphi,
        theta_min=theta_min,
        theta_max=theta_max,
        phi_min=phi_min,
        phi_max=phi_max,
    )


def attenuation_weights(grid: ShellGrid) -> jnp.ndarray:
    """Per-(bin, ray) radiometric attenuation sin(theta) / distance^2.

    The reference recomputes distance as linspace(I1, I2, num_r)*deltaT*c
    (`nlos_helpers.py:219-225`), which equals the r grid exactly.

    Returns:
      (num_r, ns*ns) weights.
    """
    ns = grid.theta.shape[0]
    distance = grid.r  # == linspace(I1, I2, num_r) * c * delta_t
    sin_theta = jnp.sin(grid.theta)[:, None] * jnp.ones((1, ns))  # (ns, ns)
    return sin_theta.reshape(1, ns * ns) / (distance[:, None] ** 2)
