"""Core Gaussian / spherical-harmonics / coordinate math (pure jnp).

Behavioral reference (yhy258/nlos-gaussian-renderer):
  - quaternion -> rotation: `gaussian_model/gaussian_utils.py:189-210`
    (with the CUDA zero-norm identity fallback, `cuda_utils.cuh:54-85`)
  - SH evaluation deg 0-4: `gaussian_model/sh_utils.py:57-112`
  - coordinate transforms: `nlos_helpers.py:87-104`
  - volume box corners: `nlos_helpers.py:107-118`

TPU-first addition: `gaussian_quadratic_form` / `point_monomials` compile the
anisotropic Gaussian exponent into a rank-10 bilinear form so that evaluating
Ng Gaussians at Na points is a single (Na,10)x(10,Ng) matmul on the MXU, rather
than the reference's (Ng,Na,3) broadcasted subtraction (`gaussian_model.py:275-294`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --- Spherical harmonics constants (real SH, PlenOctree convention;
#     reference `sh_utils.py:26-54`) ---
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)

MAX_SH_DEGREE = 4


def inverse_sigmoid(x):
    """log(x / (1 - x)) — reference `gaussian_utils.py:171-172`."""
    return jnp.log(x / (1.0 - x))


def rho_to_sh(rho):
    """Albedo -> DC SH coefficient (reference `sh_utils.py:114-115`)."""
    return (rho - 0.5) / C0


def sh_to_rho(sh):
    """DC SH coefficient -> albedo (reference `sh_utils.py:117-118`)."""
    return sh * C0 + 0.5


def quat_to_rotmat(q, eps: float = 1e-12):
    """Quaternion (w, x, y, z) -> rotation matrix, batched over leading dims.

    Normalizes the quaternion first (reference `gaussian_utils.py:189-210`);
    a (near-)zero quaternion maps to the identity like the CUDA device code
    (`cuda_utils.cuh:62-70`) instead of producing NaNs.

    Args:
      q: (..., 4) array.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    identity_q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=q.dtype)
    q = jnp.where(norm > eps, q / jnp.maximum(norm, eps), identity_q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def sh_band_indices(max_degree: int) -> np.ndarray:
    """Band index l for each SH coefficient slot (host-side constant)."""
    k = (max_degree + 1) ** 2
    return np.floor(np.sqrt(np.arange(k))).astype(np.int32)


def eval_sh_basis(dirs, max_degree: int):
    """Real SH basis values at unit directions, deg 0..max_degree.

    Signs and constants match the reference polynomial evaluation exactly
    (`sh_utils.py:74-111`), so eval_sh == sum_k basis_k * sh_k.

    Args:
      dirs: (..., 3) unit directions.
      max_degree: static int in [0, 4].
    Returns:
      (..., (max_degree+1)**2) basis values.
    """
    assert 0 <= max_degree <= MAX_SH_DEGREE
    shape = dirs.shape[:-1]
    one = jnp.ones(shape, dtype=dirs.dtype)
    basis = [C0 * one]
    if max_degree > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        basis += [-C1 * y, C1 * z, -C1 * x]
    if max_degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if max_degree > 2:
        basis += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if max_degree > 3:
        basis += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(basis, axis=-1)


def eval_sh(deg: int, sh, dirs):
    """Evaluate SH expansion at unit directions with static degree.

    Matches reference `sh_utils.eval_sh` (`sh_utils.py:57-112`): uses the first
    (deg+1)**2 coefficients of `sh`.

    Args:
      deg: static int in [0, 4].
      sh: (..., K) coefficients with K >= (deg+1)**2.
      dirs: (..., 3) unit directions (broadcastable against sh's batch dims).
    Returns:
      (...,) values.
    """
    k = (deg + 1) ** 2
    assert sh.shape[-1] >= k
    basis = eval_sh_basis(dirs, deg)
    return jnp.sum(basis * sh[..., :k], axis=-1)


def eval_sh_dynamic(sh, dirs, active_degree, max_degree: int):
    """Evaluate SH with a *traced* active degree (for jit-stable annealing).

    Computes the full max_degree basis and masks out bands above
    `active_degree` — so SH-degree annealing (reference `oneupSHdegree`,
    `gaussian_model.py:180-182`) never changes compiled shapes.

    Args:
      sh: (..., K) with K == (max_degree+1)**2.
      dirs: (..., 3) unit directions.
      active_degree: traced int scalar.
      max_degree: static int.
    Returns:
      (...,) values.
    """
    basis = eval_sh_basis(dirs, max_degree)
    bands = jnp.asarray(sh_band_indices(max_degree))
    mask = (bands <= active_degree).astype(sh.dtype)
    return jnp.sum(basis * sh * mask, axis=-1)


def cartesian_to_spherical(pts):
    """(x, y, z) -> (r, theta, phi); theta = polar from +z, phi = atan2(y, x).

    Matches `cartesian2spherical_torch` (`nlos_helpers.py:87-95`).
    """
    r = jnp.linalg.norm(pts, axis=-1)
    theta = jnp.arccos(jnp.clip(pts[..., 2] / jnp.maximum(r, 1e-20), -1.0, 1.0))
    phi = jnp.arctan2(pts[..., 1], pts[..., 0])
    return jnp.stack([r, theta, phi], axis=-1)


def spherical_to_cartesian(pts):
    """(r, theta, phi) -> (x, y, z). Matches `nlos_helpers.py:98-104`."""
    r, theta, phi = pts[..., 0], pts[..., 1], pts[..., 2]
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [r * sin_t * jnp.cos(phi), r * sin_t * jnp.sin(phi), r * jnp.cos(theta)],
        axis=-1,
    )


def volume_box_points(volume_position, volume_size):
    """8 corner vertices of the hidden-volume cube (`nlos_helpers.py:107-118`).

    Args:
      volume_position: (3,) center.
      volume_size: scalar edge length.
    Returns:
      (8, 3) corners.
    """
    volume_position = jnp.asarray(volume_position)
    h = volume_size / 2.0
    signs = jnp.asarray(
        [
            [-1, -1, -1],
            [-1, -1, 1],
            [-1, 1, -1],
            [-1, 1, 1],
            [1, -1, -1],
            [1, -1, 1],
            [1, 1, -1],
            [1, 1, 1],
        ],
        dtype=volume_position.dtype,
    )
    return volume_position[None, :] + signs * h


# --- Quadratic-form compilation of the Gaussian exponent (TPU hot path) ---

QUADRATIC_DIM = 10


def gaussian_quadratic_form(means, scales, quats):
    """Compile each Gaussian's exponent into a 10-vector bilinear form.

    The (unnormalized) Gaussian exponent at point p is
        -0.5 * || diag(1/s) R (p - mu) ||^2  =  -0.5 * m(p)
    with R from `quat_to_rotmat`. Expanding the Mahalanobis term,
        m(p) = p^T A p - 2 (A mu)^T p + mu^T A mu,      A = R^T S^{-2} R,
    which is linear in the 10 monomials of `point_monomials`. Evaluating all
    Gaussians at all points therefore becomes one MXU matmul:
        maha[a, g] = point_monomials(p_a) @ gaussian_quadratic_form(g)[g].

    Args:
      means: (N, 3); scales: (N, 3) positive (post-activation); quats: (N, 4).
    Returns:
      (N, 10) rows [A00, A11, A22, 2*A01, 2*A02, 2*A12,
                    -2*(A mu)_x, -2*(A mu)_y, -2*(A mu)_z, mu^T A mu].
    """
    rot = quat_to_rotmat(quats)  # (N, 3, 3)
    inv_s = 1.0 / scales  # (N, 3)
    m = inv_s[..., :, None] * rot  # diag(1/s) @ R, (N, 3, 3)
    # Unrolled elementwise contractions (VPU): a batched-3x3 einsum would
    # lower to MXU matmuls padded 3 -> 128 — ruinous at N ~ 1e5 (measured
    # ~50 ms of a 120 ms train step before this rewrite).
    mc = [[m[..., k, i] for i in range(3)] for k in range(3)]

    def a_entry(i, j):
        return sum(mc[k][i] * mc[k][j] for k in range(3))

    a = [[a_entry(i, j) for j in range(3)] for i in range(3)]
    mu = [means[..., i] for i in range(3)]
    amu = [sum(a[i][j] * mu[j] for j in range(3)) for i in range(3)]
    muamu = sum(amu[i] * mu[i] for i in range(3))
    return jnp.stack(
        [
            a[0][0],
            a[1][1],
            a[2][2],
            2.0 * a[0][1],
            2.0 * a[0][2],
            2.0 * a[1][2],
            -2.0 * amu[0],
            -2.0 * amu[1],
            -2.0 * amu[2],
            muamu,
        ],
        axis=-1,
    )


def point_monomials(pts):
    """Rank-10 monomial features of points: the dual basis of
    `gaussian_quadratic_form`.

    Args:
      pts: (..., 3).
    Returns:
      (..., 10) rows [x^2, y^2, z^2, xy, xz, yz, x, y, z, 1].
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [x * x, y * y, z * z, x * y, x * z, y * z, x, y, z, one], axis=-1
    )


def mahalanobis_matmul(point_feats, gauss_feats, precision=jax.lax.Precision.HIGHEST):
    """Squared Mahalanobis distances via one matmul.

    Args:
      point_feats: (..., A, 10) from `point_monomials`.
      gauss_feats: (N, 10) from `gaussian_quadratic_form`.
    Returns:
      (..., A, N) squared Mahalanobis distances (clamped at 0 against
      floating-point cancellation).
    """
    m = jnp.einsum("...af,nf->...an", point_feats, gauss_feats, precision=precision)
    return jnp.maximum(m, 0.0)


def mahalanobis_direct(pts, means, scales, quats):
    """Reference (memory-heavy, numerically exact) Mahalanobis computation.

    Broadcasted (A, N, 3) difference form, mirroring the reference hot loop
    (`gaussian_model.py:275-294`) — used as the golden path in tests and as
    the small-N fallback.

    Args:
      pts: (A, 3); means: (N, 3); scales: (N, 3); quats: (N, 4).
    Returns:
      (A, N) squared Mahalanobis distances.
    """
    rot = quat_to_rotmat(quats)  # (N, 3, 3)
    diff = pts[:, None, :] - means[None, :, :]  # (A, N, 3)
    local = jnp.einsum(
        "nij,anj->ani", rot, diff, precision=jax.lax.Precision.HIGHEST
    )  # (A, N, 3)
    return jnp.sum((local / scales[None, :, :]) ** 2, axis=-1)


def build_covariance(scales, quats):
    """Covariance from scale + rotation: L = R @ diag(s), Cov = L L^T.

    Matches `build_scaling_rotation` + `build_covariance_from_scaling_rotation`
    (`gaussian_utils.py:212-221`, `gaussian_model.py:15-19`).

    Args:
      scales: (N, 3) post-activation; quats: (N, 4).
    Returns:
      (N, 3, 3) covariance matrices.
    """
    rot = quat_to_rotmat(quats)
    l = rot * scales[:, None, :]  # R @ diag(s)
    return jnp.einsum("nij,nkj->nik", l, l, precision=jax.lax.Precision.HIGHEST)


def strip_symmetric(cov):
    """Upper-triangular 6-vector of a symmetric 3x3 (`gaussian_utils.py:175-187`)."""
    return jnp.stack(
        [
            cov[:, 0, 0],
            cov[:, 0, 1],
            cov[:, 0, 2],
            cov[:, 1, 1],
            cov[:, 1, 2],
            cov[:, 2, 2],
        ],
        axis=-1,
    )
