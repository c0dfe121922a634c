"""Unit tests for core math: quaternions, SH, coordinates, quadratic forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.ops import math as gmath


def rand(*shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, size=shape).astype(np.float32))


class TestQuatToRotmat:
    def test_identity(self):
        r = gmath.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)

    def test_90deg_about_z(self):
        # q = (cos45, 0, 0, sin45) rotates x -> y.
        s = np.sin(np.pi / 4)
        r = gmath.quat_to_rotmat(jnp.array([[np.cos(np.pi / 4), 0, 0, s]]))[0]
        np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_orthonormal_and_det1(self):
        q = rand(64, 4, seed=1)
        r = np.asarray(gmath.quat_to_rotmat(q))
        np.testing.assert_allclose(
            r @ r.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(r), np.ones(64), atol=1e-5)

    def test_zero_quat_identity_fallback(self):
        # CUDA fallback semantics (cuda_utils.cuh:62-70): no NaNs.
        r = gmath.quat_to_rotmat(jnp.zeros((1, 4)))
        np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)

    def test_unnormalized_input_normalized(self):
        q = jnp.array([[2.0, 0, 0, 0]])
        np.testing.assert_allclose(gmath.quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)


class TestSphericalHarmonics:
    def unit_dirs(self, n=2048, seed=0):
        # Normalized Gaussian samples are uniform on the sphere (cube-uniform
        # samples are not — they would bias the Gram matrix).
        v = np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32)
        return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))

    def test_deg0_constant(self):
        sh = rand(5, 1, seed=2)
        dirs = self.unit_dirs(5)
        out = gmath.eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, gmath.C0 * sh[:, 0], rtol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_basis_orthonormality(self, deg):
        # Real SH are orthonormal on the sphere: MC estimate of
        # 4*pi*mean(b_i b_j) ~= delta_ij.
        dirs = self.unit_dirs(200_000, seed=3)
        b = np.asarray(gmath.eval_sh_basis(dirs, deg))
        gram = 4 * np.pi * (b.T @ b) / b.shape[0]
        np.testing.assert_allclose(gram, np.eye(b.shape[1]), atol=0.06)

    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_dynamic_matches_static(self, deg):
        k_max = (4 + 1) ** 2
        sh = rand(16, k_max, seed=4)
        dirs = self.unit_dirs(16, seed=5)
        static = gmath.eval_sh(deg, sh, dirs)
        dynamic = gmath.eval_sh_dynamic(sh, dirs, jnp.asarray(deg), 4)
        np.testing.assert_allclose(static, dynamic, rtol=2e-5, atol=1e-6)

    def test_rho_sh_roundtrip(self):
        rho = rand(32, seed=6, lo=0.0, hi=1.0)
        np.testing.assert_allclose(
            gmath.sh_to_rho(gmath.rho_to_sh(rho)), rho, rtol=1e-5, atol=1e-7
        )
        # DC-only SH evaluates back to the albedo: C0 * (rho-0.5)/C0 + 0.5.
        sh = gmath.rho_to_sh(rho)[:, None]
        vals = gmath.eval_sh(0, sh, jnp.zeros((32, 3)))
        np.testing.assert_allclose(vals + 0.5, rho, rtol=1e-5)


class TestCoordinates:
    def test_roundtrip(self):
        pts = rand(128, 3, seed=7, lo=-2, hi=2) + jnp.array([0.0, 3.0, 0.0])
        sph = gmath.cartesian_to_spherical(pts)
        back = gmath.spherical_to_cartesian(sph)
        np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-5)

    def test_known_point(self):
        sph = gmath.cartesian_to_spherical(jnp.array([[0.0, 0.0, 2.0]]))
        np.testing.assert_allclose(sph[0], [2.0, 0.0, 0.0], atol=1e-6)
        sph = gmath.cartesian_to_spherical(jnp.array([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(sph[0], [1.0, np.pi / 2, 0.0], atol=1e-6)

    def test_volume_box_points(self):
        box = np.asarray(gmath.volume_box_points(jnp.array([1.0, 2.0, 3.0]), 2.0))
        assert box.shape == (8, 3)
        np.testing.assert_allclose(box.min(axis=0), [0, 1, 2], atol=1e-6)
        np.testing.assert_allclose(box.max(axis=0), [2, 3, 4], atol=1e-6)
        assert len({tuple(r) for r in box.tolist()}) == 8


class TestQuadraticForm:
    def test_matmul_matches_direct(self):
        n, a = 64, 256
        means = rand(n, 3, seed=8)
        scales = jnp.exp(rand(n, 3, seed=9, lo=-3, hi=-0.5))
        quats = rand(n, 4, seed=10)
        pts = rand(a, 3, seed=11, lo=-1.5, hi=1.5)

        direct = gmath.mahalanobis_direct(pts, means, scales, quats)
        gfeat = gmath.gaussian_quadratic_form(means, scales, quats)
        xfeat = gmath.point_monomials(pts)
        via_matmul = gmath.mahalanobis_matmul(xfeat, gfeat)
        # Both paths use Precision.HIGHEST — agreement is at f32 rounding level.
        np.testing.assert_allclose(via_matmul, direct, rtol=1e-4, atol=1e-4)

    def test_zero_at_mean(self):
        means = rand(8, 3, seed=12)
        scales = jnp.exp(rand(8, 3, seed=13, lo=-2, hi=0))
        quats = rand(8, 4, seed=14)
        gfeat = gmath.gaussian_quadratic_form(means, scales, quats)
        xfeat = gmath.point_monomials(means)
        m = np.asarray(gmath.mahalanobis_matmul(xfeat, gfeat))
        np.testing.assert_allclose(np.diagonal(m), 0.0, atol=1e-2)

    def test_isotropic_closed_form(self):
        # For isotropic scale s and any rotation, maha = |x-mu|^2 / s^2.
        mu = jnp.array([[0.2, -0.1, 0.4]])
        s = 0.3
        scales = jnp.full((1, 3), s)
        quats = rand(1, 4, seed=15)
        pts = rand(32, 3, seed=16)
        direct = gmath.mahalanobis_direct(pts, mu, scales, quats)
        expected = jnp.sum((pts - mu) ** 2, axis=-1, keepdims=True) / s**2
        np.testing.assert_allclose(direct, expected, rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        means = rand(4, 3, seed=17)
        scales = jnp.exp(rand(4, 3, seed=18, lo=-2, hi=0))
        quats = rand(4, 4, seed=19)
        pts = rand(16, 3, seed=20)

        def loss(m, s, q):
            g = gmath.gaussian_quadratic_form(m, s, q)
            x = gmath.point_monomials(pts)
            return jnp.sum(jnp.exp(-0.5 * gmath.mahalanobis_matmul(x, g)))

        grads = jax.grad(loss, argnums=(0, 1, 2))(means, scales, quats)
        for g in grads:
            assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(grads[0]).max()) > 0


class TestCovariance:
    def test_covariance_psd_and_eigvals(self):
        scales = jnp.exp(rand(16, 3, seed=21, lo=-2, hi=0))
        quats = rand(16, 4, seed=22)
        cov = np.asarray(gmath.build_covariance(scales, quats))
        eig = np.linalg.eigvalsh(cov)
        np.testing.assert_allclose(
            np.sort(eig, axis=-1), np.sort(np.asarray(scales) ** 2, axis=-1), rtol=1e-4
        )

    def test_strip_symmetric(self):
        cov = gmath.build_covariance(
            jnp.exp(rand(4, 3, seed=23)), rand(4, 4, seed=24)
        )
        out = np.asarray(gmath.strip_symmetric(cov))
        np.testing.assert_allclose(out[:, 0], np.asarray(cov)[:, 0, 0])
        np.testing.assert_allclose(out[:, 5], np.asarray(cov)[:, 2, 2])
