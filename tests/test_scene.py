"""Tests for the fixed-capacity GaussianScene pytree."""

import jax
import jax.numpy as jnp
import numpy as np

from nlos_gaussian_renderer_tpu.models.scene import (
    GaussianScene,
    _mean_knn_dist2,
    init_scene,
    scene_param_labels,
)


def make_points(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(n, 3)).astype(np.float32), rng.uniform(
        0.1, 0.9, size=(n, 1)
    ).astype(np.float32)


class TestInitScene:
    def test_shapes_and_activations(self):
        pts, rho = make_points(32)
        scene = init_scene(pts, rho, pmin=[-1, -1, -1], pmax=[1, 1, 1], max_sh_degree=3)
        assert scene.capacity == 32
        assert scene.max_sh_degree == 3
        assert scene.sh.shape == (32, 16)
        np.testing.assert_allclose(scene.means, pts, atol=1e-6)
        # Opacity init 0.1 (reference gaussian_model.py:213).
        np.testing.assert_allclose(scene.opacities, 0.1, rtol=1e-5)
        # Identity quats.
        np.testing.assert_allclose(scene.rotations[:, 0], 1.0, atol=1e-6)
        # DC coefficient maps back to rho: C0*sh_dc + 0.5 == rho.
        from nlos_gaussian_renderer_tpu.ops import math as gmath

        np.testing.assert_allclose(gmath.sh_to_rho(scene.sh_dc), rho, rtol=1e-5)

    def test_capacity_padding(self):
        pts, rho = make_points(10)
        scene = init_scene(pts, rho, [-1] * 3, [1] * 3, max_sh_degree=1, capacity=64)
        assert scene.capacity == 64
        assert float(scene.num_alive) == 10
        # Dead slots render inert via the opacity fold.
        np.testing.assert_allclose(scene.opacities[10:], 0.0, atol=0)
        assert bool(jnp.all(jnp.isfinite(scene.quadratic_form())))

    def test_box_heuristic_scale(self):
        pts, rho = make_points(10)
        scene = init_scene(
            pts, rho, [-1] * 3, [1] * 3, max_sh_degree=0, knn_scale_init=False
        )
        expected = np.sqrt((1 - (-1)) / 10)
        np.testing.assert_allclose(scene.scales, expected, rtol=1e-5)

    def test_knn_scale_reasonable(self):
        # Regular grid with spacing h: mean 3-NN distance^2 ~= h^2.
        h = 0.25
        g = np.stack(
            np.meshgrid(*[np.arange(4) * h] * 3, indexing="ij"), -1
        ).reshape(-1, 3)
        d2 = np.asarray(_mean_knn_dist2(jnp.asarray(g, dtype=jnp.float32)))
        np.testing.assert_allclose(d2, h**2, rtol=1e-4)


class TestSceneOps:
    def test_pytree_roundtrip(self):
        pts, rho = make_points(8)
        scene = init_scene(pts, rho, [-1] * 3, [1] * 3, max_sh_degree=2)
        leaves, treedef = jax.tree.flatten(scene)
        assert len(leaves) == 7
        scene2 = jax.tree.unflatten(treedef, leaves)
        np.testing.assert_allclose(scene2.means, scene.means)

    def test_bboxes_contain_means(self):
        pts, rho = make_points(16)
        scene = init_scene(pts, rho, [-1] * 3, [1] * 3, max_sh_degree=0)
        bb = np.asarray(scene.bboxes(sigma_scale=3.0))
        assert (bb[:, 0] <= np.asarray(scene.means) + 1e-6).all()
        assert (bb[:, 1] >= np.asarray(scene.means) - 1e-6).all()
        # Isotropic init: extents = 3 * scale on each axis.
        ext = (bb[:, 1] - bb[:, 0]) / 2
        np.testing.assert_allclose(ext, 3 * np.asarray(scene.scales), rtol=1e-4)

    def test_param_labels_structure(self):
        pts, rho = make_points(4)
        scene = init_scene(pts, rho, [-1] * 3, [1] * 3, max_sh_degree=0)
        labels = scene_param_labels(scene)
        assert labels.means == "mu"
        assert labels.alive == "frozen"
        assert jax.tree.structure(labels, is_leaf=lambda x: isinstance(x, str))

    def test_jit_through_scene(self):
        pts, rho = make_points(8)
        scene = init_scene(pts, rho, [-1] * 3, [1] * 3, max_sh_degree=1)

        @jax.jit
        def total_opacity(s: GaussianScene):
            return jnp.sum(s.opacities)

        np.testing.assert_allclose(float(total_opacity(scene)), 0.8, rtol=1e-5)
