"""Tests for MCMC densification on the fixed-capacity scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nlos_gaussian_renderer_tpu.configs.default import OptimizationParams
from nlos_gaussian_renderer_tpu.models.densify import (
    MAX_SPLIT,
    compute_relocation,
    densify_step,
)
from nlos_gaussian_renderer_tpu.models.scene import init_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.train import make_optimizer


def make_state(n=16, capacity=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rho = rng.uniform(0.2, 0.8, (n, 1)).astype(np.float32)
    scene = init_scene(pts, rho, [-1] * 3, [1] * 3, max_sh_degree=1,
                       capacity=capacity)
    tx = make_optimizer(OptimizationParams())
    return scene, tx, tx.init(scene)


class TestRelocationRule:
    def test_n1_identity(self):
        # Splitting into one copy changes nothing.
        o = jnp.array([0.3, 0.9])
        s = jnp.ones((2, 3)) * 0.1
        o2, s2 = compute_relocation(o, s, jnp.array([1, 1]))
        np.testing.assert_allclose(o2, o, rtol=1e-5)
        np.testing.assert_allclose(s2, s, rtol=1e-4)

    def test_opacity_conservation(self):
        # 1 - (1-o_new)^N == o_old: N copies composite to the original alpha.
        o = jnp.array([0.5, 0.8, 0.99])
        n = jnp.array([2, 5, 20])
        o2, _ = compute_relocation(o, jnp.ones((3, 3)), n)
        np.testing.assert_allclose(
            1 - (1 - np.asarray(o2)) ** np.asarray(n), np.asarray(o), rtol=1e-4
        )

    def test_scale_shrinks_with_n(self):
        o = jnp.full((4,), 0.9)
        s = jnp.ones((4, 3))
        _, s2 = compute_relocation(o, s, jnp.array([1, 2, 5, 10]))
        norms = np.asarray(s2)[:, 0]
        assert np.all(np.diff(norms) < 0)  # more copies -> smaller each
        np.testing.assert_allclose(norms[0], 1.0, rtol=1e-4)  # N=1 unchanged

    def test_clamped_to_max_split(self):
        o2a, s2a = compute_relocation(
            jnp.array([0.5]), jnp.ones((1, 3)), jnp.array([MAX_SPLIT])
        )
        o2b, s2b = compute_relocation(
            jnp.array([0.5]), jnp.ones((1, 3)), jnp.array([MAX_SPLIT + 40])
        )
        np.testing.assert_allclose(o2a, o2b)
        np.testing.assert_allclose(s2a, s2b)


class TestDensifyStep:
    def test_growth_to_cap(self):
        scene, tx, opt_state = make_state(n=16, capacity=32)
        key = jax.random.PRNGKey(0)
        scene2, opt2 = densify_step(scene, opt_state, key, cap_max=32)
        # 5% growth of 16 -> min(32, 16) = 16 -> 0 new... int(1.05*16)=16.
        assert float(scene2.num_alive) == 16
        scene3, _ = densify_step(
            dataclasses.replace(scene, alive=scene.alive.at[:].set(0).at[:20].set(1)),
            opt_state, key, cap_max=32,
        )
        assert float(scene3.num_alive) == 21  # int(1.05*20) = 21

    def test_relocation_of_dead(self):
        scene, tx, opt_state = make_state(n=16, capacity=16)
        # Kill half the population with near-zero opacity.
        lo = scene.logit_opacities.at[:8].set(gmath.inverse_sigmoid(0.001))
        scene = dataclasses.replace(scene, logit_opacities=lo)
        key = jax.random.PRNGKey(1)
        scene2, opt2 = densify_step(scene, opt_state, key, cap_max=16)
        # Relocated slots moved onto donor positions (rows 8..16).
        donors = np.asarray(scene.means[8:])
        relocated = np.asarray(scene2.means[:8])
        for r in relocated:
            assert np.min(np.linalg.norm(donors - r[None], axis=1)) < 1e-6
        # Opacities now above the dead threshold.
        assert float(jnp.min(scene2.opacities[np.asarray(scene2.alive) > 0.5])) >= 0.005 - 1e-6

    def test_opt_state_rows_zeroed(self):
        scene, tx, opt_state = make_state(n=16, capacity=32)
        # Fake nonzero moments.
        opt_state = jax.tree.map(
            lambda l: jnp.ones_like(l) if hasattr(l, "shape") and l.dtype == jnp.float32 else l,
            opt_state,
        )
        lo = scene.logit_opacities.at[:4].set(gmath.inverse_sigmoid(0.001))
        scene = dataclasses.replace(scene, logit_opacities=lo)
        scene2, opt2 = densify_step(scene, opt_state, jax.random.PRNGKey(2), cap_max=32)
        # Relocated rows must have zeroed Adam moments.
        leaves = [
            l for l in jax.tree.leaves(opt2)
            if hasattr(l, "shape") and l.ndim >= 1 and l.shape[0] == 32
        ]
        assert leaves, "no capacity-shaped opt-state leaves found"
        for l in leaves:
            assert float(jnp.abs(l[:4]).max()) == 0.0

    def test_jit_stable_shapes(self):
        scene, tx, opt_state = make_state(n=16, capacity=64)
        key = jax.random.PRNGKey(3)
        s, o = densify_step(scene, opt_state, key, cap_max=64)
        assert s.means.shape == scene.means.shape
        for a, b in zip(jax.tree.leaves(o), jax.tree.leaves(opt_state)):
            if hasattr(a, "shape"):
                assert a.shape == b.shape

    def test_finite_after_many_steps(self):
        # Growth is floor(1.05 * n) like the reference (`gaussian_model.py:525`),
        # so start from a population large enough to actually grow.
        scene, tx, opt_state = make_state(n=64, capacity=128)
        key = jax.random.PRNGKey(4)
        for i in range(5):
            key, sub = jax.random.split(key)
            scene, opt_state = densify_step(scene, opt_state, sub, cap_max=128)
        assert float(scene.num_alive) > 64
        for leaf in jax.tree.leaves(scene):
            assert bool(jnp.all(jnp.isfinite(leaf)))
