"""Tests for the closed-form (erf) section renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.models.scene import GaussianScene, init_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.analytic import (
    bin_edges_from_grid,
    ray_quadratics,
    section_bin_integrals,
)
from nlos_gaussian_renderer_tpu.ops.render import (
    RenderSettings,
    mse_loss,
    render_transient,
)

VOL_POS = jnp.array([0.0, 1.0, 0.0])
VOL_SIZE = 0.6
C, DT = 1.0, 0.004
BOX = gmath.volume_box_points(VOL_POS, VOL_SIZE)
CAM = jnp.array([0.07, 0.0, -0.03])


def make_scene(n=24, seed=0, sigma_lo=-3.2, sigma_hi=-2.2):
    rng = np.random.default_rng(seed)
    pts = np.asarray(VOL_POS) + rng.uniform(-0.2, 0.2, size=(n, 3))
    scene = init_scene(
        pts.astype(np.float32),
        rng.uniform(0.2, 0.8, size=(n, 1)).astype(np.float32),
        np.asarray(VOL_POS) - VOL_SIZE / 2, np.asarray(VOL_POS) + VOL_SIZE / 2,
        max_sh_degree=1, knn_scale_init=False,
    )
    return GaussianScene(
        means=scene.means,
        log_scales=jnp.asarray(rng.uniform(sigma_lo, sigma_hi, (n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
        sh_dc=scene.sh_dc,
        sh_rest=0.1 * jnp.asarray(rng.normal(size=scene.sh_rest.shape), jnp.float32),
        alive=scene.alive,
    )


class TestSectionIntegrals:
    def test_matches_quadrature(self):
        # Closed form vs fine trapezoid quadrature of exp(-0.5(a+bt+ct^2)).
        # Physically consistent coefficients: a + b t + c t^2 = |u + t v|^2
        # for real vectors u, v (so the minimum is >= 0, as for any true
        # Mahalanobis along a ray — the closed form clamps on that).
        rng = np.random.default_rng(1)
        n, r = 8, 4
        u = rng.uniform(-4, 4, (r, n, 3))
        v = rng.uniform(-6, 6, (r, n, 3))
        a = jnp.asarray((u[0] ** 2).sum(-1), jnp.float32)
        u = np.broadcast_to(u[0], (r, n, 3))
        b = jnp.asarray(2 * (u * v).sum(-1), jnp.float32)
        c = jnp.asarray((v**2).sum(-1) + 1e-3, jnp.float32)
        edges = jnp.linspace(0.2, 2.0, 10)

        got = np.asarray(section_bin_integrals(a, b, c, edges))  # (9, r, n)

        ts = np.linspace(0.2, 2.0, 20_000)
        f = np.exp(
            -0.5
            * (
                np.asarray(a)[None, None, :]
                + np.asarray(b)[None] * ts[:, None, None]
                + np.asarray(c)[None] * ts[:, None, None] ** 2
            )
        )  # (T, r, n)
        total_expected = np.trapezoid(f, ts, axis=0)
        np.testing.assert_allclose(
            got.sum(axis=0), total_expected, rtol=2e-3, atol=1e-7
        )
        # Per-bin: integrate each interval separately for bin 3.
        m = (ts >= float(edges[3])) & (ts <= float(edges[4]))
        per_bin = np.trapezoid(f[m], ts[m], axis=0)
        np.testing.assert_allclose(got[3], per_bin, rtol=5e-3, atol=1e-7)

    def test_ray_quadratics_match_pointwise_maha(self):
        scene = make_scene(6)
        dirs = np.asarray(
            gmath.spherical_to_cartesian(
                jnp.stack(
                    [jnp.ones(5), jnp.linspace(1.0, 2.0, 5), jnp.linspace(-2.0, -1.0, 5)],
                    axis=-1,
                )
            )
        )
        a, b, c = ray_quadratics(scene, CAM, jnp.asarray(dirs))
        for t in [0.6, 1.0, 1.4]:
            pts = np.asarray(CAM)[None] + t * dirs  # (5, 3)
            maha = np.asarray(
                gmath.mahalanobis_direct(
                    jnp.asarray(pts, jnp.float32), scene.means, scene.scales,
                    scene.rotations,
                )
            )  # (5, 6)
            quad = np.asarray(a)[None] + np.asarray(b) * t + np.asarray(c) * t * t
            np.testing.assert_allclose(quad, maha, rtol=1e-3, atol=1e-3)

    def test_bin_edges(self):
        r = jnp.linspace(1.0, 2.0, 11)
        e = np.asarray(bin_edges_from_grid(r))
        assert e.shape == (12,)
        assert np.all(np.diff(e) > 0)
        np.testing.assert_allclose(e[1:-1], np.asarray(r[:-1] + 0.05), rtol=1e-5)


class TestAnalyticRenderer:
    @pytest.mark.parametrize("occ", [False, True])
    def test_parity_with_numerical(self, occ):
        # Reference's own stated target: numerical-vs-analytic relative error
        # < 1% (`cursor_md/SECTION_RENDERER_USAGE.md:373-390`) — achieved here
        # with real per-bin deposition.
        scene = make_scene(24)
        settings_n = RenderSettings(
            num_sampling_points=8, start=150, end=350, occlusion=occ
        )
        settings_a = settings_n._replace(backend="analytic")
        _, hn, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, settings_n)
        _, ha, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, settings_a)
        rel = float(
            jnp.linalg.norm(ha - hn) / (jnp.linalg.norm(hn) + 1e-12)
        )
        assert rel < 0.01, rel

    def test_convergence_with_bin_count(self):
        # Analytic is the ground truth; the numerical Riemann sum converges to
        # it as bins refine. Error(fine sampling) < error(coarse sampling).
        scene = make_scene(12, seed=3)
        errs = []
        for start, end, dt in [(75, 175, 0.008), (150, 350, 0.004)]:
            s_n = RenderSettings(num_sampling_points=8, start=start, end=end)
            s_a = s_n._replace(backend="analytic")
            _, hn, _ = render_transient(scene, CAM, BOX, C, dt, VOL_POS, 1, s_n)
            _, ha, _ = render_transient(scene, CAM, BOX, C, dt, VOL_POS, 1, s_a)
            # Compare integrated energy (bin count differs between configs).
            errs.append(
                float(jnp.abs(jnp.sum(ha) * dt - jnp.sum(hn) * dt))
                / (float(jnp.abs(jnp.sum(hn) * dt)) + 1e-12)
            )
        assert errs[1] <= errs[0] * 1.5  # no divergence on refinement

    def test_gradients_finite(self):
        scene = make_scene(8, seed=4)
        settings = RenderSettings(
            num_sampling_points=8, start=150, end=350, backend="analytic"
        )
        target = jnp.ones(settings.num_bins) * 0.05

        def loss(sc):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, settings)
            return mse_loss(h, target)[0]

        g = jax.grad(loss)(scene)
        for leaf in jax.tree.leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        assert float(jnp.abs(g.means).max()) > 0

    def test_chunked_matches_unchunked(self):
        from nlos_gaussian_renderer_tpu.ops.analytic import analytic_field
        from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

        scene = make_scene(24, seed=5)
        grid = shell_grid(CAM, BOX, 8, 150, 350, C, DT)
        w = jnp.concatenate(
            [scene.opacities, scene.opacities * 0.5], axis=-1
        )
        full = analytic_field(scene, grid, CAM, w)
        chunked = analytic_field(scene, grid, CAM, w, gauss_chunk=7)
        np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-7)

    def test_gradient_parity_with_dense(self):
        """Analytic gradients must agree with jax.grad of the dense numerical
        path (the numerical backends carry the same check in test_pallas).
        The two forwards differ only by the bin-quadrature error (<1%), so
        normalized gradient distance is bounded accordingly."""
        scene = make_scene(12, seed=6)
        target = jnp.linspace(0.0, 0.1, 200)

        def loss(sc, backend):
            s = RenderSettings(
                num_sampling_points=8, start=150, end=350, backend=backend
            )
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, s)
            return mse_loss(h, target)[0]

        ga = jax.grad(lambda sc: loss(sc, "analytic"))(scene)
        gd = jax.grad(lambda sc: loss(sc, "dense"))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities",
                     "sh_dc", "sh_rest"):
            a = np.asarray(getattr(ga, name)).ravel()
            d = np.asarray(getattr(gd, name)).ravel()
            rel = np.linalg.norm(a - d) / (np.linalg.norm(d) + 1e-20)
            assert rel < 0.02, (name, rel)

    def test_gradient_parity_chunked(self):
        """Gradients flow identically through the lax.map chunking."""
        scene = make_scene(10, seed=7)
        from nlos_gaussian_renderer_tpu.ops.analytic import analytic_field
        from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

        grid = shell_grid(CAM, BOX, 8, 150, 350, C, DT)

        def loss(sc, chunk):
            w = jnp.concatenate([sc.opacities, sc.opacities * 0.5], axis=-1)
            return jnp.sum(analytic_field(sc, grid, CAM, w, gauss_chunk=chunk) ** 2)

        g_full = jax.grad(lambda sc: loss(sc, 10))(scene)
        g_chunk = jax.grad(lambda sc: loss(sc, 3))(scene)
        for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_chunk)):
            # f32 accumulation order differs between chunkings: compare by
            # normalized L2 distance rather than elementwise.
            a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
            rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-20)
            assert rel < 1e-3, rel
