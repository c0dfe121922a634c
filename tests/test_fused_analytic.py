"""Parity + gradient tests for the Pallas erf-section (analytic) backend.

The kernel must reproduce the chunked-jnp analytic backend (`ops/analytic.py`)
— same closed-form per-bin integrals — through the rsort culling machinery,
and its custom_vjp must match `jax.grad` of that dense analytic path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.models.scene import GaussianScene, init_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused_rsort import RSortSpec
from nlos_gaussian_renderer_tpu.ops.render import (
    RenderSettings,
    mse_loss,
    render_transient,
)

VOL_POS = jnp.array([0.0, 1.0, 0.0])
VOL_SIZE = 0.6
C, DT = 1.0, 0.01
BOX = gmath.volume_box_points(VOL_POS, VOL_SIZE)
CAM = jnp.array([0.05, 0.0, -0.1])

SPEC = RSortSpec(t_theta=4, t_phi=8, t_chunk=8, g_tile=32, w_max=256,
                 max_groups=16)
SETTINGS = RenderSettings(
    num_sampling_points=8, start=60, end=140, backend="pallas_analytic",
    rsort_spec=SPEC,
)
ANALYTIC = SETTINGS._replace(backend="analytic")
DENSE = SETTINGS._replace(backend="dense")


def make_scene(n=40, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.asarray(VOL_POS) + rng.uniform(-0.25, 0.25, size=(n, 3))
    scene = init_scene(
        pts.astype(np.float32),
        rng.uniform(0.2, 0.8, size=(n, 1)).astype(np.float32),
        np.asarray(VOL_POS) - VOL_SIZE / 2, np.asarray(VOL_POS) + VOL_SIZE / 2,
        max_sh_degree=1, knn_scale_init=False,
    )
    return GaussianScene(
        means=scene.means,
        log_scales=jnp.asarray(rng.uniform(-4.0, -2.5, (n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
        sh_dc=scene.sh_dc,
        sh_rest=0.1 * jnp.asarray(rng.normal(size=scene.sh_rest.shape), jnp.float32),
        alive=scene.alive,
    )


class TestAnalyticKernelParity:
    @pytest.mark.parametrize("occ", [False, True])
    def test_histogram_parity_vs_chunked_analytic(self, occ):
        """Kernel vs the dense chunked-jnp erf path: same math, so agreement
        is numerical (+ the 3-sigma culling tail)."""
        scene = make_scene(48, seed=3)
        s_k = SETTINGS._replace(occlusion=occ)
        s_a = ANALYTIC._replace(occlusion=occ)
        _, hk, ov = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_k)
        _, ha, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_a)
        assert not bool(ov)
        np.testing.assert_allclose(hk, ha, rtol=3e-3, atol=1e-9)

    def test_histogram_close_to_numerical_dense(self):
        """Exact bin integrals vs 1-sample-per-bin quadrature: physical
        agreement at the <1% level the analytic suite enforces."""
        scene = make_scene(48, seed=4)
        _, hk, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, SETTINGS)
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, DENSE)
        rel = float(
            jnp.linalg.norm(hk - hd) / (jnp.linalg.norm(hd) + 1e-12)
        )
        assert rel < 1e-2, rel

    def test_gradient_parity_vs_analytic(self):
        scene = make_scene(32, seed=5)
        target = jnp.ones(SETTINGS.num_bins) * 0.1

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        gk = jax.grad(lambda sc: loss(sc, SETTINGS))(scene)
        ga = jax.grad(lambda sc: loss(sc, ANALYTIC))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities", "sh_dc"):
            a, b = np.asarray(getattr(gk, name)), np.asarray(getattr(ga, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=7e-3,
                                       err_msg=name)

    def test_gradient_bf16_flag_within_band(self):
        """`bwd_p_bf16` on the analytic backward (single-pass bf16 dw/dgp
        contractions) stays inside the documented ~4e-3 relative band of
        the exact hi/lo path."""
        scene = make_scene(32, seed=9)
        target = jnp.ones(SETTINGS.num_bins) * 0.1
        s_bf = SETTINGS._replace(
            rsort_spec=SPEC._replace(bwd_p_bf16=True)
        )

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        g_exact = jax.grad(lambda sc: loss(sc, SETTINGS))(scene)
        g_bf = jax.grad(lambda sc: loss(sc, s_bf))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities",
                     "sh_dc"):
            a = np.asarray(getattr(g_bf, name))
            b = np.asarray(getattr(g_exact, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=8e-3,
                                       err_msg=name)

    def test_occlusion_gradient_finite(self):
        scene = make_scene(24, seed=6)
        target = jnp.ones(SETTINGS.num_bins) * 0.1
        s = SETTINGS._replace(occlusion=True)

        def loss(sc):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, s)
            return mse_loss(h, target)[0]

        g = jax.grad(loss)(scene)
        for leaf in jax.tree.leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_overflow_flag_reaches_output(self):
        scene = make_scene(48, seed=7)
        tight = SETTINGS._replace(rsort_spec=SPEC._replace(w_max=2))
        _, _, ov = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, tight)
        assert bool(ov)


class TestRayFeatures:
    def test_quad_slab_matches_grid(self):
        """The per-(chunk, tile) quad slab's lane blocks hold mon2(w),
        the qb features, and mon(u) for the raw grid's rays, in the
        (theta_local, phi_local) in-tile order the kernels assume."""
        from nlos_gaussian_renderer_tpu.ops.fused_analytic import (
            analytic_quad_slabs,
            analytic_tile_aux,
        )
        from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        ns, num_r = 8, grid.r.shape[0]
        n_ch = -(-num_r // SPEC.t_chunk)
        aux4 = np.asarray(analytic_tile_aux(grid.points, CAM, ns, num_r, SPEC))
        xf = np.asarray(
            analytic_quad_slabs(grid.theta, grid.phi, aux4, SPEC, n_ch)
        )
        n_pt = 8 // SPEC.t_phi
        t_ang = (8 // SPEC.t_theta) * n_pt
        s_ang = SPEC.t_theta * SPEC.t_phi
        # Tile t = tt * n_pt + pt holds rays (tt*t_theta + i, pt*t_phi + j)
        # flattened (i, j); check one interior entry against the raw grid.
        tt, pt, i, j = 1, 0, 2, 3
        ch = 1 if n_ch > 1 else 0
        th = float(grid.theta[tt * SPEC.t_theta + i])
        ph = float(grid.phi[pt * SPEC.t_phi + j])
        w = np.array(
            [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)]
        )
        tile = ch * t_ang + tt * n_pt + pt
        lane = i * SPEC.t_phi + j
        # qa block: mon2(w) in rows 0..5 of lanes [0, S).
        np.testing.assert_allclose(
            xf[tile, :6, lane],
            [w[0] ** 2, w[1] ** 2, w[2] ** 2, w[0] * w[1], w[0] * w[2],
             w[1] * w[2]],
            rtol=1e-5, atol=1e-7,
        )
        # qc block: mon(u) with u = delta + t_c * w in lanes [2S, 3S).
        dlt, tc = aux4[tile, :3], aux4[tile, 3]
        u = dlt + tc * w
        np.testing.assert_allclose(
            xf[tile, 6:10, 2 * s_ang + lane],
            [u[0], u[1], u[2], 1.0],
            rtol=1e-4, atol=1e-7,
        )
        # qb block row 6..8 holds the raw direction (linear-term features).
        np.testing.assert_allclose(
            xf[tile, 6:9, s_ang + lane], w, rtol=1e-5, atol=1e-7
        )
        # Pad rows are zero (the kernel contracts all XF rows).
        assert np.all(xf[:, 10:, :] == 0.0)


class TestGateLadderLaneAligned:
    """bl-anchored gate-ladder coverage for the analytic kernels (see
    tests/test_rsort.py::TestGateLadderLaneAligned): s_ang=128 flips
    `fused_rsort._gate_ladder` to unaligned anchored starts with lane
    masks in both the erf forward and the moment backward."""

    SPEC128 = RSortSpec(t_theta=8, t_phi=16, t_chunk=8, g_tile=32,
                        w_max=512, max_groups=16)
    S_K = RenderSettings(num_sampling_points=16, start=60, end=140,
                         backend="pallas_analytic", rsort_spec=SPEC128)
    S_A = S_K._replace(backend="analytic")

    def test_histogram_parity(self):
        scene = make_scene(48, seed=13)
        _, hk, ov = render_transient(
            scene, CAM, BOX, C, DT, VOL_POS, 1, self.S_K
        )
        _, ha, _ = render_transient(
            scene, CAM, BOX, C, DT, VOL_POS, 1, self.S_A
        )
        assert not bool(ov)
        np.testing.assert_allclose(hk, ha, rtol=3e-3, atol=1e-9)

    def test_gradient_parity(self):
        scene = make_scene(24, seed=14)
        target = jnp.ones(self.S_K.num_bins) * 0.1

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        gk = jax.grad(lambda sc: loss(sc, self.S_K))(scene)
        ga = jax.grad(lambda sc: loss(sc, self.S_A))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities",
                     "sh_dc"):
            a = np.asarray(getattr(gk, name))
            b = np.asarray(getattr(ga, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=7e-3,
                                       err_msg=name)
