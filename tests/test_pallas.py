"""Parity + gradient tests: fused block-sparse Pallas path vs dense jnp path.

On CPU the kernel runs in interpreter mode; the same code compiles with Mosaic
on TPU. Gradient parity vs jax.grad of the dense renderer is the test the
reference could never pass (its CUDA backward returns zeros,
`cuda_autograd.py:147-191`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.models.scene import GaussianScene, init_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused import (
    TileSpec,
    cull_tiles,
    fused_field,
    fused_gaussian_field,
    tile_points,
    untile_field,
)
from nlos_gaussian_renderer_tpu.ops.render import (
    RenderSettings,
    mse_loss,
    render_transient,
)
from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

VOL_POS = jnp.array([0.0, 1.0, 0.0])
VOL_SIZE = 0.6
C, DT = 1.0, 0.01
BOX = gmath.volume_box_points(VOL_POS, VOL_SIZE)
CAM = jnp.array([0.05, 0.0, -0.1])

SPEC = TileSpec(t_theta=4, t_phi=8, t_r=16, k_max=64, a_sub=256, g_tile=32)
SETTINGS = RenderSettings(
    num_sampling_points=8, start=60, end=140, backend="pallas", tile_spec=SPEC
)
DENSE = SETTINGS._replace(backend="dense")


def make_scene(n=40, seed=0, wide=False):
    rng = np.random.default_rng(seed)
    pts = np.asarray(VOL_POS) + rng.uniform(-0.25, 0.25, size=(n, 3))
    scene = init_scene(
        pts.astype(np.float32),
        rng.uniform(0.2, 0.8, size=(n, 1)).astype(np.float32),
        np.asarray(VOL_POS) - VOL_SIZE / 2, np.asarray(VOL_POS) + VOL_SIZE / 2,
        max_sh_degree=1, knn_scale_init=False,
    )
    lo, hi = (-3.0, -1.5) if wide else (-4.0, -2.5)
    return GaussianScene(
        means=scene.means,
        log_scales=jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
        sh_dc=scene.sh_dc,
        sh_rest=0.1 * jnp.asarray(rng.normal(size=scene.sh_rest.shape), jnp.float32),
        alive=scene.alive,
    )


class TestFusedFieldOp:
    def test_matches_direct_sum(self):
        rng = np.random.default_rng(1)
        t, a, k, c = 2, 64, 48, 2
        xf = jnp.asarray(rng.normal(size=(t, a, 10)), jnp.float32)
        gf = jnp.abs(jnp.asarray(rng.normal(size=(t, k, 10)), jnp.float32))
        w = jnp.asarray(rng.normal(size=(t, k, c)), jnp.float32)
        counts = jnp.asarray([k, 20], jnp.int32)
        wm = w * (jnp.arange(k)[None, :, None] < counts[:, None, None])

        out = fused_field(xf, gf, wm, counts, a_sub=32, g_tile=16)
        m = jnp.maximum(jnp.einsum("taf,tkf->tak", xf, gf,
                                   precision=jax.lax.Precision.HIGHEST), 0.0)
        expected = jnp.einsum("tak,tkc->tac", jnp.exp(-0.5 * m), wm,
                              precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_vjp_matches_autodiff(self):
        rng = np.random.default_rng(2)
        t, a, k, c = 2, 32, 24, 2
        xf = jnp.asarray(rng.normal(size=(t, a, 10)), jnp.float32)
        gf = jnp.abs(jnp.asarray(rng.normal(size=(t, k, 10)), jnp.float32))
        w = jnp.asarray(rng.normal(size=(t, k, c)), jnp.float32)
        counts = jnp.full((t,), k, jnp.int32)

        def ref(gf, w):
            m = jnp.maximum(
                jnp.einsum("taf,tkf->tak", xf, gf,
                           precision=jax.lax.Precision.HIGHEST), 0.0)
            return jnp.sum(
                jnp.sin(jnp.einsum("tak,tkc->tac", jnp.exp(-0.5 * m), w,
                                   precision=jax.lax.Precision.HIGHEST))
            )

        def fused(gf, w):
            return jnp.sum(jnp.sin(fused_field(xf, gf, w, counts, 16, 8)))

        g1 = jax.grad(ref, argnums=(0, 1))(gf, w)
        g2 = jax.grad(fused, argnums=(0, 1))(gf, w)
        np.testing.assert_allclose(g2[0], g1[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g2[1], g1[1], rtol=1e-4, atol=1e-5)


class TestTiling:
    def test_tile_untile_roundtrip(self):
        rng = np.random.default_rng(3)
        num_r, ns = 40, 8
        pts = jnp.asarray(rng.normal(size=(num_r, ns, ns, 3)), jnp.float32)
        spec = SPEC
        n_tt, n_pt, n_rt = 2, 1, 3
        xf = tile_points(pts, ns, num_r, spec, n_tt, n_pt, n_rt)
        assert xf.shape == (n_rt * n_tt * n_pt, spec.t_r * spec.t_theta * spec.t_phi, 10)
        # Untiling the monomial x-coordinate recovers points' x.
        back = untile_field(xf[..., 6:7], ns, num_r, spec, n_tt, n_pt, n_rt)
        np.testing.assert_allclose(back[..., 0], pts[..., 0], atol=1e-6)

    def test_cull_covers_all_relevant(self):
        scene = make_scene(64, seed=4)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        tiles = cull_tiles(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        assert not bool(tiles.overflowed)
        # Gaussian centers inside a tile's angular/radial range must be listed.
        rel = np.asarray(gmath.cartesian_to_spherical(scene.means - CAM))
        idx = np.asarray(tiles.indices)
        counts = np.asarray(tiles.counts)
        from nlos_gaussian_renderer_tpu.ops.fused import tile_grid_dims

        n_tt, n_pt, n_rt = tile_grid_dims(8, 80, SPEC)
        theta = np.asarray(grid.theta)
        phi = np.asarray(grid.phi)
        r = np.asarray(grid.r)
        for g in range(scene.capacity):
            d, th, ph = rel[g]
            # which tile contains the center (if any)
            if not (r[0] <= d <= r[-1] and theta.min() <= th <= theta.max()
                    and phi.min() <= ph <= phi.max()):
                continue
            rt = min(np.searchsorted(r, d) // SPEC.t_r, n_rt - 1)
            tt = min(np.searchsorted(theta, th) // SPEC.t_theta, n_tt - 1)
            pt = min(np.searchsorted(phi, ph) // SPEC.t_phi, n_pt - 1)
            tile = (rt * n_tt + tt) * n_pt + pt
            assert g in idx[tile][: counts[tile]], (g, tile)

    def test_dead_gaussians_excluded(self):
        scene = make_scene(32, seed=5)
        scene = GaussianScene(
            **{
                f: getattr(scene, f) if f != "alive" else scene.alive.at[:16].set(0.0)
                for f in "means log_scales quats logit_opacities sh_dc sh_rest alive".split()
            }
        )
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        tiles = cull_tiles(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        listed = set()
        idx = np.asarray(tiles.indices)
        for t, n in enumerate(np.asarray(tiles.counts)):
            listed.update(idx[t][:n].tolist())
        assert not (listed & set(range(16)))


class TestPallasRenderParity:
    @pytest.mark.parametrize("occ", [False, True])
    def test_histogram_parity(self, occ):
        scene = make_scene(48, seed=6)
        s_p = SETTINGS._replace(occlusion=occ)
        s_d = DENSE._replace(occlusion=occ)
        _, hp, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_p)
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_d)
        np.testing.assert_allclose(hp, hd, rtol=2e-3, atol=1e-10)

    def test_gradient_parity(self):
        scene = make_scene(32, seed=7)
        target = jnp.ones(SETTINGS.num_bins) * 0.1

        def loss(sc, settings):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, settings)
            return mse_loss(h, target)[0]

        gp = jax.grad(lambda sc: loss(sc, SETTINGS))(scene)
        gd = jax.grad(lambda sc: loss(sc, DENSE))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities", "sh_dc"):
            a, b = np.asarray(getattr(gp, name)), np.asarray(getattr(gd, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-3, err_msg=name
            )

    def test_overflow_flag(self):
        # k_max=1 forces truncation on a crowded scene.
        scene = make_scene(64, seed=8, wide=True)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        spec = SPEC._replace(k_max=1)
        tiles = cull_tiles(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, spec,
        )
        assert bool(tiles.overflowed)


class TestNonDivisibleShapes:
    def test_ragged_bins_and_rays(self):
        # num_r=90 not divisible by t_r=16; ns=8 not divisible by t_phi=8? use
        # t_theta=8 > ns -> single padded tile per angular dim.
        spec = TileSpec(t_theta=8, t_phi=8, t_r=16, k_max=48, a_sub=128,
                        g_tile=16)
        s = RenderSettings(num_sampling_points=8, start=55, end=145,
                           backend="pallas", tile_spec=spec)
        d = s._replace(backend="dense")
        scene = make_scene(24, seed=11)
        _, hp, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s)
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, d)
        np.testing.assert_allclose(hp, hd, rtol=3e-3, atol=1e-9)

    def test_two_channel_vjp_through_render(self):
        # Aggregate occlusion uses C=2 channels; gradient parity again.
        spec = SPEC._replace(k_max=96)
        s = SETTINGS._replace(occlusion=True, tile_spec=spec)
        d = DENSE._replace(occlusion=True)
        scene = make_scene(24, seed=12)
        target = jnp.full((s.num_bins,), 0.05)

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        gp = jax.grad(lambda sc: loss(sc, s))(scene)
        gd = jax.grad(lambda sc: loss(sc, d))(scene)
        for name in ("means", "log_scales", "logit_opacities"):
            a, b = np.asarray(getattr(gp, name)), np.asarray(getattr(gd, name))
            sc_ = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / sc_, b / sc_, atol=5e-3, err_msg=name)
