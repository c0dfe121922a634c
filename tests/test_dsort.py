"""Parity + gradient tests for the duplicated-layout (dsort) backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.models.scene import GaussianScene, init_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused_dsort import (
    dsort_cull,
    tune_dsort_spec,
)
from nlos_gaussian_renderer_tpu.ops.fused_rsort import RSortSpec
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

# Fine angular tiles — the whole point of the duplicated layout.
# d_max = t_ang (16): the test scenes' sigmas are large relative to the tiny
# 8x8 grid, so footprints legitimately span many of the 2x2-ray tiles.
SPEC = RSortSpec(t_theta=2, t_phi=2, t_chunk=8, g_tile=32, w_max=1024,
                 d_max=16, dup_rows=0)
SETTINGS = RenderSettings(
    num_sampling_points=8, start=60, end=140, backend="pallas_dsort",
    rsort_spec=SPEC,
)
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


class TestDSortCull:
    def test_duplicates_cover_all_touched_tiles(self):
        """Every (gaussian, tile) the footprint touches must appear as a
        valid duplicate row in that tile's run."""
        scene = make_scene(48, seed=1)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        tiles = dsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        assert not bool(tiles.overflowed)
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
            angular_footprints,
        )

        d, radius, m_th, m_ph, in_w = angular_footprints(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        n_pt = 8 // SPEC.t_phi
        full_perm = np.asarray(tiles.full_perm)
        words = np.asarray(tiles.words)
        valid_slot = words[:, 0] != 0
        # Rebuild (tile -> set of gaussians) from the padded layout: block
        # b's tile comes from the work list (bwd_b -> bwd_t).
        n_items = int(tiles.n_items[0])
        blk_tile = {}
        for b, t in zip(np.asarray(tiles.bwd_b)[:n_items],
                        np.asarray(tiles.bwd_t)[:n_items]):
            blk_tile[int(b)] = int(t)
        members = {}
        for slot in np.where(valid_slot)[0]:
            blk = slot // SPEC.g_tile
            if blk in blk_tile:
                members.setdefault(blk_tile[blk], set()).add(
                    int(full_perm[slot])
                )
        m_th_np, m_ph_np = np.asarray(m_th), np.asarray(m_ph)
        in_w_np = np.asarray(in_w)
        for gi in range(48):
            if not in_w_np[gi]:
                continue
            for tt in np.where(m_th_np[gi])[0]:
                for pt in np.where(m_ph_np[gi])[0]:
                    t = tt * n_pt + pt
                    assert gi in members.get(t, set()), (gi, t)

    def test_overflow_flags(self):
        scene = make_scene(48, seed=2)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        # Work-list too small.
        t = dsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC._replace(w_max=2),
        )
        assert bool(t.overflowed)
        # Duplicate capacity too small.
        t = dsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC._replace(d_max=1),
        )
        # d_max=1 must flag if any gaussian touches >1 tile.
        cnts = np.asarray(t.max_dups)
        if cnts > 1:
            assert bool(t.overflowed)

    def test_tune_covers_and_shrinks(self):
        scene = make_scene(48, seed=8)
        cams = np.array([[0.05, 0, -0.1], [0.0, 0, 0.0]], np.float32)
        spec = tune_dsort_spec(scene, cams, BOX, 8, 60, 140, C, DT, base=SPEC)
        from nlos_gaussian_renderer_tpu.ops.render import (
            check_culling_capacity,
        )

        s = SETTINGS._replace(rsort_spec=spec)
        diag = check_culling_capacity(scene, CAM, BOX, C, DT, s)
        assert diag["backend"] == "pallas_dsort"
        assert not diag["overflowed"], diag
        assert spec.dup_rows > 0
        assert spec.w_max < SPEC.w_max


class TestDSortParity:
    @pytest.mark.parametrize("occ", [False, True])
    def test_histogram_parity(self, occ):
        scene = make_scene(48, seed=3)
        s_d = SETTINGS._replace(occlusion=occ)
        s_ref = DENSE._replace(occlusion=occ)
        _, hd, ov = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_d)
        _, hr, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_ref)
        assert not bool(ov)
        np.testing.assert_allclose(hd, hr, rtol=3e-3, atol=1e-9)

    def test_gradient_parity(self):
        scene = make_scene(32, seed=4)
        target = jnp.ones(SETTINGS.num_bins) * 0.1

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        gd = jax.grad(lambda sc: loss(sc, SETTINGS))(scene)
        gr = jax.grad(lambda sc: loss(sc, DENSE))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities", "sh_dc"):
            a, b = np.asarray(getattr(gd, name)), np.asarray(getattr(gr, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=7e-3,
                                       err_msg=name)

    def test_matches_rsort_backend(self):
        scene = make_scene(40, seed=5)
        s_r = SETTINGS._replace(
            backend="pallas_rsort",
            rsort_spec=RSortSpec(t_theta=4, t_phi=8, t_chunk=8, g_tile=32,
                                 w_max=256, max_groups=16),
        )
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, SETTINGS)
        _, hr, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_r)
        # atol floor at 1e-3 of the peak: dsort and rsort build different
        # blocks, so radial gating truncates different (sub-cutoff) tail
        # mass in edge bins (see test_rsort.test_matches_pallas_tile_backend).
        np.testing.assert_allclose(
            np.asarray(hd), np.asarray(hr), rtol=3e-3,
            atol=1e-3 * float(np.max(np.abs(hd))),
        )

    def test_engulfing_gaussian_not_dropped(self):
        """A cull sphere containing the scan point covers every angular tile:
        with enough d_max the duplicates must cover them all (or overflow)."""
        import dataclasses

        scene = make_scene(8, seed=11)
        means = np.array(scene.means)
        direction = np.asarray(VOL_POS) - np.asarray(CAM)
        direction /= np.linalg.norm(direction)
        means[0] = np.asarray(CAM) + 0.35 * direction
        log_scales = np.array(scene.log_scales)
        log_scales[0] = np.log(0.15)
        scene = dataclasses.replace(
            scene, means=jnp.asarray(means), log_scales=jnp.asarray(log_scales)
        )
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        t_ang = (8 // SPEC.t_theta) * (8 // SPEC.t_phi)
        spec = SPEC._replace(d_max=t_ang)
        tiles = dsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, spec,
        )
        assert not bool(tiles.overflowed)
        assert int(tiles.max_dups) == t_ang
        # gaussian 0 appears once per tile in the layout.
        full_perm = np.asarray(tiles.full_perm)
        valid = np.asarray(tiles.words)[:, 0] != 0
        assert int(((full_perm == 0) & valid).sum()) == t_ang
