"""Tests for carving init, checkpointing, and export utilities."""

import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams
from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
from nlos_gaussian_renderer_tpu.models.scene import init_scene
from nlos_gaussian_renderer_tpu.utils.carving import (
    carved_init_points,
    detect_first_bounces,
    space_carving,
)
from nlos_gaussian_renderer_tpu.utils.init import init_rand_points


@pytest.fixture(scope="module")
def data():
    return make_synthetic_dataset(
        seed=3, scan_m=6, scan_n=6, num_bins=64, num_gt_gaussians=6,
        num_sampling_points=8,
    )


class TestFirstBounce:
    def test_simple_rise(self):
        t = np.zeros((10, 2, 2), np.float32)
        t[4, 0, 0] = 1.0  # rises at bin 4
        t[7, 1, 1] = 0.5
        fb = detect_first_bounces(t, threshold=1e-5)
        assert fb[0, 0] == 4
        assert fb[1, 1] == 7
        assert fb[0, 1] == 0  # all-zero pixel

    def test_threshold_respected(self):
        t = np.zeros((10, 1, 1), np.float32)
        t[3, 0, 0] = 1e-6  # below threshold -> skip
        t[6, 0, 0] = 1.0
        fb = detect_first_bounces(t, threshold=1e-5)
        assert fb[0, 0] == 6

    def test_reference_loop_parity(self, data):
        # Vectorized result equals a literal port of the reference loop
        # (gaussian_utils.py:38-50).
        transient = data.nlos_data
        bins, h, w = transient.shape
        expected = np.zeros((h, w))
        for y in range(h):
            for x in range(w):
                if np.sum(transient[:, y, x]) != 0:
                    for b in range(1, bins):
                        if transient[b, y, x] - transient[b - 1, y, x] > 1e-5:
                            expected[y, x] = b
                            break
        got = detect_first_bounces(transient, threshold=1e-5)
        np.testing.assert_array_equal(got, expected)


class TestSpaceCarving:
    def test_feasible_region_near_scene(self, data):
        feasible = space_carving(data, carving_volume_size=16, ratio=0.95)
        assert feasible.shape[1] == 3
        # All feasible voxels lie inside the volume box.
        vmin = data.volume_position - data.volume_size / 2 - 1e-4
        vmax = data.volume_position + data.volume_size / 2 + 1e-4
        assert (feasible >= vmin).all() and (feasible <= vmax).all()
        # Carving should reject a decent part of the volume.
        assert len(feasible) < 16**3

    def test_carved_init_points(self, data):
        rng = np.random.default_rng(0)
        pts, rho = carved_init_points(data, rng, 100, carving_volume_size=16,
                                      ratio=0.95)
        assert pts.shape == (100, 3)
        assert rho.shape == (100, 1)
        assert np.isfinite(pts).all()

    def test_exact_mesh_sampling_runs(self, data):
        rng = np.random.default_rng(0)
        pts, rho = carved_init_points(
            data, rng, 100, carving_volume_size=16, ratio=0.95,
            exact_mesh_sampling=True,
        )
        assert pts.shape == (100, 3)
        assert np.isfinite(pts).all()


class TestSurfaceSampling:
    """`sample_from_feasible_surface` (reference `gaussian_utils.py:146-154`
    optional Poisson-mesh branch): surface samples must concentrate ON the
    carved-set boundary where voxel jittering fills the interior."""

    def _ball(self, s=24, radius=0.3):
        # Solid-ball feasible set centered at the origin inside [-0.5, 0.5]^3.
        ax = np.linspace(-0.5, 0.5, s, dtype=np.float32)
        g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
        return g[np.linalg.norm(g, axis=1) <= radius], s, radius

    def test_surface_vs_jitter_distribution(self):
        from nlos_gaussian_renderer_tpu.utils.init import (
            sample_from_feasible_space_jittering,
            sample_from_feasible_surface,
        )

        feasible, s, radius = self._ball()
        pmin = np.full(3, -0.5, np.float32)
        pmax = np.full(3, 0.5, np.float32)
        rng = np.random.default_rng(1)
        surf, _ = sample_from_feasible_surface(
            rng, 800, feasible, pmin, pmax, s
        )
        jit, _ = sample_from_feasible_space_jittering(
            np.random.default_rng(1), 800, feasible, pmin, pmax, s
        )
        r_surf = np.linalg.norm(surf, axis=1)
        r_jit = np.linalg.norm(jit, axis=1)
        voxel = 1.0 / (s - 1)
        # Surface samples hug the sphere radius (within ~1.5 voxels).
        assert abs(np.median(r_surf) - radius) < 1.5 * voxel
        assert np.std(r_surf) < 2 * voxel
        # Jittered samples fill the ball: wide radius spread, many interior.
        assert np.std(r_jit) > 3 * np.std(r_surf)
        # Volume fraction within radius - 2 voxels of a uniform ball is
        # ((r-2v)/r)^3 ~ 0.36; jitter must land a sizable interior share.
        assert (r_jit < radius - 2 * voxel).mean() > 0.15

    def test_sparse_set_falls_back(self):
        from nlos_gaussian_renderer_tpu.utils.init import (
            sample_from_feasible_surface,
        )

        # A single feasible voxel has no interior/exterior crossing faces
        # beyond its own cell; sampler must still return valid points.
        pmin = np.full(3, -0.5, np.float32)
        pmax = np.full(3, 0.5, np.float32)
        pts, rho = sample_from_feasible_surface(
            np.random.default_rng(0), 50,
            np.zeros((1, 3), np.float32), pmin, pmax, 8,
        )
        assert pts.shape == (50, 3)
        assert np.isfinite(pts).all()


class TestRandomInit:
    def test_margin_bounds(self):
        rng = np.random.default_rng(0)
        pmin = np.array([-1.0, 0.5, -1.0])
        pmax = np.array([1.0, 1.5, 1.0])
        pts, rho = init_rand_points(rng, 500, pmin, pmax, margin=0.1)
        lo = pmin + np.abs(pmin * 0.1)
        hi = pmax - np.abs(pmax * 0.1)
        assert (pts >= lo - 1e-6).all() and (pts <= hi + 1e-6).all()
        assert (rho >= 0).all() and (rho <= 0.1).all()


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax

        from nlos_gaussian_renderer_tpu.train import (
            create_train_state,
            make_optimizer,
        )
        from nlos_gaussian_renderer_tpu.utils.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
        )

        rng = np.random.default_rng(1)
        scene = init_scene(
            rng.uniform(-1, 1, (8, 3)).astype(np.float32),
            rng.uniform(0, 1, (8, 1)).astype(np.float32),
            [-1] * 3, [1] * 3, max_sh_degree=1,
        )
        tx = make_optimizer(OptimizationParams())
        state = create_train_state(scene, tx)
        target = save_checkpoint(str(tmp_path / "ckpt"), state)
        assert latest_checkpoint(str(tmp_path / "ckpt")) == target

        template = create_train_state(scene, tx)
        restored = restore_checkpoint(target, template)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestExport:
    @pytest.fixture(scope="class")
    def scene(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(-0.2, 0.2, (12, 3)).astype(np.float32) + np.array(
            [0, 1.0, 0], np.float32
        )
        return init_scene(
            pts, rng.uniform(0.3, 0.8, (12, 1)).astype(np.float32),
            [-0.3, 0.7, -0.3], [0.3, 1.3, 0.3], max_sh_degree=0,
        )

    def test_density_grid(self, scene):
        from nlos_gaussian_renderer_tpu.utils.export import density_grid

        grid, axis = density_grid(scene, [0, 1.0, 0], 0.6, resolution=24)
        assert grid.shape == (24, 24, 24)
        assert grid.max() > grid.mean() > 0

    def test_point_cloud_and_ply(self, scene, tmp_path):
        from nlos_gaussian_renderer_tpu.utils.export import (
            extract_point_cloud,
            write_ply,
        )

        pts, normals = extract_point_cloud(scene, [0, 1.0, 0], 0.6, resolution=24)
        assert len(pts) > 0
        np.testing.assert_allclose(
            np.linalg.norm(normals, axis=-1), 1.0, rtol=1e-3
        )
        p = str(tmp_path / "cloud.ply")
        write_ply(p, pts, normals=normals)
        header = open(p).read(200)
        assert header.startswith("ply")
        assert f"element vertex {len(pts)}" in header

    def test_mesh_extraction(self, scene, tmp_path):
        from nlos_gaussian_renderer_tpu.utils.export import (
            gaussian_to_mesh,
            write_ply,
        )

        verts, faces = gaussian_to_mesh(scene, [0, 1.0, 0], 0.6, resolution=24)
        assert len(verts) > 0 and len(faces) > 0
        assert faces.max() < len(verts)
        p = str(tmp_path / "mesh.ply")
        write_ply(p, verts, faces=faces)
        txt = open(p).read()
        assert f"element face {len(faces)}" in txt


class TestMeshPostProcessing:
    """Quality parity with the reference's Poisson pipeline
    (`nlos_helpers.py:58-69`): crossing-point placement, quantile trim,
    Taubin smoothing."""

    def _sphere_grid(self, r=32, rad=0.3):
        axis = np.linspace(-0.5, 0.5, r).astype(np.float32)
        g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1)
        dist = np.linalg.norm(g, axis=-1)
        return (rad - dist).astype(np.float32), axis

    def test_vertices_hug_isosurface(self):
        from nlos_gaussian_renderer_tpu.utils.export import surface_nets_mesh

        grid, axis = self._sphere_grid()
        verts, faces = surface_nets_mesh(grid, axis, np.zeros(3), 0.0)
        assert len(verts) > 0 and len(faces) > 0
        radii = np.linalg.norm(verts, axis=-1)
        # Crossing-centroid placement keeps vertices within a small fraction
        # of a cell of the true sphere (cell size ~ 1/31 = 0.032).
        h = axis[1] - axis[0]
        assert np.abs(radii - 0.3).max() < 0.8 * h, np.abs(radii - 0.3).max()
        # And far tighter on average than cell-center snapping would be.
        assert np.abs(radii - 0.3).mean() < 0.25 * h

    def test_taubin_smooth_reduces_roughness_without_shrink(self):
        from nlos_gaussian_renderer_tpu.utils.export import (
            surface_nets_mesh,
            taubin_smooth,
        )

        grid, axis = self._sphere_grid()
        verts, faces = surface_nets_mesh(grid, axis, np.zeros(3), 0.0)
        rng = np.random.default_rng(0)
        rough = verts + rng.normal(0, 0.004, verts.shape).astype(np.float32)
        sm = taubin_smooth(rough, faces, iterations=10)

        def roughness(v):
            return float(np.std(np.linalg.norm(v, axis=-1)))

        assert roughness(sm) < 0.5 * roughness(rough)
        # Shrink-free: mean radius preserved within 2%.
        r0 = float(np.mean(np.linalg.norm(rough, axis=-1)))
        r1 = float(np.mean(np.linalg.norm(sm, axis=-1)))
        assert abs(r1 - r0) / r0 < 0.02

    def test_quantile_trim_removes_low_density_wisp(self):
        from nlos_gaussian_renderer_tpu.utils.export import (
            trim_mesh_by_vertex_density,
        )

        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5], [6, 5, 5], [5, 6, 5]],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        dens = np.array([1.0, 1.0, 1.0, 0.01, 0.01, 0.01])
        v2, f2 = trim_mesh_by_vertex_density(verts, faces, dens, quantile=0.5)
        assert len(v2) == 3
        assert len(f2) == 1
        np.testing.assert_array_equal(f2[0], [0, 1, 2])
        np.testing.assert_allclose(v2, verts[:3])

    def test_gaussian_to_mesh_postprocessed(self):
        from nlos_gaussian_renderer_tpu.utils.export import gaussian_to_mesh

        rng = np.random.default_rng(2)
        pts = rng.uniform(-0.15, 0.15, (12, 3)).astype(np.float32) + np.array(
            [0, 1.0, 0], np.float32
        )
        scene = init_scene(
            pts, rng.uniform(0.3, 0.8, (12, 1)).astype(np.float32),
            [-0.3, 0.7, -0.3], [0.3, 1.3, 0.3], max_sh_degree=0,
        )
        v_raw, f_raw = gaussian_to_mesh(
            scene, [0, 1.0, 0], 0.6, resolution=24, trim_quantile=None,
            smooth_iters=0,
        )
        v_pp, f_pp = gaussian_to_mesh(scene, [0, 1.0, 0], 0.6, resolution=24)
        assert len(v_pp) > 0 and len(f_pp) > 0
        assert f_pp.max() < len(v_pp)
        assert len(v_pp) <= len(v_raw)  # trim only removes


class TestSphericalVolumeQuery:
    def test_reference_parity_query(self):
        import jax.numpy as jnp

        from nlos_gaussian_renderer_tpu.ops import math as gmath
        from nlos_gaussian_renderer_tpu.utils.export import (
            gaussian2volume_spherical,
        )

        rng = np.random.default_rng(5)
        vol = np.array([0, 1.0, 0], np.float32)
        pts = vol + rng.uniform(-0.15, 0.15, (10, 3)).astype(np.float32)
        scene = init_scene(
            pts, rng.uniform(0.3, 0.8, (10, 1)).astype(np.float32),
            vol - 0.3, vol + 0.3, max_sh_degree=0, knn_scale_init=False,
        )
        box = gmath.volume_box_points(jnp.asarray(vol), 0.6)
        dense_pts, dens, sample_pts = gaussian2volume_spherical(
            scene, jnp.asarray([0.0, 0.0, 0.0]), box,
            num_sampling_points=8, start=60, end=140, c=1.0, delta_t=0.01,
        )
        assert sample_pts.shape == (80 * 64, 3)
        assert dens.shape == (80 * 64,)
        assert 0 < len(dense_pts) < len(sample_pts)
        # Dense points must be closer to the Gaussian cluster on average.
        d_dense = np.linalg.norm(dense_pts - vol, axis=1).mean()
        d_all = np.linalg.norm(sample_pts - vol, axis=1).mean()
        assert d_dense < d_all
