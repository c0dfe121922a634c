"""Multi-device (8 virtual CPU devices) sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams
from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.render import RenderSettings
from nlos_gaussian_renderer_tpu.parallel.mesh import make_mesh
from nlos_gaussian_renderer_tpu.parallel.sharding import (
    make_sharded_train_step,
    shard_scene,
    state_specs,
)
from nlos_gaussian_renderer_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    prepare_training,
)


@pytest.fixture(scope="module")
def setup():
    data = make_synthetic_dataset(
        seed=1, scan_m=4, scan_n=4, num_bins=64, num_gt_gaussians=8,
        num_sampling_points=8,
    )
    nz = np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0]
    cfg = Config(
        start=int(nz[0]),
        end=int(nz[-1]) + 1,
        num_sampling_points=8,
        sh_degree=1,
        init_gaussian_num=32,
        space_carving_init=False,
        batch_size=4,
    )
    optim = OptimizationParams()
    scene, tx, settings, box = prepare_training(cfg, optim, data)
    return data, cfg, optim, scene, tx, settings, box


def test_eight_devices_available():
    assert jax.device_count() >= 8


class TestShardedStep:
    def test_matches_single_device(self, setup):
        data, cfg, optim, scene, tx, settings, box = setup
        mesh = make_mesh([2, 4], ("scan", "gauss"))

        state0 = create_train_state(scene, tx)
        single = make_train_step(settings, optim, tx, cfg.sh_degree)
        sharded = make_sharded_train_step(
            mesh, settings, optim, tx, cfg.sh_degree, state0
        )

        rng = np.random.default_rng(0)
        idx = rng.integers(0, 16, size=4)
        cams = jnp.asarray(data.camera_grid_positions.T[idx])
        targets = jnp.asarray(
            data.nlos_data.reshape(64, -1)[cfg.start : cfg.end].T[idx] * cfg.gt_times
        )
        vol = jnp.asarray(data.volume_position)

        # Fresh copies per step: both step functions donate their state, so
        # reusing the same underlying buffers across calls is invalid.
        def fresh_state():
            return create_train_state(jax.tree.map(jnp.copy, scene), tx)

        s1, a1 = single(fresh_state(), cams, targets, box, data.c, data.deltaT, vol)
        state_sh = shard_scene(fresh_state(), mesh)
        s2, a2 = sharded(state_sh, cams, targets, box, data.c, data.deltaT, vol)

        np.testing.assert_allclose(float(a1.loss), float(a2.loss), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s1.scene.means), np.asarray(s2.scene.means), rtol=1e-3,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(s1.scene.logit_opacities),
            np.asarray(s2.scene.logit_opacities),
            rtol=1e-3, atol=1e-6,
        )

    def test_multi_step_stability(self, setup):
        data, cfg, optim, scene, tx, settings, box = setup
        mesh = make_mesh([4, 2], ("scan", "gauss"))
        state0 = create_train_state(jax.tree.map(jnp.copy, scene), tx)
        sharded = make_sharded_train_step(
            mesh, settings, optim, tx, cfg.sh_degree, state0
        )
        state = shard_scene(state0, mesh)
        rng = np.random.default_rng(1)
        vol = jnp.asarray(data.volume_position)
        for _ in range(3):
            idx = rng.integers(0, 16, size=4)
            cams = jnp.asarray(data.camera_grid_positions.T[idx])
            targets = jnp.asarray(
                data.nlos_data.reshape(64, -1)[cfg.start : cfg.end].T[idx]
                * cfg.gt_times
            )
            state, aux = sharded(state, cams, targets, box, data.c, data.deltaT, vol)
            assert np.isfinite(float(aux.loss))
        assert int(state.step) == 4

    def test_state_specs(self, setup):
        _, _, _, scene, tx, _, _ = setup
        state = create_train_state(scene, tx)
        specs = state_specs(state)
        assert specs.scene.means == jax.sharding.PartitionSpec("gauss", None)
        assert specs.scene.alive == jax.sharding.PartitionSpec("gauss")
        assert specs.step == jax.sharding.PartitionSpec()


class TestShardedBackends:
    @pytest.mark.parametrize("backend,occ", [
        ("analytic", False), ("analytic", True), ("pallas", True),
        ("pallas_rsort", False), ("pallas_rsort", True),
        ("pallas_analytic", False), ("pallas_analytic", True),
    ])
    def test_gauss_sharded_matches_unsharded(self, setup, backend, occ):
        # Gaussian-sharded rendering must be exact for Gaussian-sum fields.
        from jax.sharding import PartitionSpec as P

        from nlos_gaussian_renderer_tpu.ops.fused import TileSpec
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import RSortSpec
        from nlos_gaussian_renderer_tpu.ops.render import render_transient

        data, cfg, optim, scene, tx, settings, box = setup
        spec = TileSpec(t_theta=4, t_phi=8, t_r=16, k_max=64, a_sub=256,
                        g_tile=32)
        rspec = RSortSpec(t_theta=4, t_phi=8, t_chunk=8, g_tile=32, w_max=128,
                          max_groups=16)
        s = settings._replace(backend=backend, occlusion=occ, tile_spec=spec,
                              rsort_spec=rspec)
        cam = jnp.asarray(data.camera_grid_positions[:, 3])
        vol = jnp.asarray(data.volume_position)

        _, ref, _ = render_transient(scene, cam, box, data.c, data.deltaT, vol,
                                  1, s)

        mesh = make_mesh([1, 8], ("scan", "gauss"))
        specs = jax.tree.map(lambda l: P("gauss", *([None] * (l.ndim - 1))),
                             scene)

        def fn(sc):
            _, h, _ = render_transient(sc, cam, box, data.c, data.deltaT, vol, 1,
                                    s, gauss_axis="gauss")
            return h

        sharded = jax.jit(
            jax.shard_map(fn, mesh=mesh, in_specs=(specs,), out_specs=P(),
                          check_vma=False)
        )
        out = sharded(scene)
        # atol floor: the transposed-slab kernels deposit via a K-contraction
        # dot whose accumulation order differs between the sharded (32-row
        # blocks + psum) and unsharded arrangements; tail bins of ~1e-4
        # magnitude see ~5e-6 absolute rounding differences.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=1e-5)


class TestShardedPallasTraining:
    def test_full_sharded_step_with_pallas_backend(self, setup):
        from nlos_gaussian_renderer_tpu.ops.fused import TileSpec

        data, cfg, optim, scene, tx, settings, box = setup
        spec = TileSpec(t_theta=4, t_phi=8, t_r=16, k_max=64, a_sub=256,
                        g_tile=32)
        s = settings._replace(backend="pallas", tile_spec=spec)
        mesh = make_mesh([2, 4], ("scan", "gauss"))
        state0 = create_train_state(jax.tree.map(jnp.copy, scene), tx)
        step = make_sharded_train_step(mesh, s, optim, tx, cfg.sh_degree,
                                       state0)
        state = shard_scene(state0, mesh)
        idx = np.arange(4)
        cams = jnp.asarray(data.camera_grid_positions.T[idx])
        targets = jnp.asarray(
            data.nlos_data.reshape(64, -1)[cfg.start : cfg.end].T[idx]
            * cfg.gt_times
        )
        state, aux = step(state, cams, targets, box, data.c, data.deltaT,
                          jnp.asarray(data.volume_position))
        assert np.isfinite(float(aux.loss))
        for leaf in jax.tree.leaves(state.scene):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_full_sharded_step_with_rsort_backend(self, setup):
        """The flagship backend (pallas_rsort: searchsorted/argsort culling +
        range-sparse kernels) under the full scan x gauss shard_map step must
        match the single-device step."""
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import RSortSpec

        data, cfg, optim, scene, tx, settings, box = setup
        rspec = RSortSpec(t_theta=4, t_phi=8, t_chunk=8, g_tile=32, w_max=128,
                          max_groups=16)
        s = settings._replace(backend="pallas_rsort", rsort_spec=rspec)
        mesh = make_mesh([2, 4], ("scan", "gauss"))
        idx = np.arange(4)
        cams = jnp.asarray(data.camera_grid_positions.T[idx])
        targets = jnp.asarray(
            data.nlos_data.reshape(64, -1)[cfg.start : cfg.end].T[idx]
            * cfg.gt_times
        )
        vol = jnp.asarray(data.volume_position)

        def fresh_state():
            return create_train_state(jax.tree.map(jnp.copy, scene), tx)

        single = make_train_step(s, optim, tx, cfg.sh_degree)
        s1, a1 = single(fresh_state(), cams, targets, box, data.c,
                        data.deltaT, vol)

        state0 = fresh_state()
        step = make_sharded_train_step(mesh, s, optim, tx, cfg.sh_degree,
                                       state0)
        state = shard_scene(state0, mesh)
        state, aux = step(state, cams, targets, box, data.c, data.deltaT, vol)
        assert np.isfinite(float(aux.loss))
        assert not bool(aux.overflow)
        np.testing.assert_allclose(float(a1.loss), float(aux.loss), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s1.scene.means), np.asarray(state.scene.means),
            rtol=1e-3, atol=1e-6,
        )


class TestShardedScannedStep:
    """VERDICT r2 #7: the scan-chunked step composed with shard_map — K
    sequential sharded steps inside ONE dispatch must match K separate
    sharded dispatches (on real pods dispatch cost is per-host, so chunking
    matters even more multi-chip than single-chip)."""

    def _batches(self, data, cfg, rng, k):
        idx = rng.integers(0, 16, size=(k, 4))
        cams = jnp.asarray(
            np.stack([data.camera_grid_positions.T[i] for i in idx])
        )
        tgt = data.nlos_data.reshape(64, -1)[cfg.start:cfg.end] * cfg.gt_times
        targets = jnp.asarray(np.stack([tgt.T[i] for i in idx]))
        return cams, targets

    @pytest.mark.parametrize("backend", ["dense", "pallas_rsort"])
    def test_matches_sequential_sharded(self, setup, backend):
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import RSortSpec
        from nlos_gaussian_renderer_tpu.parallel.sharding import (
            make_sharded_scanned_train_step,
        )

        data, cfg, optim, scene, tx, settings, box = setup
        if backend == "pallas_rsort":
            rspec = RSortSpec(t_theta=4, t_phi=8, t_chunk=8, g_tile=32,
                              w_max=128, max_groups=16)
            settings = settings._replace(backend=backend, rsort_spec=rspec)
        mesh = make_mesh([2, 4], ("scan", "gauss"))
        vol = jnp.asarray(data.volume_position)
        k = 3
        cams_k, targets_k = self._batches(
            data, cfg, np.random.default_rng(5), k
        )

        def fresh_sharded_state():
            return shard_scene(
                create_train_state(jax.tree.map(jnp.copy, scene), tx), mesh
            )

        single = make_sharded_train_step(
            mesh, settings, optim, tx, cfg.sh_degree,
            create_train_state(scene, tx),
        )
        st1 = fresh_sharded_state()
        losses_seq = []
        for i in range(k):
            st1, aux = single(st1, cams_k[i], targets_k[i], box, data.c,
                              data.deltaT, vol)
            losses_seq.append(float(aux.loss))

        chunked = make_sharded_scanned_train_step(
            mesh, settings, optim, tx, cfg.sh_degree,
            create_train_state(scene, tx),
        )
        st2 = fresh_sharded_state()
        st2, auxs = chunked(st2, cams_k, targets_k, box, data.c, data.deltaT,
                            vol)
        np.testing.assert_allclose(
            np.asarray(auxs.loss), losses_seq, rtol=1e-5
        )
        assert not bool(auxs.overflow)
        assert int(st2.step) == int(st1.step) == k + 1
        np.testing.assert_allclose(
            np.asarray(st2.scene.means), np.asarray(st1.scene.means),
            rtol=1e-5, atol=1e-7,
        )
        # State keeps its gauss sharding through the scan.
        assert st2.scene.means.sharding.spec[0] == "gauss"


class TestShardedDensify:
    def test_matches_single_device(self, setup):
        """GSPMD-partitioned densification must reproduce the single-chip
        result exactly (global donor multinomial, cross-shard donor rows)."""
        from nlos_gaussian_renderer_tpu.models.densify import densify_step
        from nlos_gaussian_renderer_tpu.parallel.sharding import (
            make_sharded_densify_step,
        )

        data, cfg, optim, scene, tx, settings, box = setup
        import dataclasses

        # Kill half the population so relocation has work to do, and leave
        # dead capacity so growth has room.
        rng = np.random.default_rng(3)
        lo = np.array(scene.logit_opacities)
        lo[::3] = -12.0  # opacity ~ 6e-6 <= dead threshold
        scene = dataclasses.replace(scene, logit_opacities=jnp.asarray(lo))
        alive = np.array(scene.alive)
        alive[24:] = 0.0
        scene = dataclasses.replace(scene, alive=jnp.asarray(alive))

        key = jax.random.PRNGKey(11)
        state = create_train_state(jax.tree.map(jnp.copy, scene), tx)
        ref_scene, ref_opt = densify_step(
            jax.tree.map(jnp.copy, scene), state.opt_state, key, cap_max=32
        )

        mesh = make_mesh([2, 4], ("scan", "gauss"))
        state_sh = shard_scene(
            create_train_state(jax.tree.map(jnp.copy, scene), tx), mesh
        )
        densify = make_sharded_densify_step(mesh, state_sh, cap_max=32)
        got_scene, got_opt = densify(state_sh.scene, state_sh.opt_state, key)

        for name in ("means", "log_scales", "quats", "logit_opacities",
                     "sh_dc", "sh_rest", "alive"):
            np.testing.assert_allclose(
                np.asarray(getattr(got_scene, name)),
                np.asarray(getattr(ref_scene, name)),
                rtol=1e-6, atol=1e-7, err_msg=name,
            )
        # Output keeps the canonical gauss sharding.
        spec = got_scene.means.sharding.spec
        assert spec[0] == "gauss", spec
        # Grown population is finite and at least as large.
        assert float(jnp.sum(got_scene.alive)) >= float(jnp.sum(scene.alive))


class TestShardedTrainingConverges:
    def test_loss_decreases_on_virtual_mesh(self, setup):
        # A short full training run on the 8-device mesh: loss must drop.
        data, cfg, optim, scene, tx, settings, box = setup
        mesh = make_mesh([4, 2], ("scan", "gauss"))
        state0 = create_train_state(jax.tree.map(jnp.copy, scene), tx)
        step = make_sharded_train_step(mesh, settings, optim, tx,
                                       cfg.sh_degree, state0)
        state = shard_scene(state0, mesh)
        rng = np.random.default_rng(7)
        vol = jnp.asarray(data.volume_position)

        from nlos_gaussian_renderer_tpu.ops.render import render_histogram_batch

        val_cams = jnp.asarray(data.camera_grid_positions.T[:8])
        val_targets = jnp.asarray(
            data.nlos_data.reshape(64, -1)[cfg.start : cfg.end].T[:8]
            * cfg.gt_times
        )

        def val_loss(scene_, deg):
            pred = render_histogram_batch(
                scene_, val_cams, box, data.c, data.deltaT, vol, deg, settings
            )
            return float(jnp.mean((pred - val_targets) ** 2))

        before = val_loss(scene, 0)
        for it in range(40):
            idx = rng.integers(0, 16, size=4)
            cams = jnp.asarray(data.camera_grid_positions.T[idx])
            targets = jnp.asarray(
                data.nlos_data.reshape(64, -1)[cfg.start : cfg.end].T[idx]
                * cfg.gt_times
            )
            state, aux = step(state, cams, targets, box, data.c, data.deltaT,
                              vol)
            assert np.isfinite(float(aux.loss))
        after = val_loss(
            jax.tree.map(np.asarray, state.scene).__class__(
                **{k: jnp.asarray(np.asarray(getattr(state.scene, k)))
                   for k in ("means", "log_scales", "quats", "logit_opacities",
                             "sh_dc", "sh_rest", "alive")}
            ),
            int(state.active_sh_degree),
        )
        assert after < before * 0.9, (before, after)
