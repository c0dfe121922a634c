"""End-to-end training tests on synthetic data (M1 slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams
from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
from nlos_gaussian_renderer_tpu.ops.schedule import expon_lr_schedule
from nlos_gaussian_renderer_tpu.train import fit, make_optimizer, scan_point_stream


@pytest.fixture(scope="module")
def tiny_data():
    return make_synthetic_dataset(
        seed=0, scan_m=4, scan_n=4, num_bins=64, num_gt_gaussians=8,
        num_sampling_points=8,
    )


def tiny_config(data, **kw):
    start = int(np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0][0])
    end = int(np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0][-1]) + 1
    defaults = dict(
        start=start,
        end=end,
        num_sampling_points=8,
        sh_degree=1,
        init_gaussian_num=32,
        space_carving_init=False,
        save_fig=False,
        gt_times=100.0,
        batch_size=2,
    )
    defaults.update(kw)
    return Config(**defaults)


class TestSchedule:
    def test_expon_endpoints(self):
        s = expon_lr_schedule(1e-3, 1e-5, max_steps=100)
        assert float(s(0)) == pytest.approx(1e-3, rel=1e-4)
        assert float(s(100)) == pytest.approx(1e-5, rel=1e-4)
        # log-linear midpoint.
        assert float(s(50)) == pytest.approx(1e-4, rel=1e-4)

    def test_delay_mult(self):
        s = expon_lr_schedule(1e-3, 1e-5, lr_delay_steps=10, lr_delay_mult=0.1,
                              max_steps=100)
        assert float(s(0)) == pytest.approx(1e-4, rel=1e-4)

    def test_disabled(self):
        s = expon_lr_schedule(0.0, 0.0)
        assert float(s(10)) == 0.0


class TestScanStream:
    def test_epoch_coverage(self):
        rng = np.random.default_rng(0)
        stream = scan_point_stream(rng, 3, 4, batch=4)
        seen = np.concatenate([next(stream) for _ in range(3)])
        assert sorted(seen.tolist()) == list(range(12))

    def test_batch_shape(self):
        stream = scan_point_stream(np.random.default_rng(1), 4, 4, batch=5)
        assert next(stream).shape == (5,)


class TestScannedStep:
    def test_scanned_chunk_matches_sequential(self, tiny_data):
        """K steps via one lax.scan dispatch == K sequential jitted steps."""
        import jax

        from nlos_gaussian_renderer_tpu.ops.render import RenderSettings
        from nlos_gaussian_renderer_tpu.train import (
            create_train_state,
            make_optimizer,
            make_scanned_train_step,
            make_train_step,
            prepare_training,
        )

        data = tiny_data
        cfg = tiny_config(data, batch_size=2)
        optim = OptimizationParams()
        scene, tx, settings, box = prepare_training(cfg, optim, data)
        vol = jnp.asarray(data.volume_position)
        k = 4
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 16, size=(k, 2))
        cams_k = jnp.asarray(
            np.stack([data.camera_grid_positions.T[i] for i in idx])
        )
        tgt = data.nlos_data.reshape(64, -1)[cfg.start:cfg.end] * cfg.gt_times
        tgts_k = jnp.asarray(np.stack([tgt.T[i] for i in idx]))

        step = make_train_step(settings, optim, tx, cfg.sh_degree)
        st1 = create_train_state(jax.tree.map(jnp.copy, scene), tx)
        losses_seq = []
        for i in range(k):
            st1, aux = step(st1, cams_k[i], tgts_k[i], box, data.c,
                            data.deltaT, vol)
            losses_seq.append(float(aux.loss))

        step_k = make_scanned_train_step(settings, optim, tx, cfg.sh_degree)
        st2 = create_train_state(jax.tree.map(jnp.copy, scene), tx)
        st2, auxs = step_k(
            st2, cams_k, tgts_k, box, data.c, data.deltaT, vol
        )
        np.testing.assert_allclose(
            np.asarray(auxs.loss), losses_seq, rtol=1e-6
        )
        assert not bool(auxs.overflow)
        assert auxs.pred_hist.shape[0] == k
        np.testing.assert_allclose(
            np.asarray(st2.scene.means), np.asarray(st1.scene.means),
            rtol=1e-6, atol=1e-8,
        )
        assert int(st2.step) == int(st1.step)


class TestUnbatchedPath:
    def test_b1_matches_vmap_row(self, tiny_data):
        """batched_loss_fn's unbatched B=1 fast path (taken because vmap's
        dim-1 sort lowering is slow on hardware) must agree with the vmap'd
        path evaluated on the same scan point."""
        from nlos_gaussian_renderer_tpu.train import (
            batched_loss_fn,
            prepare_training,
        )

        data = tiny_data
        cfg = tiny_config(data, batch_size=1, renderer="pallas_rsort")
        optim = OptimizationParams()
        scene, tx, settings, box = prepare_training(cfg, optim, data)
        vol = jnp.asarray(data.volume_position)
        cam = jnp.asarray(data.camera_grid_positions.T[5])
        tgt = jnp.asarray(
            data.nlos_data.reshape(64, -1)[cfg.start:cfg.end, 5]
            * cfg.gt_times
        )

        def run(cams, tgts):
            return batched_loss_fn(
                scene, cams, tgts, box, data.c, data.deltaT, vol,
                jnp.asarray(cfg.sh_degree), settings, optim,
            )

        loss1, aux1 = jax.jit(run)(cam[None], tgt[None])
        # B=2 with duplicated rows exercises the vmap branch; its per-row
        # values must match the unbatched trace.
        loss2, aux2 = jax.jit(run)(
            jnp.stack([cam, cam]), jnp.stack([tgt, tgt])
        )
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(aux1.pred_hist[0]), np.asarray(aux2.pred_hist[0]),
            rtol=2e-5, atol=1e-9,
        )
        assert aux1.pred_hist.shape[0] == 1

        grads1 = jax.jit(
            jax.grad(lambda s, c_, t_: batched_loss_fn(
                s, c_, t_, box, data.c, data.deltaT, vol,
                jnp.asarray(cfg.sh_degree), settings, optim,
            )[0])
        )(scene, cam[None], tgt[None])
        grads2 = jax.jit(
            jax.grad(lambda s, c_, t_: batched_loss_fn(
                s, c_, t_, box, data.c, data.deltaT, vol,
                jnp.asarray(cfg.sh_degree), settings, optim,
            )[0])
        )(scene, jnp.stack([cam, cam]), jnp.stack([tgt, tgt]))
        np.testing.assert_allclose(
            np.asarray(grads1.means), np.asarray(grads2.means),
            rtol=1e-4, atol=1e-7,
        )


class TestFit:
    def test_loss_decreases(self, tiny_data):
        cfg = tiny_config(tiny_data)
        optim = OptimizationParams(warmup_iter=0)
        res = fit(cfg, optim, tiny_data, num_iters=60, log_every=10)
        assert np.all(np.isfinite(res.losses))
        # Training on its own GT-rendered data must reduce the loss clearly.
        assert res.losses[-1] < res.losses[0] * 0.7, res.losses

    def test_regularization_runs(self, tiny_data):
        cfg = tiny_config(tiny_data, batch_size=1)
        optim = OptimizationParams(regularization=True)
        res = fit(cfg, optim, tiny_data, num_iters=5, log_every=1)
        assert np.all(np.isfinite(res.losses))

    def test_occlusion_training(self, tiny_data):
        cfg = tiny_config(tiny_data, occlusion=True, occlusion_mode="aggregate")
        optim = OptimizationParams()
        res = fit(cfg, optim, tiny_data, num_iters=5, log_every=1)
        assert np.all(np.isfinite(res.losses))

    def test_sh_annealing(self, tiny_data):
        cfg = tiny_config(tiny_data)
        optim = OptimizationParams()
        degrees = []
        res = fit(
            cfg, optim, tiny_data, num_iters=3, log_every=1,
            callback=lambda it, st, aux: degrees.append(int(st.active_sh_degree)),
        )
        assert degrees[0] == 0  # not bumped at step 2
        assert int(res.state.step) == 4


class TestOptimizer:
    def test_multi_group_lrs_applied(self):
        # Gradient of 1 on every param: update magnitude ~ lr per group.
        from nlos_gaussian_renderer_tpu.models.scene import init_scene

        optim = OptimizationParams()
        tx = make_optimizer(optim)
        scene = init_scene(
            np.zeros((4, 3), np.float32), 0.5 * np.ones((4, 1), np.float32),
            [-1] * 3, [1] * 3, max_sh_degree=1,
        )
        opt_state = tx.init(scene)
        grads = jax.tree.map(jnp.ones_like, scene)
        updates, _ = tx.update(grads, opt_state, scene)
        np.testing.assert_allclose(
            -np.asarray(updates.logit_opacities), optim.opacity_lr, rtol=1e-3
        )
        np.testing.assert_allclose(
            -np.asarray(updates.log_scales), optim.scaling_lr, rtol=1e-3
        )
        np.testing.assert_allclose(
            -np.asarray(updates.sh_dc), optim.feature_lr, rtol=1e-3
        )
        np.testing.assert_allclose(
            -np.asarray(updates.sh_rest), optim.feature_lr / 20, rtol=1e-3
        )
        # Position uses the schedule at step 0.
        np.testing.assert_allclose(
            -np.asarray(updates.means), optim.position_lr_init, rtol=1e-3
        )
        # Alive mask is frozen.
        np.testing.assert_allclose(np.asarray(updates.alive), 0.0)


class TestSynthetic:
    def test_dataset_window(self, tiny_data):
        nz = np.nonzero(tiny_data.nlos_data.sum(axis=(1, 2)))[0]
        assert len(nz) > 10
        assert tiny_data.nlos_data.shape == (64, 4, 4)
        assert np.all(tiny_data.nlos_data >= 0)

    def test_mat_roundtrip(self, tiny_data, tmp_path):
        from nlos_gaussian_renderer_tpu.data.zaragoza import (
            load_zaragoza256_data,
            save_zaragoza_mat,
        )

        p = str(tmp_path / "synthetic.mat")
        save_zaragoza_mat(p, tiny_data)
        back = load_zaragoza256_data(p)
        np.testing.assert_allclose(back.nlos_data, tiny_data.nlos_data, rtol=1e-6)
        np.testing.assert_allclose(
            back.camera_grid_positions, tiny_data.camera_grid_positions, rtol=1e-6
        )
        assert back.deltaT == pytest.approx(tiny_data.deltaT)
        assert back.c == pytest.approx(tiny_data.c)


class TestBackendTrainingParity:
    def test_pallas_loss_curve_tracks_dense(self, tiny_data):
        # BASELINE.json: "loss curve matches CUDA/dense reference". Train the
        # same init with both backends; curves must track closely.
        cfg_d = tiny_config(tiny_data, batch_size=1)
        cfg_p = tiny_config(
            tiny_data, batch_size=1, renderer="pallas", gaussian_capacity=32,
            cull_tile=(4, 8, 16), cull_k_max=64,
        )
        optim = OptimizationParams()
        res_d = fit(cfg_d, optim, tiny_data, num_iters=30, log_every=5)
        res_p = fit(cfg_p, optim, tiny_data, num_iters=30, log_every=5)
        np.testing.assert_allclose(res_p.losses, res_d.losses, rtol=0.02)


class TestStanfordLoader:
    def test_layout_detection_and_conversion(self, tmp_path):
        import scipy.io as sio

        from nlos_gaussian_renderer_tpu.data.stanford import load_stanford_data

        rng = np.random.default_rng(0)
        # (M, N, T) layout with T dominant
        meas = rng.random((16, 16, 512)).astype(np.float32)
        p = str(tmp_path / "stanford.mat")
        sio.savemat(p, {"meas": meas})
        d = load_stanford_data(p, wall_size=2.0, bin_ps=32.0)
        assert d.shape == (512, 16, 16)
        np.testing.assert_allclose(
            d.nlos_data, np.moveaxis(meas, 2, 0), rtol=1e-6
        )
        # 32 ps of light travel ~ 9.6 mm
        assert d.deltaT == pytest.approx(0.0095926, rel=1e-3)
        assert d.camera_grid_positions.shape == (3, 256)
        assert d.volume_position[1] == pytest.approx(1.0)

    def test_downsample_and_crop(self, tmp_path):
        import scipy.io as sio

        from nlos_gaussian_renderer_tpu.data.stanford import load_stanford_data

        meas = np.ones((600, 8, 8), np.float32)  # (T, M, N) layout
        p = str(tmp_path / "s2.mat")
        sio.savemat(p, {"rect_data": meas})
        d = load_stanford_data(p, downsample_t=4, crop_t=100)
        assert d.shape == (100, 8, 8)
        np.testing.assert_allclose(d.nlos_data, 4.0)
        assert d.deltaT == pytest.approx(4 * 32e-12 * 2.99792458e8, rel=1e-6)

    def test_tofgrid_alignment(self, tmp_path):
        """'tofgrid' pre-alignment: each pixel's histogram is left-shifted by
        round(tofgrid / bin_ps) bins so bin 0 is the wall's direct bounce."""
        import scipy.io as sio

        from nlos_gaussian_renderer_tpu.data.stanford import load_stanford_data

        rng = np.random.default_rng(1)
        t, m, n = 128, 4, 4
        base_bin = 40
        shifts = rng.integers(0, 20, size=(m, n))
        meas = np.zeros((m, n, t), np.float32)
        for i in range(m):
            for j in range(n):
                meas[i, j, base_bin + shifts[i, j]] = 1.0
        tofgrid = shifts * 32.0  # ps
        p = str(tmp_path / "tof.mat")
        sio.savemat(p, {"meas": meas, "tofgrid": tofgrid})

        d = load_stanford_data(p, bin_ps=32.0)
        # Every pixel's pulse lands back on base_bin.
        peaks = d.nlos_data.argmax(axis=0)
        np.testing.assert_array_equal(peaks, np.full((m, n), base_bin))
        # Without alignment the pulses stay scattered.
        d0 = load_stanford_data(p, bin_ps=32.0, use_tofgrid=False)
        peaks0 = d0.nlos_data.argmax(axis=0)
        np.testing.assert_array_equal(
            peaks0, base_bin + shifts
        )
        # Energy is conserved (no wrap-around; vacated bins zero-filled).
        assert d.nlos_data.sum() == pytest.approx(m * n)

    def test_trains_end_to_end(self, tmp_path):
        import scipy.io as sio

        from nlos_gaussian_renderer_tpu.data.stanford import load_stanford_data

        # Make a plausible capture by rendering our synthetic scene into the
        # Stanford layout, then train briefly from the loaded form.
        base = make_synthetic_dataset(
            seed=9, scan_m=4, scan_n=4, num_bins=64, num_gt_gaussians=6,
            num_sampling_points=8,
        )
        p = str(tmp_path / "s3.mat")
        sio.savemat(p, {"meas": np.moveaxis(base.nlos_data, 0, 2)})
        d = load_stanford_data(
            p, wall_size=0.8, bin_ps=base.deltaT / 2.99792458e8 * 1e12,
            volume_distance=1.0, volume_size=0.6,
        )
        assert d.deltaT == pytest.approx(base.deltaT, rel=1e-4)
        nz = np.nonzero(d.nlos_data.sum(axis=(1, 2)))[0]
        cfg = Config(
            start=int(nz[0]), end=int(nz[-1]) + 1, num_sampling_points=8,
            sh_degree=1, init_gaussian_num=16, space_carving_init=False,
            batch_size=1, save_fig=False,
        )
        res = fit(cfg, OptimizationParams(), d, num_iters=5, log_every=1)
        assert np.all(np.isfinite(res.losses))


class TestSgldNoise:
    def test_noise_shapes_and_gating(self):
        import jax

        from nlos_gaussian_renderer_tpu.models.scene import init_scene
        from nlos_gaussian_renderer_tpu.train import sgld_position_noise

        rng = np.random.default_rng(0)
        scene = init_scene(
            rng.uniform(-1, 1, (32, 3)).astype(np.float32),
            rng.uniform(0.2, 0.8, (32, 1)).astype(np.float32),
            [-1] * 3, [1] * 3, max_sh_degree=0,
        )
        # Half dead-opacity, half confident.
        lo = scene.logit_opacities.at[:16].set(-10.0).at[16:].set(10.0)
        import dataclasses

        scene = dataclasses.replace(scene, logit_opacities=lo)
        optim = OptimizationParams(sgld_noise=True)
        noise = sgld_position_noise(
            scene, jax.random.PRNGKey(0), jnp.asarray(1e-4), optim
        )
        assert noise.shape == (32, 3)
        low_mag = float(jnp.abs(noise[:16]).mean())
        high_mag = float(jnp.abs(noise[16:]).mean())
        assert low_mag > 100 * max(high_mag, 1e-30)

    def test_training_with_noise_finite(self, tiny_data):
        cfg = tiny_config(tiny_data, batch_size=1)
        optim = OptimizationParams(sgld_noise=True, noise_lr=1e3)
        res = fit(cfg, optim, tiny_data, num_iters=5, log_every=1)
        assert np.all(np.isfinite(res.losses))


class TestOverflowPrevention:
    """VERDICT r2 #5: overflow must be *prevented*, not just detected — an
    overflow-flagged chunk/window is re-run from its pre-chunk state after a
    cap re-tune, so the final parameters are bit-identical to a run whose
    caps were big enough from the start."""

    def _patch_tiny_initial_caps(self, monkeypatch, train_mod):
        orig = train_mod.fit_culling_capacity
        calls = {"initial": 0}

        def patched(settings, scene, probes, box, c, dt, grow_only=True,
                    **kw):
            if not grow_only:
                # The one-time initial sizing from prepare_training: hand
                # back deliberately starved caps so the first render
                # overflows at runtime.
                calls["initial"] += 1
                tiny = settings.rsort_spec._replace(w_max=4, max_groups=8)
                return settings._replace(rsort_spec=tiny), True
            return orig(settings, scene, probes, box, c, dt,
                        grow_only=grow_only, **kw)

        monkeypatch.setattr(train_mod, "fit_culling_capacity", patched)
        return calls

    def test_chunked_rerun_bit_identical(self, tiny_data, monkeypatch):
        import nlos_gaussian_renderer_tpu.train as train_mod

        cfg = tiny_config(
            tiny_data, renderer="pallas_rsort", init_gaussian_num=64,
            batch_size=1,
        )
        optim = OptimizationParams()
        # Reference run: correctly-sized caps from the start (chunked path:
        # no callback, log_every=10 -> chunk of 10 steps per dispatch).
        res_ref = fit(cfg, optim, tiny_data, num_iters=20, log_every=10)
        assert res_ref.retunes == 0

        calls = self._patch_tiny_initial_caps(monkeypatch, train_mod)
        res = fit(cfg, optim, tiny_data, num_iters=20, log_every=10)
        assert calls["initial"] == 1
        assert res.retunes >= 1, "starved caps must trigger a re-tune"
        assert not res.overflow_detected
        # The overflowed chunk was re-run from its pre-chunk state: no
        # truncated gradient ever reached the optimizer.
        np.testing.assert_array_equal(
            np.asarray(res.state.scene.means),
            np.asarray(res_ref.state.scene.means),
        )
        np.testing.assert_array_equal(
            np.asarray(res.state.scene.logit_opacities),
            np.asarray(res_ref.state.scene.logit_opacities),
        )
        np.testing.assert_array_equal(res.losses, res_ref.losses)

    def test_per_step_window_replay_bit_identical(self, tiny_data,
                                                  monkeypatch):
        import nlos_gaussian_renderer_tpu.train as train_mod

        cfg = tiny_config(
            tiny_data, renderer="pallas_rsort", init_gaussian_num=64,
            batch_size=1,
        )
        optim = OptimizationParams()

        def cb(it, state, aux):
            pass  # per-iter callback (no cadence) forces the per-step path

        res_ref = fit(cfg, optim, tiny_data, num_iters=10, log_every=5,
                      callback=cb)
        assert res_ref.retunes == 0

        calls = self._patch_tiny_initial_caps(monkeypatch, train_mod)
        res = fit(cfg, optim, tiny_data, num_iters=10, log_every=5,
                  callback=cb)
        assert calls["initial"] == 1
        assert res.retunes >= 1
        assert not res.overflow_detected
        np.testing.assert_array_equal(
            np.asarray(res.state.scene.means),
            np.asarray(res_ref.state.scene.means),
        )
        np.testing.assert_array_equal(res.losses, res_ref.losses)


class TestDensifiedChunked:
    """VERDICT r3 #4: densified training rides the scan-chunked fast path.
    The MCMC densify hook runs in-graph inside the scanned chunk (lax.cond
    on the post-update step counter), with keys derived by
    fold_in(PRNGKey(rng+1), step) in both paths — so the chunked and
    per-step densified loops walk identical parameter trajectories, and the
    overflow-replay bit-identity guarantee extends across densify events."""

    def _cfg_optim(self, tiny_data):
        cfg = tiny_config(
            tiny_data, renderer="pallas_rsort", init_gaussian_num=48,
            batch_size=1,
        )
        # interval=4 with chunk=10 puts densify events strictly MID-chunk.
        optim = OptimizationParams(
            mcmc_densification_flag=True, densify_from_iter=1,
            densify_until_iter=1000, densification_interval=4, cap_max=256,
        )
        return cfg, optim

    def test_chunked_path_is_used_and_matches_per_step(self, tiny_data):
        cfg, optim = self._cfg_optim(tiny_data)
        # Per-step reference (per-iter callback forces the per-step path).
        res_ps = fit(cfg, optim, tiny_data, num_iters=20, log_every=10,
                     callback=lambda *a: None)
        # Chunked run (no callback, log_every=10 -> 10-step scan chunks).
        res_ck = fit(cfg, optim, tiny_data, num_iters=20, log_every=10)

        # Both paths must actually have densified (interval=4, 20 iters).
        n_ps = int(float(jnp.sum(res_ps.state.scene.alive)))
        n_ck = int(float(jnp.sum(res_ck.state.scene.alive)))
        assert n_ps > 48, "per-step run must have grown the population"
        assert n_ck == n_ps, (
            "in-graph densify must fire at the same steps with the same "
            f"keys: populations diverged ({n_ck} vs {n_ps})"
        )
        # Same trajectory up to scan-vs-dispatch compilation noise (the
        # tolerance matches TestChunkedCallback's scan/per-step parity).
        np.testing.assert_allclose(res_ck.losses, res_ps.losses, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(res_ck.state.scene.means),
            np.asarray(res_ps.state.scene.means), rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(res_ck.state.scene.alive),
            np.asarray(res_ps.state.scene.alive),
        )

    def test_densified_chunk_overflow_replay_bit_identical(
        self, tiny_data, monkeypatch
    ):
        import nlos_gaussian_renderer_tpu.train as train_mod

        cfg, optim = self._cfg_optim(tiny_data)
        res_ref = fit(cfg, optim, tiny_data, num_iters=20, log_every=10)

        # Starve the initial caps: the first chunk (which densifies twice
        # in-graph) overflows, re-tunes, and replays from its pre-chunk
        # state — including the densify events, whose fold_in keys are a
        # pure function of the step counter.
        calls = TestOverflowPrevention._patch_tiny_initial_caps(
            TestOverflowPrevention(), monkeypatch, train_mod
        )
        res = fit(cfg, optim, tiny_data, num_iters=20, log_every=10)
        assert calls["initial"] == 1
        assert res.retunes >= 1
        assert not res.overflow_detected
        np.testing.assert_array_equal(
            np.asarray(res.state.scene.means),
            np.asarray(res_ref.state.scene.means),
        )
        np.testing.assert_array_equal(
            np.asarray(res.state.scene.alive),
            np.asarray(res_ref.state.scene.alive),
        )
        np.testing.assert_array_equal(res.losses, res_ref.losses)


class TestChunkedCallback:
    """VERDICT r2 #3: callbacks with an explicit cadence keep the
    scan-chunked fast path and fire exactly at their cadence boundaries."""

    def test_callback_every_fires_on_cadence(self, tiny_data):
        cfg = tiny_config(tiny_data, batch_size=1)
        optim = OptimizationParams()
        seen = []

        def cb(it, state, aux):
            seen.append(it + 1)
            # aux must be a per-step StepAux (unstacked histograms).
            assert aux.pred_hist.ndim == 2

        res = fit(cfg, optim, tiny_data, num_iters=40, log_every=10,
                  callback=cb, callback_every=20)
        assert seen == [20, 40]
        assert np.all(np.isfinite(res.losses))

    def test_chunked_callback_matches_per_step_losses(self, tiny_data):
        cfg = tiny_config(tiny_data, batch_size=1)
        optim = OptimizationParams()
        res_ps = fit(cfg, optim, tiny_data, num_iters=20, log_every=10,
                     callback=lambda *a: None)  # per-step path
        res_ck = fit(cfg, optim, tiny_data, num_iters=20, log_every=10,
                     callback=lambda *a: None, callback_every=10)  # chunked
        np.testing.assert_allclose(res_ck.losses, res_ps.losses, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(res_ck.state.scene.means),
            np.asarray(res_ps.state.scene.means), rtol=1e-5, atol=1e-7,
        )


class TestOverflowSafety:
    """Silent truncation must be impossible during training (VERDICT r1 #2):
    the culling overflow flag reaches StepAux, and `fit` re-tunes capacities
    when densification grows the population past them."""

    def test_overflow_surfaces_in_step_aux(self, tiny_data):
        import jax.numpy as jnp

        from nlos_gaussian_renderer_tpu.ops.fused_rsort import RSortSpec
        from nlos_gaussian_renderer_tpu.ops.render import RenderSettings
        from nlos_gaussian_renderer_tpu.train import (
            create_train_state,
            make_train_step,
            prepare_training,
        )

        cfg = tiny_config(tiny_data, init_gaussian_num=64, batch_size=1)
        optim = OptimizationParams()
        scene, tx, _, box = prepare_training(cfg, optim, tiny_data)
        # Deliberately tiny cap: w_max=4 cannot hold the work list.
        tiny_spec = RSortSpec(
            t_theta=8, t_phi=16, t_chunk=8, g_tile=32, w_max=4, max_groups=8,
        )
        settings = RenderSettings(
            num_sampling_points=8, start=cfg.start, end=cfg.end,
            backend="pallas_rsort", rsort_spec=tiny_spec,
        )
        step = make_train_step(settings, optim, tx, cfg.sh_degree)
        state = create_train_state(scene, tx)
        cams = jnp.asarray(tiny_data.camera_grid_positions.T[:1])
        targets = jnp.asarray(
            tiny_data.nlos_data.reshape(tiny_data.shape[0], -1)
            [cfg.start : cfg.end].T[:1] * cfg.gt_times
        )
        _, aux = step(
            state, cams, targets,
            jnp.asarray(box), tiny_data.c, tiny_data.deltaT,
            jnp.asarray(tiny_data.volume_position),
        )
        assert bool(aux.overflow), "saturated caps must surface in StepAux"

    def test_densify_retunes_capacity(self, tiny_data):
        import dataclasses as dc

        from nlos_gaussian_renderer_tpu.ops.render import render_transient

        cfg = tiny_config(
            tiny_data, renderer="pallas_rsort", init_gaussian_num=48,
            batch_size=1, print_interval=5,
        )
        optim = OptimizationParams(
            mcmc_densification_flag=True, densify_from_iter=1,
            densification_interval=1, cap_max=512,
        )
        res = fit(cfg, optim, tiny_data, num_iters=45, log_every=5)
        n_alive = int(float(jnp.sum(res.state.scene.alive)))
        assert n_alive > 150, "population must have grown past the init caps"
        assert res.retunes >= 1, "fit must re-tune caps as the population grows"
        assert not res.overflow_detected, "no unhealed overflow allowed"
        # The grown scene renders exactly (no truncated contributions):
        # rsort with the re-tuned caps must match the dense reference.
        from nlos_gaussian_renderer_tpu.ops import math as gmath
        from nlos_gaussian_renderer_tpu.train import (
            fit_culling_capacity,
            probe_scan_points,
        )
        from nlos_gaussian_renderer_tpu.ops.render import RenderSettings

        box = gmath.volume_box_points(
            jnp.asarray(tiny_data.volume_position), tiny_data.volume_size
        )
        settings = RenderSettings.from_config(cfg)
        settings, _ = fit_culling_capacity(
            settings, res.state.scene, probe_scan_points(tiny_data), box,
            tiny_data.c, tiny_data.deltaT,
        )
        cam = jnp.asarray(tiny_data.camera_grid_positions[:, 7])
        vol = jnp.asarray(tiny_data.volume_position)
        _, hr, of = render_transient(
            res.state.scene, cam, box, tiny_data.c, tiny_data.deltaT, vol, 1,
            settings,
        )
        _, hd, _ = render_transient(
            res.state.scene, cam, box, tiny_data.c, tiny_data.deltaT, vol, 1,
            settings._replace(backend="dense"),
        )
        assert not bool(of)
        np.testing.assert_allclose(
            np.asarray(hr), np.asarray(hd), rtol=5e-3, atol=1e-9
        )
