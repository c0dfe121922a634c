"""Smoke tests for the CLI driver, visualization, and profiling utils."""

import os

import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams


class TestCli:
    def test_train_and_eval_synthetic(self, tmp_path):
        from nlos_gaussian_renderer_tpu.cli import evaluation, train

        cfg = Config(
            datadir=str(tmp_path / "missing.mat"),  # forces synthetic
            basedir=str(tmp_path / "logs"),
            expname="smoke",
            start=100, end=140, num_sampling_points=8, sh_degree=1,
            init_gaussian_num=24, space_carving_init=False, batch_size=2,
            save_model_interval=10, save_hist_fig_interval=5,
            print_interval=5, eval_resolution=16,
        )
        optim = OptimizationParams()
        train(cfg, optim, num_iters=10)
        # args dumped, checkpoint + figure written
        exp = tmp_path / "logs" / "smoke"
        assert (exp / "args.txt").exists()
        assert any((exp / "model").iterdir())
        assert (exp / "figure" / "5.png").exists()

        evaluation(cfg, optim)
        assert (exp / "output_point_cloud.ply").exists()
        assert (exp / "output_mesh.ply").exists()

    def test_densify_flag_runs(self, tmp_path):
        from nlos_gaussian_renderer_tpu.cli import train

        cfg = Config(
            datadir=str(tmp_path / "missing.mat"),
            basedir=str(tmp_path / "logs"),
            expname="densify",
            start=100, end=132, num_sampling_points=8, sh_degree=0,
            init_gaussian_num=24, space_carving_init=False, batch_size=1,
            save_fig=False, print_interval=100,
        )
        optim = OptimizationParams(
            mcmc_densification_flag=True, densify_from_iter=2,
            densification_interval=4, cap_max=64,
        )
        train(cfg, optim, num_iters=12)


class TestVisualize:
    def test_transient_mp4(self, tmp_path):
        from nlos_gaussian_renderer_tpu.visualize import visualize_transient_img

        data = np.random.default_rng(0).random((12, 16, 16)).astype(np.float32)
        path = visualize_transient_img(
            data, output_name="t.mp4", output_dir=str(tmp_path)
        )
        assert os.path.exists(path)
        assert os.path.getsize(path) > 0

    def test_histogram_figure(self, tmp_path):
        from nlos_gaussian_renderer_tpu.visualize import save_histogram_figure

        p = str(tmp_path / "h.png")
        save_histogram_figure(
            p, np.arange(10.0), np.arange(10.0) * 0.9,
            camera_pos=np.zeros(3), equal_loss=0.1,
        )
        assert os.path.getsize(p) > 0


class TestProfiling:
    def test_step_timer(self):
        from nlos_gaussian_renderer_tpu.utils.profiling import StepTimer

        t = StepTimer(window=3)
        assert t.tick() is None
        assert t.tick() is None
        stats = t.tick()
        assert stats is not None and stats["iters_per_sec"] > 0
        assert t.total_steps == 3

    def test_memory_stats_no_crash(self):
        from nlos_gaussian_renderer_tpu.utils.profiling import (
            device_memory_stats,
        )

        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestResume:
    def test_resume_continues_from_checkpoint(self, tmp_path):
        from nlos_gaussian_renderer_tpu.cli import train

        cfg = Config(
            datadir=str(tmp_path / "missing.mat"),
            basedir=str(tmp_path / "logs"),
            expname="resume",
            start=100, end=132, num_sampling_points=8, sh_degree=1,
            init_gaussian_num=16, space_carving_init=False, batch_size=1,
            save_fig=False, print_interval=100, save_model_interval=1000,
        )
        optim = OptimizationParams()
        train(cfg, optim, num_iters=4)
        # Second run resumes from the final checkpoint of the first.
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            train(cfg, optim, num_iters=3, resume=True)
        out = buf.getvalue()
        assert "resuming from" in out
        assert "(step 5)" in out


class TestLossCompare:
    def test_mat_dump(self, tmp_path):
        import scipy.io as sio

        from nlos_gaussian_renderer_tpu.visualize import save_loss_compare

        p = str(tmp_path / "loss_compare.mat")
        save_loss_compare(p, np.arange(5.0), np.arange(5.0) * 1.1)
        back = sio.loadmat(p)
        np.testing.assert_allclose(back["nlos"].ravel(), np.arange(5.0))
        np.testing.assert_allclose(back["pred"].ravel(), np.arange(5.0) * 1.1)


class TestCullingSelfHeal:
    def test_tile_kmax_raised_on_overflow(self, tmp_path, capsys):
        from nlos_gaussian_renderer_tpu.cli import train

        cfg = Config(
            datadir=str(tmp_path / "missing.mat"),
            basedir=str(tmp_path / "logs"),
            expname="heal",
            start=100, end=132, num_sampling_points=8, sh_degree=0,
            init_gaussian_num=64, space_carving_init=False, batch_size=1,
            save_fig=False, renderer="pallas",
            cull_tile=(4, 8, 16), cull_k_max=8,  # deliberately tiny
        )
        train(cfg, OptimizationParams(), num_iters=3)
        out = capsys.readouterr().out
        assert "raising k_max" in out
        assert "culling capacity ok" in out
