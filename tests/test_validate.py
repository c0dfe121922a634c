"""Dataset physical-validation tests (VERDICT r2 #6).

A clean synthetic capture must pass; each deliberate corruption (the failure
modes a real Zaragoza-style .mat could smuggle in — permuted axes, wrong
time units, round-trip bins, normalization) must be caught.
"""

import dataclasses

import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
from nlos_gaussian_renderer_tpu.data.validate import (
    diagnose,
    first_bounce_bins,
    validate,
)


@pytest.fixture(scope="module")
def clean_data():
    # Big enough for the spatial-coherence checks to have statistics.
    return make_synthetic_dataset(
        seed=3, scan_m=8, scan_n=8, num_bins=128, num_gt_gaussians=16,
        num_sampling_points=8,
    )


class TestCleanPasses:
    def test_clean_synthetic_ok(self, clean_data):
        report = diagnose(clean_data)
        assert report.ok, str(report)

    def test_validate_returns_report(self, clean_data):
        report = validate(clean_data)
        assert report.ok

    def test_first_bounce_tracks_geometry(self, clean_data):
        fb = first_bounce_bins(clean_data.nlos_data)
        cgp = clean_data.camera_grid_positions
        vol = clean_data.volume_position
        cdt = clean_data.c * clean_data.deltaT
        near = np.linalg.norm(cgp.T - vol[None, :], axis=1) - (
            clean_data.volume_size * np.sqrt(3) / 2
        )
        lit = np.isfinite(fb.reshape(-1))
        assert lit.mean() > 0.5
        assert np.all(
            fb.reshape(-1)[lit] * cdt >= near[lit] - 3 * cdt
        ), "photons arrived before light could reach the volume"


class TestCorruptionsCaught:
    def test_time_axis_not_first(self, clean_data):
        bad = dataclasses.replace(
            clean_data, nlos_data=np.transpose(clean_data.nlos_data, (1, 0, 2))
        )
        report = diagnose(bad)
        assert not report.ok, str(report)

    def test_scan_axes_swapped_against_grid_points(self, clean_data):
        # (M, N) = (8, 8) is square, so swapping scan axes is invisible to
        # shape checks — corrupt grid_points to the asymmetric case instead.
        bad = dataclasses.replace(
            clean_data, camera_grid_points=np.array([4, 16], np.int32)
        )
        report = diagnose(bad)
        assert not report.ok
        assert any("cameraGridPoints" in e for e in report.errors)

    def test_roundtrip_time_bins(self, clean_data):
        """Bins recorded as round-trip (2x) time must be flagged with the
        2x hint."""
        l, m, n = clean_data.nlos_data.shape
        stretched = np.zeros((2 * l, m, n), np.float32)
        stretched[::2] = clean_data.nlos_data  # same signal at 2x the bin
        bad = dataclasses.replace(
            clean_data,
            nlos_data=stretched[: int(1.8 * l)],
        )
        report = diagnose(bad)
        assert not report.ok
        assert any("ROUND-TRIP" in e for e in report.errors), str(report)

    def test_wrong_deltat_units(self, clean_data):
        # deltaT in seconds (~4 ps) instead of bin-distance units with c=1:
        # the time window then covers picometers of radius.
        bad = dataclasses.replace(clean_data, deltaT=4e-12)
        report = diagnose(bad)
        assert not report.ok, str(report)

    def test_zero_transient(self, clean_data):
        bad = dataclasses.replace(
            clean_data, nlos_data=np.zeros_like(clean_data.nlos_data)
        )
        report = diagnose(bad)
        assert not report.ok

    def test_nan_transient(self, clean_data):
        td = clean_data.nlos_data.copy()
        td[3, 1, 1] = np.nan
        report = diagnose(dataclasses.replace(clean_data, nlos_data=td))
        assert not report.ok

    def test_validate_raises(self, clean_data):
        bad = dataclasses.replace(
            clean_data, nlos_data=np.zeros_like(clean_data.nlos_data)
        )
        with pytest.raises(ValueError, match="failed validation"):
            validate(bad)


class TestWarnings:
    def test_per_pixel_normalization_warns(self, clean_data):
        td = clean_data.nlos_data.copy()
        px_max = td.max(axis=0, keepdims=True)
        td = np.where(px_max > 0, td / np.maximum(px_max, 1e-30), td)
        report = diagnose(dataclasses.replace(clean_data, nlos_data=td))
        assert any("normalization" in w for w in report.warnings), str(report)

    def test_shuffled_grid_positions_flagged(self, clean_data):
        rng = np.random.default_rng(0)
        cgp = clean_data.camera_grid_positions.copy()
        perm = rng.permutation(cgp.shape[1])
        report = diagnose(
            dataclasses.replace(clean_data, camera_grid_positions=cgp[:, perm])
        )
        assert not report.ok or any(
            "row-major" in w for w in report.warnings
        ), str(report)


class TestCLIValidateMode:
    def test_cli_validate_mode(self, tmp_path, clean_data, capsys):
        from nlos_gaussian_renderer_tpu.cli import main
        from nlos_gaussian_renderer_tpu.data.zaragoza import save_zaragoza_mat

        path = tmp_path / "ok.mat"
        save_zaragoza_mat(str(path), clean_data)
        main(["--mode", "validate", "--datadir", str(path)])
        out = capsys.readouterr().out
        assert "dataset OK" in out
        assert "schema of" in out

    def test_cli_validate_mode_fails_on_corrupt(self, tmp_path, clean_data):
        from nlos_gaussian_renderer_tpu.cli import main
        from nlos_gaussian_renderer_tpu.data.zaragoza import save_zaragoza_mat

        bad = dataclasses.replace(
            clean_data, nlos_data=np.transpose(clean_data.nlos_data, (1, 0, 2))
        )
        path = tmp_path / "bad.mat"
        save_zaragoza_mat(str(path), bad)
        with pytest.raises(SystemExit):
            main(["--mode", "validate", "--datadir", str(path)])
