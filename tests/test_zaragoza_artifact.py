"""Loader tests pinned to the committed byte-level Zaragoza artifact.

`examples/data/zaragoza64_bunny.mat` is written the way MATLAB writes the
real Zaragoza NLOS dataset files (v5 + compression, float64, (3,1)/(1,2)
vector shapes, no 'c' key, time-first `data`) — see
examples/make_zaragoza_artifact.py. These tests pin the loader to that
schema so a loader regression against real files cannot pass silently.
"""

import os

import numpy as np
import pytest

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "data", "zaragoza64_bunny.mat",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ARTIFACT), reason="artifact not generated"
)


@pytest.fixture(scope="module")
def data():
    from nlos_gaussian_renderer_tpu.data.zaragoza import load_zaragoza256_data

    return load_zaragoza256_data(ARTIFACT)


class TestSchema:
    def test_matlab_raw_shapes(self):
        # The on-disk file must carry MATLAB-conventional shapes and dtypes.
        import scipy.io as sio

        mat = sio.loadmat(ARTIFACT)
        assert mat["data"].shape == (256, 64, 64)
        assert mat["data"].dtype == np.float64
        assert mat["cameraPosition"].shape == (3, 1)
        assert mat["cameraGridSize"].shape == (2, 1)
        assert mat["cameraGridPositions"].shape == (3, 64 * 64)
        assert mat["cameraGridPoints"].shape == (1, 2)
        assert mat["hiddenVolumePosition"].shape == (3, 1)
        assert mat["hiddenVolumeSize"].shape == (1, 1)
        assert mat["deltaT"].shape == (1, 1)
        assert "c" not in mat  # dataset files don't carry it

    def test_loader_normalizes(self, data):
        # (L, M, N) time-first, vectors flattened, c defaulted.
        assert data.shape == (256, 64, 64)
        assert data.camera_grid_positions.shape == (3, 4096)
        assert data.volume_position.shape == (3,)
        np.testing.assert_allclose(data.volume_position, [0.0, 1.0, 0.0])
        assert data.volume_size == pytest.approx(0.6)
        assert data.deltaT == pytest.approx(2.0 / 256)
        assert data.c == 1.0
        assert tuple(data.camera_grid_points) == (64, 64)

    def test_scan_grid_pairing(self, data):
        """nlos_data[:, m, n] must pair with camera_grid_positions[:, m*N+n]
        (the reference's indexing, `nlos_helpers.py:302-306`): each scan
        point's first-return bin must equal its distance to the hidden
        geometry within a couple of bins."""
        l, m, n = data.shape
        grid = data.camera_grid_positions  # (3, MN)
        vol = data.volume_position
        for mm, nn in [(0, 0), (0, n - 1), (m - 1, 0), (m // 2, n // 2)]:
            hist = data.nlos_data[:, mm, nn]
            assert hist.max() > 0
            first = int(np.argmax(hist > 0.05 * hist.max()))
            cam = grid[:, mm * n + nn]
            # nearest possible return: distance to the volume front face
            d_near = np.linalg.norm(vol - cam) - data.volume_size / 2
            d_far = np.linalg.norm(vol - cam) + data.volume_size
            assert d_near / data.deltaT - 4 <= first <= d_far / data.deltaT, (
                mm, nn, first,
            )

    def test_visualizer_convention(self, data):
        # The reference visualizer iterates data[i, :, :] as (M, N) frames
        # (`visualize.py:20-46`): frames must be spatial, axis 0 time.
        assert data.nlos_data.shape[0] > data.nlos_data.shape[1]


class TestTrainsOnArtifact:
    def test_short_fit_reduces_loss(self, data):
        from nlos_gaussian_renderer_tpu.configs.default import (
            Config,
            OptimizationParams,
        )
        from nlos_gaussian_renderer_tpu.train import fit

        import jax.numpy as jnp

        from nlos_gaussian_renderer_tpu.ops import math as gmath
        from nlos_gaussian_renderer_tpu.ops.render import (
            RenderSettings,
            render_histogram_batch,
        )

        nz = np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0]
        cfg = Config(
            start=int(nz[0]), end=int(nz[-1]) + 1, num_sampling_points=8,
            sh_degree=1, init_gaussian_num=48, space_carving_init=False,
            batch_size=2, save_fig=False, gt_times=100.0,
        )
        settings = RenderSettings.from_config(cfg)
        box = gmath.volume_box_points(
            jnp.asarray(data.volume_position), data.volume_size
        )
        # Fixed validation set (per-batch training losses are too noisy to
        # compare single samples).
        val_idx = np.linspace(0, 4095, 16).astype(int)
        val_cams = jnp.asarray(data.camera_grid_positions.T[val_idx])
        val_t = jnp.asarray(
            data.nlos_data.reshape(256, -1)[cfg.start : cfg.end].T[val_idx]
            * cfg.gt_times
        )

        def val_loss(scene, deg):
            pred = render_histogram_batch(
                scene, val_cams, box, data.c, data.deltaT,
                jnp.asarray(data.volume_position), deg, settings,
            )
            return float(jnp.mean((pred - val_t) ** 2))

        res0 = fit(cfg, OptimizationParams(), data, num_iters=1, log_every=1)
        before = val_loss(res0.state.scene, 0)
        res = fit(cfg, OptimizationParams(), data, num_iters=150, log_every=25)
        after = val_loss(res.state.scene, int(res.state.active_sh_degree))
        assert np.isfinite(res.losses).all()
        assert after < before * 0.85, (before, after)
