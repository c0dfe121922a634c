"""Parity tests: native C++ host runtime vs NumPy fallbacks vs references."""

import numpy as np
import pytest

from nlos_gaussian_renderer_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    ok = native.available()
    assert ok, "native library failed to build — check g++"
    return ok


class TestKnn:
    def test_grid_spacing(self, lib_available):
        h = 0.25
        g = np.stack(
            np.meshgrid(*[np.arange(5) * h] * 3, indexing="ij"), -1
        ).reshape(-1, 3).astype(np.float32)
        d2 = native.knn_mean_dist2(g, k=3)
        # Interior points have 3 neighbors at distance h.
        np.testing.assert_allclose(d2, h * h, rtol=1e-4)

    def test_matches_bruteforce(self, lib_available):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        fast = native.knn_mean_dist2(pts, k=3)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        brute = np.sort(d2, axis=1)[:, :3].mean(axis=1)
        np.testing.assert_allclose(fast, brute, rtol=1e-4)

    def test_large_input_fast(self, lib_available):
        import time

        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, (100_000, 3)).astype(np.float32)
        t0 = time.time()
        d2 = native.knn_mean_dist2(pts, k=3)
        dt = time.time() - t0
        assert np.isfinite(d2).all() and (d2 > 0).all()
        assert dt < 30, f"native knn too slow: {dt:.1f}s"

    def test_degenerate(self, lib_available):
        one = np.zeros((1, 3), np.float32)
        assert native.knn_mean_dist2(one).shape == (1,)


class TestCarvingNative:
    def test_votes_match_numpy(self, lib_available):
        rng = np.random.default_rng(2)
        coords = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        cams = rng.uniform(-2, 2, (50, 3)).astype(np.float32)
        radii = rng.uniform(-0.5, 2.5, 50).astype(np.float32)  # some <= 0
        fast = native.space_carving_votes(coords, cams, radii)
        slow = np.zeros(300, dtype=np.int32)
        for j in range(50):
            if radii[j] > 0:
                d = np.linalg.norm(coords - cams[j], axis=1)
                slow += (d >= radii[j]).astype(np.int32)
        np.testing.assert_array_equal(fast, slow)

    def test_first_bounces_match(self, lib_available):
        rng = np.random.default_rng(3)
        t = (rng.random((40, 8, 8)) * 0.5).astype(np.float32)
        t[:5] = 0
        t[:, 0, 0] = 0  # an all-zero pixel
        fast = native.detect_first_bounces(t, threshold=0.2)
        diff = np.diff(t, axis=0) > 0.2
        any_rise = diff.any(axis=0)
        first = diff.argmax(axis=0) + 1
        nonzero = t.sum(axis=0) != 0
        slow = np.where(any_rise & nonzero, first, 0).astype(np.float32)
        np.testing.assert_array_equal(fast, slow)


class TestIntegration:
    def test_scene_init_uses_native_for_big_n(self, lib_available):
        # init_scene should produce finite scales for 20k points quickly.
        import time

        from nlos_gaussian_renderer_tpu.models.scene import init_scene

        rng = np.random.default_rng(4)
        pts = rng.uniform(-1, 1, (20_000, 3)).astype(np.float32)
        rho = rng.uniform(0, 1, (20_000, 1)).astype(np.float32)
        t0 = time.time()
        scene = init_scene(pts, rho, [-1] * 3, [1] * 3, max_sh_degree=0)
        assert np.isfinite(np.asarray(scene.log_scales)).all()
        assert time.time() - t0 < 60
