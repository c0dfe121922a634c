"""Test configuration: run everything on CPU with 8 virtual devices.

Must set the env vars before jax initializes its backends, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# Overwrite (not setdefault): this image presets JAX_PLATFORMS=axon and a
# sitecustomize that imports jax at interpreter start, so the env var alone is
# not enough — the config update below actually flips the platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Fast/slow split (VERDICT r2 #9): the interpret-mode kernel and long
# training tests dominate the ~35 min full-suite wall time. Everything
# matching a pattern below gets the `slow` marker so the developer loop
# `pytest -m "not slow"` stays under ~5 minutes; CI-style runs use the full
# suite unchanged. Patterns match nodeids (module path, class, or test name);
# measured durations: /tmp via `pytest --durations` (r3: top entry 242s).
_SLOW_PATTERNS = (
    "tests/test_sharding.py",
    "tests/test_dsort.py",
    "tests/test_graft_entry.py",
    "TestOverflowSafety",
    "TestOverflowPrevention",
    "TestChunkedCallback",
    "TestScannedStep",
    "TestBackendTrainingParity",
    "TestStanfordLoader",
    "TestFit",
    "TestTuneSpec",
    "TestDegenerateFootprints",
    "TestTakeRowsScatter",
    "test_gradient_parity_bf16_bwd",
    "TestAnalyticKernelParity",
    "TestTrainsOnArtifact",
    "TestCullingSelfHeal",
    "TestResume",
    "test_train_and_eval_synthetic",
    "test_densify_flag_runs",
    "test_gradient_parity_chunked",
    "test_gradient_parity_with_dense",
    "test_gradients_finite",
    "TestNonDivisibleShapes",
    "test_gradients_finite_all_modes",
    "test_per_gaussian_chunked",
    "TestBatchedRender",
    "test_capacity_padding",
    "test_b1_matches_vmap_row",
    "test_vmap_parity",
    "test_fused_analytic.py::TestGateLadderLaneAligned",
    "test_matches_pallas_tile_backend",
    "TestPallasRenderParity::test_gradient_parity",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(p in item.nodeid for p in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
