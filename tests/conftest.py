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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
