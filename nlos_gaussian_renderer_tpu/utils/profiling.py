"""Profiling and step-timing utilities.

Replaces the reference's ad-hoc wall-clock prints + CUDA VRAM telemetry
(`main.py:220-234`) with first-class hooks: a jax.profiler trace context, a
rolling step timer with iters/sec, and device-memory stats where the backend
exposes them.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter for the training loop."""

    def __init__(self, window: int = 100):
        self.window = window
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._count = 0
        self.total_steps = 0
        self.total_time = 0.0

    def tick(self, n: int = 1) -> Optional[Dict[str, float]]:
        """Count n steps; returns stats every `window` steps, else None."""
        self._count += n
        self.total_steps += n
        if self._count >= self.window:
            dt = time.perf_counter() - self._t0
            self.total_time += dt
            stats = {
                "iters_per_sec": self._count / max(dt, 1e-9),
                "ms_per_iter": dt / self._count * 1e3,
                "window_sec": dt,
            }
            self._t0 = time.perf_counter()
            self._count = 0
            return stats
        return None


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats in GiB (empty if backend lacks support)."""
    out: Dict[str, float] = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if not s:
            continue
        gib = 1024**3
        out[f"{d.platform}:{d.id}:bytes_in_use_gib"] = s.get("bytes_in_use", 0) / gib
        if "peak_bytes_in_use" in s:
            out[f"{d.platform}:{d.id}:peak_gib"] = s["peak_bytes_in_use"] / gib
    return out
