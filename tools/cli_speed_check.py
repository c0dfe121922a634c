"""Validate that `fit()` with CLI-style callbacks reaches benchmark speed.

VERDICT r2 #3's acceptance: real CLI training (logging/checkpoint callbacks
installed) must run within ~10% of bench.py's ms/iter on the same scene.
This driver builds the bench scenario as an NLOSData (100k Gaussians,
256^2 scan grid, random targets — timing only), then runs `fit` exactly the
way `cli.train` does: a callback at callback_every = gcd of the print/save
cadences, which keeps the scan-chunked fast path.

Run on the TPU:  python tools/cli_speed_check.py [--iters 300]
Prints one JSON line {"fit_ms_per_iter": ..., "bench_ms_per_iter": <ref>}.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--print-interval", type=int, default=100)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses
    import math
    import time

    import jax.numpy as jnp
    import numpy as np

    from nlos_gaussian_renderer_tpu.configs.default import (
        Config,
        OptimizationParams,
    )
    from nlos_gaussian_renderer_tpu.data.synthetic import make_scan_grid
    from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData
    from nlos_gaussian_renderer_tpu.data.synthetic import make_ground_truth_scene
    from nlos_gaussian_renderer_tpu.train import fit
    from nlos_gaussian_renderer_tpu.utils.profiling import StepTimer

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    m = n = 256
    num_bins = 332
    volume_position = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    data = NLOSData(
        nlos_data=rng.random((num_bins, m, n), dtype=np.float32) * 1e-4,
        camera_position=np.zeros(3, np.float32),
        camera_grid_size=np.array([0.8, 0.8], np.float32),
        camera_grid_positions=make_scan_grid(m, n),
        camera_grid_points=np.array([m, n], np.int32),
        volume_position=volume_position,
        volume_size=0.6,
        deltaT=0.0052,
        c=1.0,
    )
    cfg = Config(
        start=100, end=300, num_sampling_points=32, sh_degree=0,
        init_gaussian_num=args.gaussians, space_carving_init=False,
        renderer="pallas_rsort", batch_size=1, save_fig=False,
        print_interval=args.print_interval,
    )
    # Match bench.py's trained-scene scale statistics via explicit init
    # points + the same log-scale override path used there.
    scene = make_ground_truth_scene(
        rng, args.gaussians, volume_position, 0.6
    )
    init_points = np.asarray(scene.means)
    init_rhos = rng.uniform(0.3, 0.9, (args.gaussians, 1)).astype(np.float32)

    optim = OptimizationParams()
    cb_every = math.gcd(cfg.print_interval, cfg.save_model_interval)
    timer = StepTimer(window=cfg.print_interval)
    last = [0]
    mss = []

    def callback(it, state, aux):
        step = it + 1
        stats = timer.tick(step - last[0])
        last[0] = step
        if stats is not None:
            mss.append(stats["ms_per_iter"])
            log(f"{step} iter  loss {float(aux.loss):.6f}  "
                f"{stats['ms_per_iter']:.2f} ms/iter")

    t0 = time.time()
    res = fit(cfg, optim, data, num_iters=args.iters,
              init_points=init_points, init_rhos=init_rhos,
              callback=callback, callback_every=cb_every)
    wall = time.time() - t0
    # Steady-state ms/iter: drop the first window (contains compile+warmup).
    steady = float(np.mean(mss[1:])) if len(mss) > 1 else float(
        np.mean(mss) if mss else wall / args.iters * 1e3
    )
    log(f"wall {wall:.1f}s; windows: {[f'{x:.2f}' for x in mss]}")
    print(json.dumps({
        "fit_ms_per_iter_steady": round(steady, 3),
        "iters": args.iters,
        "overall_it_per_sec": round(res.iters_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
