"""The reference's training regime, end to end, on hardware (VERDICT r3 #2).

The reference trains 50,000 iterations per scene
(`/root/reference/configs/default.py:61`, `main.py:273-371`) with MCMC
densification to cap_max=100k, SH annealing at 1k/2k/3k, periodic
checkpoints, and reports ~2.5 h wall clock for its CUDA path
(`cursor_md/COMPARISON_NUMERICAL_VS_ANALYTIC.md:364-367`). This driver runs
the same regime on a synthetic 256x256-scan-grid scene and records
everything the "does it actually work at the reference's regime" question
needs: the loss curve, densification growth, retune/overflow counts,
checkpoint cadence, wall clock, and final reconstruction quality (Chamfer
vs the GT centers + full-grid transient MSE).

Run on the TPU:
  python tools/long_run.py                      # full 50k
  python tools/long_run.py --iters 2000 --scan 32   # pilot
Writes docs/long_run.json (+ orbax checkpoints under --ckpt-dir).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chamfer(a, b) -> float:
    import numpy as np

    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1)).mean() + np.sqrt(d2.min(0)).mean()) / 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50_000)
    ap.add_argument("--scan", type=int, default=256,
                    help="scan grid side (reference captures are 256x256)")
    ap.add_argument("--num-bins", type=int, default=384,
                    help="chosen so deltaT ~= the bench's 0.0052")
    ap.add_argument("--ns", type=int, default=32)
    ap.add_argument("--gt-gaussians", type=int, default=64)
    ap.add_argument("--init-gaussians", type=int, default=2000)
    ap.add_argument("--cap-max", type=int, default=100_000)
    ap.add_argument("--no-densify", dest="densify", action="store_false")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--ckpt-every", type=int, default=5000)
    ap.add_argument("--ckpt-dir", default="/tmp/long_run_ckpt")
    ap.add_argument("--out", default="docs/long_run.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke-testing the driver)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from nlos_gaussian_renderer_tpu.configs.default import (
        Config,
        OptimizationParams,
    )
    from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
    from nlos_gaussian_renderer_tpu.ops import math as gmath
    from nlos_gaussian_renderer_tpu.ops.render import (
        RenderSettings,
        render_histogram_batch,
    )
    from nlos_gaussian_renderer_tpu.train import fit
    from nlos_gaussian_renderer_tpu.utils.carving import carved_init_points
    from nlos_gaussian_renderer_tpu.utils.checkpoint import save_checkpoint

    log(f"devices: {jax.devices()}")

    t_gen = time.time()
    data, gt_scene = make_synthetic_dataset(
        seed=args.seed, scan_m=args.scan, scan_n=args.scan,
        num_bins=args.num_bins, num_gt_gaussians=args.gt_gaussians,
        num_sampling_points=args.ns, return_scene=True,
    )
    t_gen = time.time() - t_gen
    log(f"dataset: scan {args.scan}x{args.scan}, bins {args.num_bins}, "
        f"deltaT={data.deltaT:.5f}, window [{np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0][0]}..] "
        f"generated in {t_gen:.0f}s")

    nz = np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0]
    cfg = Config(
        start=int(nz[0]), end=int(nz[-1]) + 1,
        num_sampling_points=args.ns, sh_degree=3,
        init_gaussian_num=args.init_gaussians,
        space_carving_init=True, batch_size=1,
        renderer="pallas_rsort", save_fig=False,
        print_interval=args.log_every, rng=args.seed,
    )
    optim = OptimizationParams(
        iterations=args.iters,
        mcmc_densification_flag=args.densify,
        cap_max=args.cap_max,
    )

    rng = np.random.default_rng(cfg.rng)
    t_init = time.time()
    pts, rhos = carved_init_points(
        data, rng, cfg.init_gaussian_num,
        carving_volume_size=cfg.carving_volume_size,
        ratio=cfg.space_carving_ratio,
    )
    t_init = time.time() - t_init
    log(f"space-carving init: {len(pts)} points in {t_init:.0f}s")

    events = []  # (iter, wall_s, loss, alive)
    ckpts = []
    t0 = time.time()

    def cb(it, state, aux):
        # `fit` passes the 0-BASED loop index (callback fires at it_end-1);
        # done = it + 1 iterations. (Round-5 fix: the old `it % ckpt_every`
        # test never fired — 4999 % 5000 != 0 — so the first completed 50k
        # run saved no checkpoints.)
        done = it + 1
        alive = int(float(jnp.sum(state.scene.alive)))
        events.append(
            (done, round(time.time() - t0, 1), float(aux.loss), alive)
        )
        log(f"[cb] iter {done}: loss={float(aux.loss):.5f} alive={alive} "
            f"wall={time.time()-t0:.0f}s")
        if done % args.ckpt_every == 0 or done == args.iters:
            path = save_checkpoint(
                os.path.abspath(args.ckpt_dir), state, step=done
            )
            ckpts.append(done)
            log(f"[cb] checkpoint @ {done} -> {path}")

    res = fit(
        cfg, optim, data, num_iters=args.iters, init_points=pts,
        init_rhos=rhos, log_every=args.log_every, callback=cb,
        callback_every=1000,
    )
    wall = time.time() - t0
    log(f"trained {args.iters} iters in {wall:.0f}s "
        f"({res.iters_per_sec:.1f} it/s, {1e3 / res.iters_per_sec:.2f} ms/iter) "
        f"retunes={res.retunes} overflow={res.overflow_detected}")

    scene = res.state.scene
    alive_final = int(float(jnp.sum(scene.alive)))

    # Final quality: full-histogram MSE on 2048 sampled scan points + Chamfer
    # of the alive Gaussian centers against the GT centers.
    settings = RenderSettings.from_config(cfg)
    cams_all = np.asarray(data.camera_grid_positions.T, np.float32)
    sel = np.random.default_rng(0).choice(
        len(cams_all), min(2048, len(cams_all)), replace=False
    )
    box = gmath.volume_box_points(
        jnp.asarray(data.volume_position), data.volume_size
    )
    preds = []
    bs = 256
    eval_fn = jax.jit(
        lambda cams: render_histogram_batch(
            scene, cams, box, data.c, data.deltaT,
            jnp.asarray(data.volume_position),
            res.state.active_sh_degree, settings,
        )
    )
    for i in range(0, len(sel), bs):
        preds.append(np.asarray(eval_fn(jnp.asarray(cams_all[sel[i:i + bs]]))))
    pred = np.concatenate(preds, 0)
    target = data.nlos_data.reshape(data.nlos_data.shape[0], -1)[
        cfg.start:cfg.end
    ].T[sel] * cfg.gt_times
    mse = float(((pred - target) ** 2).mean())
    rel = mse / float((target ** 2).mean())

    alive_mask = np.asarray(scene.alive) > 0.5
    centers = np.asarray(scene.means)[alive_mask]
    gt_centers = np.asarray(gt_scene.means)[np.asarray(gt_scene.alive) > 0.5]
    sub = np.random.default_rng(0).choice(
        len(centers), min(len(centers), 4000), replace=False
    )
    ch = chamfer(centers[sub], gt_centers)
    log(f"final: alive={alive_final} transient MSE={mse:.6f} (rel {rel:.4f}) "
        f"chamfer={ch:.4f} m")

    out = {
        "regime": {
            "iters": args.iters, "scan_grid": [args.scan, args.scan],
            "num_bins": args.num_bins, "deltaT": float(data.deltaT),
            "ns": args.ns, "supervised_window": [cfg.start, cfg.end],
            "init_gaussians": args.init_gaussians,
            "cap_max": args.cap_max, "densify": args.densify,
            "sh_degree": cfg.sh_degree, "batch_size": cfg.batch_size,
            "backend": "pallas_rsort",
        },
        "platform": str(jax.devices()),
        "wall_clock_s": round(wall, 1),
        "dataset_gen_s": round(t_gen, 1),
        "carving_init_s": round(t_init, 1),
        "iters_per_sec": round(res.iters_per_sec, 2),
        "ms_per_iter": round(1e3 / res.iters_per_sec, 3),
        "retunes": res.retunes,
        "overflow_detected": bool(res.overflow_detected),
        "alive_final": alive_final,
        "checkpoints_at": ckpts,
        "loss_curve_logged": [float(x) for x in res.losses],
        "callback_events": [
            {"iter": it, "wall_s": w, "loss": lo, "alive": al}
            for it, w, lo, al in events
        ],
        "final_quality": {
            "transient_mse_2048pts": mse,
            "transient_mse_relative": rel,
            "chamfer_centers_m": ch,
        },
        "reference_row": "2.5 h / 50k iters (CUDA, "
                         "cursor_md/COMPARISON_NUMERICAL_VS_ANALYTIC.md:364)",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
