"""End-to-end reconstruction demo on a synthetic confocal scene.

Generates a hidden scene, forward-renders its transients (Zaragoza schema),
trains a fresh Gaussian scene against them with space-carving init, and
exports the reconstruction (point cloud + mesh + histogram figures), then
reports reconstruction quality (Chamfer distance against the ground-truth
Gaussian centers and transient MSE on held-out scan points).

Run:  python examples/reconstruct_synthetic.py [--iters 2000] [--renderer pallas]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chamfer(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric Chamfer distance between point sets (N,3), (M,3)."""
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1)).mean() + np.sqrt(d2.min(0)).mean()) / 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--renderer", default="dense",
                    choices=["dense", "pallas", "pallas_rsort", "analytic"])
    ap.add_argument("--gaussians", type=int, default=400)
    ap.add_argument("--out", default="./recon_out")
    ap.add_argument("--scan", type=int, default=12)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

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
    from nlos_gaussian_renderer_tpu.utils.export import (
        extract_point_cloud,
        gaussian_to_mesh,
        write_ply,
    )
    from nlos_gaussian_renderer_tpu.visualize import save_histogram_figure

    data, gt_scene = make_synthetic_dataset(
        seed=7, scan_m=args.scan, scan_n=args.scan, num_bins=160,
        num_gt_gaussians=24, num_sampling_points=16, return_scene=True,
    )
    nz = np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0]
    cfg = Config(
        start=int(nz[0]), end=int(nz[-1]) + 1, num_sampling_points=16,
        sh_degree=1, init_gaussian_num=args.gaussians,
        space_carving_init=True, carving_volume_size=32, batch_size=4,
        renderer=args.renderer, save_fig=False, print_interval=200,
    )
    optim = OptimizationParams()

    rng = np.random.default_rng(0)
    pts, rhos = carved_init_points(
        data, rng, cfg.init_gaussian_num,
        carving_volume_size=cfg.carving_volume_size,
        ratio=cfg.space_carving_ratio,
    )

    t0 = time.time()
    res = fit(cfg, optim, data, num_iters=args.iters, init_points=pts,
              init_rhos=rhos, log_every=max(args.iters // 20, 1))
    print(f"trained {args.iters} iters in {time.time()-t0:.0f}s "
          f"({res.iters_per_sec:.1f} it/s)")
    print("loss curve:", np.array2string(res.losses, precision=5))

    scene = res.state.scene
    os.makedirs(args.out, exist_ok=True)

    # Quality: transient MSE on every scan point (vs the measured data).
    settings = RenderSettings.from_config(cfg)
    cams = jnp.asarray(data.camera_grid_positions.T)
    box = gmath.volume_box_points(
        jnp.asarray(data.volume_position), data.volume_size
    )
    pred = np.asarray(
        jax.jit(
            lambda: render_histogram_batch(
                scene, cams, box, data.c, data.deltaT,
                jnp.asarray(data.volume_position),
                res.state.active_sh_degree, settings,
            )
        )()
    )
    target = data.nlos_data.reshape(data.nlos_data.shape[0], -1)[
        cfg.start : cfg.end
    ].T * cfg.gt_times
    mse = float(((pred - target) ** 2).mean())
    rel = mse / float((target**2).mean())
    print(f"full-grid transient MSE: {mse:.6f} (relative {rel:.4f})")

    # Quality: geometry. Threshold the density field, compare to GT centers.
    cloud, normals = extract_point_cloud(
        scene, data.volume_position, data.volume_size, resolution=48
    )
    gt_alive = np.asarray(gt_scene.means)[np.asarray(gt_scene.alive) > 0.5]
    ch = chamfer(cloud[rng.choice(len(cloud), min(len(cloud), 2000))], gt_alive)
    print(f"chamfer(recon cloud, GT centers): {ch:.4f} m "
          f"(volume size {data.volume_size} m)")

    write_ply(os.path.join(args.out, "recon_cloud.ply"), cloud, normals=normals)
    # Mesh quality side-by-side: raw iso-surface vs the reference-parity
    # post-processing (crossing placement + 1%-quantile trim + Taubin
    # smoothing, mirroring the Poisson pipeline `nlos_helpers.py:58-69`).
    v_raw, f_raw = gaussian_to_mesh(
        scene, data.volume_position, data.volume_size, resolution=48,
        trim_quantile=None, smooth_iters=0,
    )
    verts, faces = gaussian_to_mesh(
        scene, data.volume_position, data.volume_size, resolution=48
    )
    sub = rng.choice(len(v_raw), min(len(v_raw), 3000), replace=False)
    ch_raw = chamfer(v_raw[sub], gt_alive)
    sub = rng.choice(len(verts), min(len(verts), 3000), replace=False)
    ch_mesh = chamfer(verts[sub], gt_alive)
    print(f"chamfer(mesh verts, GT centers): raw {ch_raw:.4f} m -> "
          f"post-processed {ch_mesh:.4f} m")
    write_ply(os.path.join(args.out, "recon_mesh_raw.ply"), v_raw, faces=f_raw)
    write_ply(os.path.join(args.out, "recon_mesh.ply"), verts, faces=faces)
    mid = args.scan * args.scan // 2
    save_histogram_figure(
        os.path.join(args.out, "histogram_center.png"),
        target[mid], pred[mid],
    )
    print(f"exports -> {args.out}/")
    ok = rel < 0.25 and ch < 0.15 * data.volume_size
    print("RESULT:", "PASS" if ok else "WEAK", f"(rel_mse={rel:.4f}, chamfer={ch:.4f})")


if __name__ == "__main__":
    main()
