"""Export the trained reconstruction as committed artifacts (VERDICT r4 #3).

Loads the long-run checkpoint (`tools/long_run.py` --ckpt-dir), regenerates
the SAME synthetic ground-truth scene deterministically, and commits what a
reader can actually look at:

  docs/reconstruction_mesh.ply   — surface-nets mesh of the learned density
                                   field (reference `gaussian2volume`
                                   mode='mesh', `nlos_helpers.py:50-69`)
  docs/reconstruction.png        — 3-panel figure: learned density mid-slices
                                   + learned-vs-GT center scatter (3 views)
  docs/reconstruction_quality.json — Chamfer (both directions), density-field
                                   IoU at the mean threshold, checkpoint meta

Run on the TPU after the long run:
  python tools/export_reconstruction.py --ckpt /tmp/long_run_ckpt/step_50000
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint dir (save_checkpoint target)")
    ap.add_argument("--seed", type=int, default=3,
                    help="long_run.py --seed (GT scene regeneration)")
    ap.add_argument("--scan", type=int, default=256)
    ap.add_argument("--num-bins", type=int, default=384)
    ap.add_argument("--ns", type=int, default=32)
    ap.add_argument("--gt-gaussians", type=int, default=64)
    ap.add_argument("--cap-max", type=int, default=100_000)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--outdir", default="docs")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from nlos_gaussian_renderer_tpu.configs.default import OptimizationParams
    from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
    from nlos_gaussian_renderer_tpu.models.scene import init_scene
    from nlos_gaussian_renderer_tpu.train import (
        create_train_state,
        make_optimizer,
    )
    from nlos_gaussian_renderer_tpu.utils.checkpoint import restore_checkpoint
    from nlos_gaussian_renderer_tpu.utils.export import (
        density_grid,
        extract_point_cloud,
        gaussian_to_mesh,
        write_ply,
    )

    log(f"devices: {jax.devices()}")

    # GT scene: deterministic regeneration of the long run's dataset.
    data, gt_scene = make_synthetic_dataset(
        seed=args.seed, scan_m=args.scan, scan_n=args.scan,
        num_bins=args.num_bins, num_gt_gaussians=args.gt_gaussians,
        num_sampling_points=args.ns, return_scene=True,
    )
    vol_pos = np.asarray(data.volume_position, np.float32)
    vol_size = float(data.volume_size)

    # Restore: template with the long run's capacity.
    rng = np.random.default_rng(0)
    pts0 = vol_pos[None, :] + rng.uniform(-0.1, 0.1, (16, 3))
    template_scene = init_scene(
        pts0.astype(np.float32), np.full((16,), 0.5, np.float32),
        vol_pos - vol_size / 2, vol_pos + vol_size / 2,
        max_sh_degree=args.sh_degree, capacity=args.cap_max,
    )
    tx = make_optimizer(OptimizationParams())
    template = create_train_state(template_scene, tx)
    state = restore_checkpoint(os.path.abspath(args.ckpt), template)
    scene = state.scene
    alive = np.asarray(scene.alive) > 0.5
    log(f"restored step={int(state.step)} alive={int(alive.sum())}")

    os.makedirs(args.outdir, exist_ok=True)

    # Mesh + point cloud of the learned density field.
    verts, faces = gaussian_to_mesh(
        scene, vol_pos, vol_size, resolution=args.resolution
    )
    write_ply(
        os.path.join(args.outdir, "reconstruction_mesh.ply"), verts, faces
    )
    log(f"mesh: {len(verts)} verts / {len(faces)} faces")
    pc, _ = extract_point_cloud(
        scene, vol_pos, vol_size, resolution=args.resolution,
        with_normals=False,
    )

    # Density-field IoU: learned vs GT, each thresholded at ITS OWN mean
    # (scale-free; the learned field's absolute scale depends on opacity x
    # albedo, not geometry).
    g_l, axis = density_grid(scene, vol_pos, vol_size, args.resolution)
    g_t, _ = density_grid(gt_scene, vol_pos, vol_size, args.resolution)
    m_l = g_l > g_l.mean()
    m_t = g_t > g_t.mean()
    iou = float((m_l & m_t).sum() / max((m_l | m_t).sum(), 1))

    # Chamfer between learned alive centers and GT centers.
    def chamfer_dirs(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return float(np.sqrt(d2.min(1)).mean()), float(np.sqrt(d2.min(0)).mean())

    centers = np.asarray(scene.means)[alive]
    sub = np.random.default_rng(0).choice(
        len(centers), min(len(centers), 4000), replace=False
    )
    gt_centers = np.asarray(gt_scene.means)[np.asarray(gt_scene.alive) > 0.5]
    c_ab, c_ba = chamfer_dirs(centers[sub], gt_centers)
    log(f"IoU={iou:.3f} chamfer learned->gt={c_ab:.4f} gt->learned={c_ba:.4f}")

    quality = {
        "checkpoint": args.ckpt,
        "step": int(state.step),
        "alive": int(alive.sum()),
        "grid_resolution": args.resolution,
        "density_iou_mean_threshold": iou,
        "chamfer_learned_to_gt_m": c_ab,
        "chamfer_gt_to_learned_m": c_ba,
        "chamfer_symmetric_m": (c_ab + c_ba) / 2,
        "mesh": {"verts": int(len(verts)), "faces": int(len(faces))},
    }
    with open(os.path.join(args.outdir, "reconstruction_quality.json"), "w") as f:
        json.dump(quality, f, indent=1)

    # Figure: density mid-slices (learned vs GT) + center scatter.
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(12, 7.5))
    mid = args.resolution // 2
    slices = [
        (g_l[mid, :, :], g_t[mid, :, :], "x mid-slice (y-z)"),
        (g_l[:, mid, :], g_t[:, mid, :], "y mid-slice (x-z)"),
        (g_l[:, :, mid], g_t[:, :, mid], "z mid-slice (x-y)"),
    ]
    for j, (sl_l, sl_t, title) in enumerate(slices):
        axes[0, j].imshow(sl_l.T, origin="lower", cmap="magma")
        axes[0, j].set_title(f"learned — {title}", fontsize=9)
        axes[1, j].imshow(sl_t.T, origin="lower", cmap="magma")
        axes[1, j].set_title(f"ground truth — {title}", fontsize=9)
        for ax in (axes[0, j], axes[1, j]):
            ax.set_xticks([])
            ax.set_yticks([])
    fig.suptitle(
        f"Reconstruction @ step {int(state.step)}: "
        f"{int(alive.sum())} Gaussians, density IoU {iou:.2f}, "
        f"Chamfer {quality['chamfer_symmetric_m']*1e3:.1f} mm",
        fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "reconstruction.png"), dpi=110)
    log(f"wrote {args.outdir}/reconstruction_mesh.ply, reconstruction.png, "
        "reconstruction_quality.json")


if __name__ == "__main__":
    main()
