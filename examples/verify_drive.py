"""End-to-end verify drive on the real TPU (axon) per .claude/skills/verify:
synthetic data -> fit (loss drops) -> backend parity (pallas / pallas_rsort /
analytic vs dense) -> checkpoint roundtrip -> point cloud / mesh / PLY export.

Run:  python examples/verify_drive.py   (~3-8 min incl. TPU compiles)
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VERIFY_CPU"):
    # Per .claude/skills/verify: env vars alone can't flip the platform in
    # this image (sitecustomize imports jax first) — set it post-import.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)

from nlos_gaussian_renderer_tpu.configs.default import (
    Config,
    OptimizationParams,
)
from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused import TileSpec
from nlos_gaussian_renderer_tpu.ops.fused_rsort import RSortSpec
from nlos_gaussian_renderer_tpu.ops.render import (
    RenderSettings,
    render_transient,
)
from nlos_gaussian_renderer_tpu.train import fit
from nlos_gaussian_renderer_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from nlos_gaussian_renderer_tpu.utils.export import (
    extract_point_cloud,
    gaussian_to_mesh,
    write_ply,
)

t0 = time.time()
data = make_synthetic_dataset(seed=0, scan_m=6, scan_n=6, num_bins=64,
                              num_sampling_points=8)
lit = np.nonzero(data.nlos_data.sum(axis=(1, 2)))[0]
cfg = Config(
    start=int(lit[0]), end=int(lit[-1]) + 1, num_sampling_points=8,
    init_gaussian_num=96, batch_size=1, rng=0, save_fig=False,
    gt_times=100.0,
)
optim = OptimizationParams(warmup_iter=0)

# 1-3: fit on synthetic data; loss must drop.
iters = int(sys.argv[1]) if len(sys.argv) > 1 else 80
res = fit(cfg, optim, data, num_iters=iters, log_every=10)
l0 = float(res.losses[0])
l1 = float(res.losses[-1])
print(f"[fit] loss {l0:.6f} -> {l1:.6f} ({time.time()-t0:.0f}s)",
      file=sys.stderr)
assert np.isfinite(l1) and l1 < l0, (l0, l1)
assert not res.overflow_detected

# 4: fused backends vs dense parity, on the TPU.
scene = res.state.scene
box = gmath.volume_box_points(
    jnp.asarray(data.volume_position), data.volume_size
)
cam = jnp.asarray(
    data.camera_grid_positions[:, data.camera_grid_positions.shape[1] // 2]
)
common = dict(num_sampling_points=8, start=cfg.start, end=cfg.end)
vol = jnp.asarray(data.volume_position)
sd = RenderSettings(backend="dense", **common)
_, hd, _ = render_transient(scene, cam, box, data.c, data.deltaT, vol, 0, sd)
for backend, extra in [
    ("pallas", dict(tile_spec=TileSpec(t_theta=4, t_phi=8, t_r=16, k_max=96,
                                       a_sub=256, g_tile=32))),
    ("pallas_rsort", dict(rsort_spec=RSortSpec(t_theta=4, t_phi=8, t_chunk=8,
                                               g_tile=32, w_max=512,
                                               max_groups=16))),
    ("pallas_analytic", dict(rsort_spec=RSortSpec(t_theta=4, t_phi=8,
                                                  t_chunk=8, g_tile=32,
                                                  w_max=512, max_groups=16))),
    ("analytic", {}),
]:
    sp = RenderSettings(backend=backend, **common, **extra)
    _, hp, ov = render_transient(
        scene, cam, box, data.c, data.deltaT, vol, 0, sp
    )
    rel = float(
        jnp.linalg.norm(hp - hd) / (jnp.linalg.norm(hd) + 1e-12)
    )
    print(f"[parity] {backend}: rel={rel:.2e} overflow={bool(ov)}",
          file=sys.stderr)
    # analytic integrates the shells exactly (vs 1-sample-per-bin dense
    # quadrature): agreement is physical, not numerical.
    # Numerical kernel backends: bf16x3 MXU + f32 reassociation noise ~1e-4.
    # Analytic backends differ PHYSICALLY from 1-sample-per-bin quadrature
    # (exact bin integrals): ~1e-3.
    tol = 5e-2 if "analytic" in backend else 3e-4
    assert rel < tol, (backend, rel)
    assert not bool(ov)

# 4b: per_gaussian occlusion routes accelerated backends to the chunked
# scan — must match the dense (A, N) matrix path.
spg = RenderSettings(backend="dense", occlusion=True,
                     occlusion_mode="per_gaussian", **common)
_, hg_d, _ = render_transient(scene, cam, box, data.c, data.deltaT, vol, 0, spg)
_, hg_c, _ = render_transient(
    scene, cam, box, data.c, data.deltaT, vol, 0,
    spg._replace(backend="pallas_rsort"),
)
rel = float(jnp.linalg.norm(hg_c - hg_d) / (jnp.linalg.norm(hg_d) + 1e-12))
print(f"[parity] per_gaussian chunked: rel={rel:.2e}", file=sys.stderr)
assert rel < 1e-4, rel

# 5: checkpoint roundtrip.
with tempfile.TemporaryDirectory() as td:
    target = save_checkpoint(os.path.join(td, "ckpt"), res.state, step=80)
    state2 = restore_checkpoint(target, res.state)
    np.testing.assert_allclose(
        np.asarray(state2.scene.means), np.asarray(res.state.scene.means)
    )
print("[ckpt] roundtrip ok", file=sys.stderr)

# 6: export point cloud + mesh + PLY.
with tempfile.TemporaryDirectory() as td:
    pts, normals = extract_point_cloud(
        scene, data.volume_position, data.volume_size, resolution=24
    )
    verts, faces = gaussian_to_mesh(
        scene, data.volume_position, data.volume_size, resolution=24
    )
    ply = os.path.join(td, "mesh.ply")
    write_ply(ply, verts, faces)
    assert os.path.getsize(ply) > 0
print(f"[export] pc={pts.shape} verts={verts.shape} faces={faces.shape}",
      file=sys.stderr)
print("VERIFY OK", file=sys.stderr)
