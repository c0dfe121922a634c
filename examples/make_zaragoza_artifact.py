"""Generate `examples/data/zaragoza64_bunny.mat` — a byte-level stand-in for
the real `zaragoza256_preprocessed.mat` (which is gitignored in the reference
repo and not redistributable here).

Schema fidelity is the point: the file is written the way MATLAB writes the
real Zaragoza NLOS dataset files (and the way the reference's absent
`data/data_loader.py` must read them, per the call signature `main.py:93` and
`visualize.py:20-21`):

  - MATLAB v5 format, zlib-compressed, `float64` everywhere (MATLAB default);
  - `data`: (L, M, N) transient, TIME-FIRST (the reference's visualizer
    iterates `data[i, :, :]` as video frames over `data.shape[0]`);
  - column/row 2-D vector shapes as MATLAB stores them: `cameraPosition`
    (3, 1), `cameraGridSize` (2, 1), `cameraGridPoints` (1, 2),
    `hiddenVolumePosition` (3, 1), `hiddenVolumeSize` / `deltaT` (1, 1);
  - `cameraGridPositions`: (3, M*N) with column index m*N + n (the reference
    pairs `camera_grid_positions[:, m*N+n]` with `nlos_data[:, m, n]`,
    `nlos_helpers.py:302-306`);
  - `deltaT` in meters of light travel (dataset distance units, c = 1); no
    'c' key — the loader defaults it, like the dataset files.

The hidden scene is a procedural bunny-ish Gaussian cluster (body + head +
two ears) so the exported reconstruction is visually checkable.

Run:  python examples/make_zaragoza_artifact.py  [--scan 64] [--bins 256]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bunny_points(rng: np.random.Generator, n: int, center: np.ndarray,
                 size: float) -> np.ndarray:
    """Procedural bunny-ish blob cluster: body, head, two ears (z = up)."""
    s = size

    def ball(c, radii, k):
        pts = rng.normal(size=(k, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pts *= rng.uniform(0.2, 1.0, (k, 1)) ** (1 / 3)
        return c + pts * radii

    parts = [
        ball(center + s * np.array([0.0, 0.02, -0.08]),
             s * np.array([0.22, 0.18, 0.20]), int(0.55 * n)),          # body
        ball(center + s * np.array([0.0, -0.10, 0.22]),
             s * np.array([0.13, 0.11, 0.12]), int(0.25 * n)),          # head
        ball(center + s * np.array([-0.09, -0.08, 0.42]),
             s * np.array([0.035, 0.03, 0.14]), int(0.10 * n)),         # ear L
        ball(center + s * np.array([0.09, -0.08, 0.42]),
             s * np.array([0.035, 0.03, 0.14]), n - int(0.55 * n)
             - int(0.25 * n) - int(0.10 * n)),                          # ear R
    ]
    return np.concatenate(parts, axis=0)


def build_dataset(scan: int, bins: int, ns: int, seed: int = 0):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nlos_gaussian_renderer_tpu.data.synthetic import make_scan_grid
    from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData
    from nlos_gaussian_renderer_tpu.models.scene import init_scene
    from nlos_gaussian_renderer_tpu.ops import math as gmath
    from nlos_gaussian_renderer_tpu.ops.render import (
        RenderSettings,
        render_histogram_batch,
    )

    rng = np.random.default_rng(seed)
    volume_position = np.array([0.0, 1.0, 0.0])
    volume_size = 0.6
    c = 1.0
    delta_t = 2.0 / bins  # radial reach 2 m over `bins` bins (real-file-like)
    start = int(0.55 / delta_t)
    end = min(int(1.75 / delta_t), bins)

    pts = bunny_points(rng, 600, volume_position, volume_size)
    rho = rng.uniform(0.55, 0.95, (pts.shape[0], 1))
    scene = init_scene(
        pts.astype(np.float32), rho.astype(np.float32),
        pmin=volume_position - volume_size / 2,
        pmax=volume_position + volume_size / 2,
        max_sh_degree=0, knn_scale_init=False,
    )
    scene = dataclasses.replace(
        scene,
        log_scales=jnp.full_like(scene.log_scales, np.log(0.013)),
        logit_opacities=jnp.full_like(
            scene.logit_opacities, gmath.inverse_sigmoid(0.85)
        ),
    )
    box = gmath.volume_box_points(jnp.asarray(volume_position), volume_size)
    settings = RenderSettings(num_sampling_points=ns, start=start, end=end)
    cam_grid = make_scan_grid(scan, scan)

    hists = []
    cams = jnp.asarray(cam_grid.T)
    step = 32
    for i in range(0, cams.shape[0], step):
        hists.append(np.asarray(render_histogram_batch(
            scene, cams[i : i + step], box, c, delta_t,
            jnp.asarray(volume_position), 0, settings,
        )))
        print(f"rendered {min(i + step, cams.shape[0])}/{cams.shape[0]}")
    hists = np.concatenate(hists, axis=0)  # (MN, end-start)

    nlos = np.zeros((bins, scan, scan))
    nlos[start:end] = hists.T.reshape(end - start, scan, scan)
    return NLOSData(
        nlos_data=nlos,
        camera_position=np.array([0.0, -0.5, 0.0]),
        camera_grid_size=np.array([0.8, 0.8]),
        camera_grid_positions=cam_grid.astype(np.float64),
        camera_grid_points=np.array([scan, scan]),
        volume_position=volume_position,
        volume_size=volume_size,
        deltaT=delta_t,
        c=c,
    ), scene


def write_matlab_style(path: str, data) -> None:
    """Write with MATLAB-native shapes/dtypes (see module docstring)."""
    import scipy.io as sio

    sio.savemat(
        path,
        {
            "data": data.nlos_data.astype(np.float64),
            "cameraPosition": data.camera_position.reshape(3, 1).astype(np.float64),
            "cameraGridSize": data.camera_grid_size.reshape(2, 1).astype(np.float64),
            "cameraGridPositions": data.camera_grid_positions.astype(np.float64),
            "cameraGridPoints": data.camera_grid_points.reshape(1, 2).astype(np.float64),
            "hiddenVolumePosition": data.volume_position.reshape(3, 1).astype(np.float64),
            "hiddenVolumeSize": np.array([[data.volume_size]], dtype=np.float64),
            "deltaT": np.array([[data.deltaT]], dtype=np.float64),
            # no 'c': the dataset files don't carry it; loaders default to 1.
        },
        do_compression=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--bins", type=int, default=256)
    ap.add_argument("--ns", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "data", "zaragoza64_bunny.mat"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    data, _ = build_dataset(args.scan, args.bins, args.ns)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    write_matlab_style(args.out, data)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({mb:.2f} MB), data shape {data.nlos_data.shape}, "
          f"deltaT={data.deltaT}")


if __name__ == "__main__":
    main()
