"""Isolate the non-kernel step components on the real TPU.

Times, each as its own jitted chained loop at the bench scene scale (100k
Gaussians, 32x32x200 samples):
  1. rsort_cull alone (footprints + sort + layout + work lists),
  2. the sample-side tiling (shell_grid + centered monomials + hi/lo split),
  3. the optimizer tail (loss grads -> Adam update) on a fake gradient.

Run: python tools/cullbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from nlos_gaussian_renderer_tpu.data.synthetic import make_ground_truth_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused import TileSpec, tile_points_centered
from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
    RSortSpec,
    rsort_cull,
    tune_rsort_spec,
)
from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

print("devices:", jax.devices(), file=sys.stderr)

rng = np.random.default_rng(0)
vol = np.array([0.0, 1.0, 0.0], np.float32)
c, delta_t = 1.0, 0.0052
scene = make_ground_truth_scene(rng, 100_000, vol, 0.6)
import dataclasses

scene = dataclasses.replace(
    scene,
    log_scales=jnp.asarray(
        rng.uniform(np.log(0.002), np.log(0.012), (100_000, 3)), jnp.float32
    ),
)
box = gmath.volume_box_points(jnp.asarray(vol), 0.6)
base = RSortSpec(t_chunk=32, bwd_p_bf16=True)
spec = tune_rsort_spec(
    scene, np.array([[-0.4, 0, -0.4], [0, 0, 0], [0.4, 0, 0.4]], np.float32),
    box, 32, 100, 300, c, delta_t, base=base,
)
print(f"spec: w_max={spec.w_max} groups={spec.max_groups}", file=sys.stderr)

cams = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32) * [1, 0, 1])


def timeit(fn, n=30):
    fn(0)
    jax.block_until_ready(fn(1))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(i % 64)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


@jax.jit
def cull_only(i):
    cam = cams[i]
    grid = shell_grid(cam, box, 32, 100, 300, c, delta_t)
    t = rsort_cull(
        scene.means, scene.scales, scene.alive, cam,
        grid.theta, grid.phi, grid.r, spec,
    )
    # Return small summaries so nothing is dead-code-eliminated.
    return (jnp.sum(t.full_perm), jnp.sum(t.fwd_t), t.overflowed,
            jnp.sum(t.words), t.n_items)


@jax.jit
def tiling_only(i):
    cam = cams[i]
    grid = shell_grid(cam, box, 32, 100, 300, c, delta_t)
    tp = TileSpec(t_theta=8, t_phi=16, t_r=32)
    xfeat, centers = tile_points_centered(
        grid.points, 32, 200, tp, 4, 2, 7
    )
    x_hi = xfeat.astype(jnp.bfloat16)
    x_lo = (xfeat - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.sum(x_hi.astype(jnp.float32)), jnp.sum(x_lo.astype(jnp.float32)), jnp.sum(centers)


@jax.jit
def footprints_only(i):
    from nlos_gaussian_renderer_tpu.ops.fused_rsort import angular_footprints

    cam = cams[i]
    grid = shell_grid(cam, box, 32, 100, 300, c, delta_t)
    d, radius, m_th, m_ph, in_w = angular_footprints(
        scene.means, scene.scales, scene.alive, cam,
        grid.theta, grid.phi, grid.r, spec,
    )
    return jnp.sum(d), jnp.sum(m_th), jnp.sum(m_ph), jnp.sum(in_w)


gfeat = scene.quadratic_form(1.0)


@jax.jit
def quadform_only(i):
    return jnp.sum(scene.quadratic_form(1.0) * cams[i, 0])


for name, fn in [
    ("cull_only", cull_only),
    ("footprints_only", footprints_only),
    ("tiling_only", tiling_only),
    ("quadform_only", quadform_only),
]:
    print(f"{name}: {timeit(fn):7.3f} ms")
