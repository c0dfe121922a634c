"""Microbenchmarks for the cull/kernel design constants on the real TPU.

Measures, on-device:
  1. lax.sort (1 int32 key + 1 int32 payload) at several row counts — the
     cull's (pattern|tile, d) sort cost model.
  2. Row scatter-add (duplicated sources) at several row counts — the
     duplicated-layout backward combine.
  3. A trivial work-list Pallas kernel (scalar-prefetch 1-D grid, one input
     block + one output block per step, single VPU op) at several grid
     sizes — isolates the per-work-item fixed cost that dominates the
     fused kernels.

Run: python tools/microbench.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit_chained(fn, state, iters=20):
    """fn: state -> state (same structure). Chained so per-iter compute
    cannot pipeline away; one device sync at the end."""
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    return (time.time() - t0) / iters * 1000.0


def bench_sort():
    rng = np.random.default_rng(0)
    for n in (100_000, 200_000, 400_000, 800_000):
        keys = jnp.asarray(rng.integers(0, 1 << 24, n), jnp.int32)
        idx = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def f(st):
            k, i = st
            # Re-randomize cheaply so each iteration sorts fresh data.
            k2 = (k * 1103515245 + i) & ((1 << 24) - 1)
            return jax.lax.sort((k2, i), num_keys=1)

        ms = timeit_chained(f, (keys, idx))
        print(f"sort   n={n:>7}: {ms:7.3f} ms")


def bench_scatter_add():
    rng = np.random.default_rng(0)
    for n, g in ((200_000, 100_000), (400_000, 100_000), (800_000, 100_000)):
        src = jnp.asarray(rng.integers(0, g, n), jnp.int32)
        rows = jnp.asarray(rng.standard_normal((n, 12)), jnp.float32)

        @jax.jit
        def f(st):
            s_, r = st
            out = jnp.zeros((g, 12), jnp.float32).at[s_].add(r)
            # Feed a perturbed scatter back in (keeps the chain honest).
            return (s_, r + out[s_ % g] * 1e-9)

        ms = timeit_chained(f, (src, rows))
        print(f"scatt  n={n:>7}: {ms:7.3f} ms")


def _wl_kernel(fb, cnt, x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i < cnt[0])
    def _():
        o_ref[0] += x_ref[0] * 2.0


def bench_worklist_kernel():
    rng = np.random.default_rng(0)
    kb = 512
    for s, k, w in (
        (1024, 256, 512), (1024, 256, 1024), (1024, 256, 2048),
        (4096, 256, 512), (4096, 256, 1024),
        (256, 256, 2048), (256, 256, 4096),
    ):
        x = jnp.asarray(rng.standard_normal((kb, s, 8)), jnp.float32)
        fb = jnp.asarray(rng.integers(0, kb, w), jnp.int32)
        cnt = jnp.asarray([w], jnp.int32)

        def g_map(i, fb_, cnt_):
            return (fb_[i], 0, 0)

        f = pl.pallas_call(
            _wl_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(w,),
                in_specs=[pl.BlockSpec((1, s, 8), g_map)],
                out_specs=pl.BlockSpec((1, s, 8), g_map),
            ),
            out_shape=jax.ShapeDtypeStruct((kb, s, 8), jnp.float32),
        )
        jf = jax.jit(lambda st: (st[0], st[1], f(st[0], st[1], st[2])))
        ms = timeit_chained(jf, (fb, cnt, x))
        print(f"wlkern s={s:>5} w={w:>5}: {ms:7.3f} ms "
              f"({ms * 1000 / w:6.2f} us/item)")


def bench_rsort_step_components(gaussians=100_000, gate_bins_list=(4, 32)):
    """Isolate the flagship step's pieces at bench scale on hardware:
    cull, forward kernel, forward+backward, each timed separately."""
    import dataclasses

    from nlos_gaussian_renderer_tpu.data.synthetic import (
        make_ground_truth_scene,
    )
    from nlos_gaussian_renderer_tpu.ops import math as gmath
    from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
        RSortSpec,
        rsort_cull,
        rsort_gaussian_field,
        tune_rsort_spec,
    )
    from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

    rng = np.random.default_rng(0)
    vol = np.array([0.0, 1.0, 0.0], np.float32)
    scene = make_ground_truth_scene(rng, gaussians, vol, 0.6)
    scene = dataclasses.replace(
        scene,
        log_scales=jnp.asarray(
            rng.uniform(np.log(0.002), np.log(0.012), (gaussians, 3)),
            jnp.float32,
        ),
    )
    box = gmath.volume_box_points(jnp.asarray(vol), 0.6)
    probe = np.stack(
        [[-0.4, 0, -0.4], [0, 0, 0], [0.4, 0, 0.4]]
    ).astype(np.float32)
    cam = jnp.asarray([0.0, 0.0, 0.0])
    grid = shell_grid(cam, box, 32, 100, 300, 1.0, 0.0052)
    gfeat = scene.quadratic_form(1.0)
    w2 = jnp.stack(
        [scene.opacities[:, 0], scene.opacities[:, 0] * 0.5], axis=1
    )

    for gb in gate_bins_list:
        for bwd_bf16 in (True, False):
            spec = tune_rsort_spec(
                scene, probe, box, 32, 100, 300, 1.0, 0.0052,
                base=RSortSpec(t_chunk=32, gate_bins=gb,
                               bwd_p_bf16=bwd_bf16),
            )

            @jax.jit
            def cull_fn(mu):
                return rsort_cull(
                    mu, scene.scales, scene.alive, cam, grid.theta,
                    grid.phi, grid.r, spec,
                )

            @jax.jit
            def fwd_fn(gf):
                tiles = cull_fn(scene.means)
                f, _ = rsort_gaussian_field(
                    gf, w2, None, tiles, spec, grid=grid, cam=cam
                )
                return jnp.sum(f) * 1e-9 + gf[0, 0]  # keep alive, chained

            @jax.jit
            def fwdbwd_fn(gf):
                def loss(g_):
                    tiles = cull_fn(scene.means)
                    f, _ = rsort_gaussian_field(
                        g_, w2, None, tiles, spec, grid=grid, cam=cam
                    )
                    return jnp.sum(f)

                g = jax.grad(loss)(gf)
                return gf + g * 1e-12  # chained

            @jax.jit
            def cull_chain(mu):
                t = cull_fn(mu)
                return mu + t.n_items[0].astype(jnp.float32) * 1e-12

            ms_c = timeit_chained(cull_chain, scene.means)
            ms_f = timeit_chained(fwd_fn, gfeat)
            ms_fb = timeit_chained(fwdbwd_fn, gfeat)
            print(
                f"rsort gate={gb:>2} bwd_bf16={int(bwd_bf16)}: "
                f"cull {ms_c:6.3f}  cull+fwd {ms_f:6.3f}  "
                f"cull+fwd+bwd {ms_fb:6.3f} ms"
            )


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    if "--rsort" in sys.argv:
        bench_rsort_step_components()
    else:
        bench_sort()
        bench_scatter_add()
        bench_worklist_kernel()
