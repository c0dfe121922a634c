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


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    bench_sort()
    bench_scatter_add()
    bench_worklist_kernel()
