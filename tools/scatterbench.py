"""Microbench: does TPU scatter cost scale with row WIDTH or row COUNT?

Decides the rsort layout strategy: if a unique-indices row scatter of W
columns costs the same as 1 column (per-row serialization), then ONE wide
scatter of table+vals into the padded layout can replace the sort-side
gather chain AND the s32 inv_perm scatter. Also times the counting-rank
pipeline (onehot block cum-counts via tril matmul) as a sort replacement.

Usage: python tools/scatterbench.py [G]
"""

from __future__ import annotations

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


def timeit(fn, *args, iters=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    g_pad = g + 26 * 256
    rng = np.random.default_rng(0)
    perm_np = rng.permutation(g).astype(np.int32)
    dest = jnp.asarray(rng.permutation(g_pad)[:g].astype(np.int32))
    perm = jnp.asarray(perm_np)
    vals1 = jnp.asarray(rng.standard_normal((g,)).astype(np.float32))

    @jax.jit
    def scat1(d, v):
        return jnp.zeros((g_pad,), jnp.float32).at[d].set(
            v, unique_indices=True, mode="promise_in_bounds")

    def scat_w(w):
        v = jnp.asarray(rng.standard_normal((g, w)).astype(np.float32))

        @jax.jit
        def f(d, v):
            return jnp.zeros((g_pad, w), jnp.float32).at[d].set(
                v, unique_indices=True, mode="promise_in_bounds")
        return timeit(f, dest, v)

    @jax.jit
    def inv_scat(p):
        return jnp.zeros((g,), jnp.int32).at[p].set(
            jnp.arange(g, dtype=jnp.int32),
            unique_indices=True, mode="promise_in_bounds")

    @jax.jit
    def sort_pair(k):
        return jax.lax.sort((k, jnp.arange(g, dtype=jnp.int32)), num_keys=1)

    @jax.jit
    def sort_single(k):
        return jax.lax.sort((k,), num_keys=1)

    keys = jnp.asarray(rng.integers(0, 1 << 23, g).astype(np.int32))

    print(f"G={g} g_pad={g_pad}")
    print(f"scatter f32 (G,)      : {timeit(scat1, dest, vals1):7.3f} ms")
    for w in (4, 8, 16):
        print(f"scatter f32 (G,{w:2d})    : {scat_w(w):7.3f} ms")
    print(f"inv-perm s32 scatter  : {timeit(inv_scat, perm):7.3f} ms")
    print(f"lax.sort key+payload  : {timeit(sort_pair, keys):7.3f} ms")
    print(f"lax.sort key only     : {timeit(sort_single, keys):7.3f} ms")

    # counting-rank pipeline: word in [0, 128), stable rank within word.
    words = jnp.asarray(rng.integers(64, 128, g).astype(np.int32))
    ncols = 128
    blk = 512
    nb = (g + blk - 1) // blk
    gp = nb * blk
    tril = jnp.asarray(
        np.tril(np.ones((blk, blk), np.float32), -1).astype(np.float32)
    )

    @jax.jit
    def counting_rank(w):
        oh = (
            w[:, None] == jnp.arange(ncols, dtype=jnp.int32)[None, :]
        ).astype(jnp.bfloat16)
        ohp = jnp.pad(oh, ((0, gp - g), (0, 0)))
        ohb = ohp.reshape(nb, blk, ncols)
        blk_cnt = jnp.sum(ohb.astype(jnp.float32), axis=1)  # (nb, C)
        blk_off = jnp.cumsum(blk_cnt, axis=0) - blk_cnt  # exclusive
        within = jax.lax.dot_general(
            jnp.broadcast_to(tril.astype(jnp.bfloat16), (nb, blk, blk)),
            ohb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nb, blk, C) cum-counts
        pos = within + blk_off[:, None, :]
        rank = jnp.sum(pos * ohb.astype(jnp.float32), axis=2)  # (nb, blk)
        start = jnp.cumsum(jnp.sum(blk_cnt, axis=0)) - jnp.sum(blk_cnt, 0)
        sel_start = jnp.sum(
            start[None, None, :] * ohb.astype(jnp.float32), axis=2
        )
        return (rank + sel_start).reshape(gp)[:g].astype(jnp.int32)

    print(f"counting-rank 128 cols: {timeit(counting_rank, words):7.3f} ms")


if __name__ == "__main__":
    main()


def extra():
    g = 100_000
    rng = np.random.default_rng(0)
    keys2 = jnp.asarray(rng.integers(0, 1 << 23, (1, g)).astype(np.int32))

    @jax.jit
    def sort2d(k):
        return jax.lax.sort(
            (k, jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32)[None], (1, g))),
            dimension=1, num_keys=1)

    @jax.jit
    def sort2d_unstable(k):
        return jax.lax.sort(
            (k, jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32)[None], (1, g))),
            dimension=1, num_keys=1, is_stable=False)

    vsort = jax.jit(jax.vmap(
        lambda k: jax.lax.sort((k, jnp.arange(g, dtype=jnp.int32)), num_keys=1)
    ))
    print(f"sort (1,G) dim=1      : {timeit(sort2d, keys2):7.3f} ms")
    print(f"sort (1,G) unstable   : {timeit(sort2d_unstable, keys2):7.3f} ms")
    print(f"vmap(sort (G,))       : {timeit(vsort, keys2):7.3f} ms")


if __name__ == "__main__" and os.environ.get("EXTRA"):
    extra()
