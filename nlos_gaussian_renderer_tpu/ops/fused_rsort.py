"""Distance-sorted, work-list-scheduled fused renderer (pallas backend v3,
'rsort').

The (theta, phi, r)-tile culling of `ops/fused.py` pays for radial selectivity
with a top_k over (n_tiles x G) and coarse 64-bin radial tiles. This variant
exploits a structural fact: a Gaussian's radial footprint is an *interval*
[d - rho, d + rho] around its camera distance d. Three scheduling choices make
it fast on TPU (all three were measured, not guessed — see docs/DESIGN.md):

  1. **Global d-presort.** The whole population is argsorted by camera
     distance ONCE, and the per-angular-tile compaction (top_k over the
     permuted mask) then yields lists that are d-sorted for free — top_k
     returns indices ascending, and ascending permuted index IS ascending d.
     The naive formulation (per-tile gather of d, per-tile argsort,
     take_along_axis of ids/slots/radii) cost ~18 ms/step at 100k Gaussians:
     TPU row-gathers are row-count-bound (~8 ns/row regardless of width), and
     the padded per-tile lists are ~5x the population. After the presort the
     only large gather left is the single fused table gather.
  2. **Per-block radial intervals.** Block b of a tile's d-sorted list covers
     [d_first - rho_max, d_last + rho_max] (tile-level conservative radius);
     block/chunk overlap is an interval test — no searchsorted, and the block
     d-bounds come from two tiny strided gathers.
  3. **Work-list scheduling.** Surviving (tile, chunk, block) triples are
     compacted into a flat list driving a 1-D Pallas grid with
     scalar-prefetched coordinates. A dense (tile, chunk, capacity) grid is
     >90% empty steps at static worst-case caps and Mosaic's per-step cost
     made the kernels grid-bound (measured 33 ms vs 10 ms at 5k from empty
     blocks; 18k/40k-step grids for ~1.5k real items at 100k). The forward
     list is sorted by output tile (consecutive output revisits, elided
     sample-block DMAs); the backward list is the same items sorted by
     Gaussian block.

The kernels evaluate the Mahalanobis quadratic form **centered at each tile's
sample centroid** so the MXU contraction runs in bf16 with an x3-style hi/lo
split — one MXU pass instead of six f32-HIGHEST passes (the uncentered form
needs ~15 more mantissa bits than bf16x3 carries; centering shrinks the
cancellation ratio from ~3e4 to ~3e3, and the hi/hi + hi/lo + lo/hi split
rides along K=30 <= 128 inside the SAME padded pass for free).

Block-rounding only ever ADDS sub-cutoff Gaussians (their pdf at the chunk's
samples is below the sigma_cull tail) — never drops one, so the result is a
(slightly more accurate) superset of the tile path's sum.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused import (
    FDIM,
    _interpret_default,
    take_rows,
    tile_grid_dims,
    tile_points_centered,
    untile_field,
)


class RSortSpec(NamedTuple):
    """Static configuration of the rsort renderer."""

    t_theta: int = 8
    t_phi: int = 16
    t_chunk: int = 8  # radial bins per chunk
    k_ang: int = 49152  # per-angular-tile Gaussian capacity
    g_tile: int = 256
    w_max: int = 4096  # work-list capacity: (tile, chunk, block) triples
    sigma_cull: float = 3.0
    margin: float = 1.1


class RSortTiles(NamedTuple):
    perm: jax.Array  # (G,) int32 global d-ascending permutation
    inv_perm: jax.Array  # (G,) int32 its inverse
    sorted_ids: jax.Array  # (T_ang, k_ang) int32 PERMUTED ids, d-ascending
    counts: jax.Array  # (T_ang,) int32
    # Flat work list, forward order (sorted by tile, chunk, block):
    fwd_t: jax.Array  # (W,) int32 angular tile
    fwd_j: jax.Array  # (W,) int32 radial chunk
    fwd_b: jax.Array  # (W,) int32 gaussian block
    fwd_first: jax.Array  # (W,) int32 1 when this item starts a new out tile
    # Same items, backward order (sorted by tile, block, chunk):
    bwd_t: jax.Array  # (W,) int32
    bwd_j: jax.Array  # (W,) int32
    bwd_b: jax.Array  # (W,) int32
    bwd_first: jax.Array  # (W,) int32 1 when this item starts a new (t, b)
    n_items: jax.Array  # (1,) int32 valid work items
    tile_has_work: jax.Array  # (T_ang, n_ch) bool
    blk_has_work: jax.Array  # (T_ang, KB) bool
    overflowed: jax.Array  # () bool


def rsort_cull(
    means, scales, alive, cam, theta, phi, r, spec: RSortSpec,
    scaling_modifier: float = 1.0,
) -> RSortTiles:
    ns = theta.shape[0]
    num_r = r.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)
    t_ang = n_tt * n_pt
    g = means.shape[0]

    rel = means - jnp.asarray(cam)[None, :]
    sph = gmath.cartesian_to_spherical(rel)
    d = jnp.maximum(sph[:, 0], 1e-9)
    radius = (
        spec.sigma_cull * scaling_modifier * jnp.max(scales, axis=-1) * spec.margin
    )
    radius = jnp.where(alive > 0.5, radius, -1.0)

    alpha = jnp.arcsin(jnp.clip(radius / d, -1.0, 1.0))
    th_lo, th_hi = sph[:, 1] - alpha, sph[:, 1] + alpha
    sin_min = jnp.maximum(
        jnp.minimum(
            jnp.sin(jnp.clip(th_lo, 0.0, jnp.pi)),
            jnp.sin(jnp.clip(th_hi, 0.0, jnp.pi)),
        ),
        1e-3,
    )
    phi_ratio = radius / (d * sin_min)
    dphi = jnp.arcsin(jnp.clip(phi_ratio, -1.0, 1.0))
    ph_lo, ph_hi = sph[:, 2] - dphi, sph[:, 2] + dphi
    # Degenerate footprints cover everything (see cull_tiles): sphere contains
    # the scan point / cone wraps a pole / phi window crosses the +-pi seam.
    full_th = (radius >= d) & (radius >= 0.0)
    full_ph = (
        full_th | (phi_ratio >= 1.0) | (ph_lo < -jnp.pi) | (ph_hi > jnp.pi)
    ) & (radius >= 0.0)

    def overlap(lo, hi, axis_vals, tile_size, n_tiles):
        pad = n_tiles * tile_size - axis_vals.shape[0]
        av = jnp.concatenate([axis_vals, jnp.full((pad,), axis_vals[-1])])
        tiles = av.reshape(n_tiles, tile_size)
        t_lo = jnp.minimum(tiles[:, 0], tiles[:, -1])
        t_hi = jnp.maximum(tiles[:, 0], tiles[:, -1])
        return (lo[:, None] <= t_hi[None, :]) & (hi[:, None] >= t_lo[None, :])

    m_th = overlap(th_lo, th_hi, theta, spec.t_theta, n_tt) | full_th[:, None]
    m_ph = overlap(ph_lo, ph_hi, phi, spec.t_phi, n_pt) | full_ph[:, None]
    in_window = (d - radius <= r[-1]) & (d + radius >= r[0]) & (radius >= 0.0)
    mask = (
        m_th[:, :, None] & m_ph[:, None, :] & in_window[:, None, None]
    ).reshape(g, t_ang)

    raw_counts = jnp.sum(mask.astype(jnp.int32), axis=0)  # (T_ang,)
    # Per-tile conservative footprint radius (original order; masked max).
    rho_max = jnp.max(
        jnp.where(mask, radius[:, None], 0.0), axis=0
    )  # (T_ang,)

    # Global d-ascending presort (see module docstring, point 1).
    perm = jnp.argsort(d).astype(jnp.int32)
    inv_perm = (
        jnp.zeros((g,), jnp.int32).at[perm].set(
            jnp.arange(g, dtype=jnp.int32), unique_indices=True
        )
    )
    d_perm = d[perm]
    mask_perm = mask[perm]

    # Effective capacity scales with the population (static): padding the
    # lists to a fixed large k_ang would make small scenes iterate hundreds
    # of empty blocks (measured 33 ms vs 10 ms at 5k Gaussians).
    k_eff = min(spec.k_ang, pl.cdiv(g, spec.g_tile) * spec.g_tile)
    k_cap = min(k_eff, g)
    # top_k over the permuted mask: per tile, indices of set bits ascending —
    # i.e. d-ascending, already sorted. No per-tile argsort/gathers needed.
    _, idx = jax.lax.top_k(mask_perm.astype(jnp.float32).T, k_cap)
    if k_cap < k_eff:
        idx = jnp.pad(idx, ((0, 0), (0, k_eff - k_cap)))
    idx = idx.astype(jnp.int32)
    counts = jnp.minimum(raw_counts, k_eff)

    # Per-block radial intervals from the block's first/last valid member
    # (d-ascending within each tile list) +- the tile's rho_max.
    kb_total = k_eff // spec.g_tile
    blk = jnp.arange(kb_total)
    first_slot = blk * spec.g_tile  # (KB,)
    last_valid = jnp.clip(
        counts[:, None] - 1, first_slot[None, :],
        first_slot[None, :] + spec.g_tile - 1,
    )  # (T, KB)
    ids_first = jnp.take_along_axis(
        idx, jnp.broadcast_to(first_slot[None, :], last_valid.shape), axis=1
    )
    ids_last = jnp.take_along_axis(idx, last_valid, axis=1)
    blk_valid = first_slot[None, :] < counts[:, None]  # (T, KB)
    blk_lo = jnp.where(
        blk_valid, d_perm[ids_first] - rho_max[:, None], jnp.inf
    )
    blk_hi = jnp.where(
        blk_valid, d_perm[ids_last] + rho_max[:, None], -jnp.inf
    )

    # Radial chunk edges over the padded bin range.
    dr = r[1] - r[0]
    pad_bins = n_ch * spec.t_chunk - num_r
    r_hi_pad = r[-1] + pad_bins * dr
    chunk_lo = r[0] + jnp.arange(n_ch) * (spec.t_chunk * dr) - 0.5 * dr
    chunk_hi = chunk_lo + spec.t_chunk * dr
    chunk_hi = jnp.minimum(chunk_hi, r_hi_pad + 0.5 * dr)

    # (T, KB, n_ch): block b contributes to chunk j iff intervals overlap.
    needed = (blk_lo[:, :, None] <= chunk_hi[None, None, :]) & (
        blk_hi[:, :, None] >= chunk_lo[None, None, :]
    )

    # Flat work lists (see module docstring). argsort of the negated mask is
    # stable, so list positions are the set bits in ascending flat order.
    def work_list(mask_flat, w):
        pos = jnp.argsort(
            jnp.logical_not(mask_flat), stable=True
        )[:w].astype(jnp.int32)
        return pos

    w = spec.w_max
    n_items = jnp.sum(needed.astype(jnp.int32))
    # forward order: (t, j, b)
    pos_f = work_list(needed.transpose(0, 2, 1).reshape(-1), w)
    fwd_t = pos_f // (n_ch * kb_total)
    fwd_j = (pos_f // kb_total) % n_ch
    fwd_b = pos_f % kb_total
    out_f = fwd_t * n_ch + fwd_j
    fwd_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (out_f[1:] != out_f[:-1]).astype(jnp.int32)]
    )
    # backward order: (t, b, j)
    pos_b = work_list(needed.reshape(-1), w)
    bwd_t = pos_b // (kb_total * n_ch)
    bwd_b = (pos_b // n_ch) % kb_total
    bwd_j = pos_b % n_ch
    out_b = bwd_t * kb_total + bwd_b
    bwd_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (out_b[1:] != out_b[:-1]).astype(jnp.int32)]
    )

    overflow = jnp.any(raw_counts > k_eff) | (n_items > w)
    return RSortTiles(
        perm=perm,
        inv_perm=inv_perm,
        sorted_ids=idx,
        counts=counts,
        fwd_t=fwd_t, fwd_j=fwd_j, fwd_b=fwd_b, fwd_first=fwd_first,
        bwd_t=bwd_t, bwd_j=bwd_j, bwd_b=bwd_b, bwd_first=bwd_first,
        n_items=jnp.minimum(n_items, w).reshape(1),
        tile_has_work=jnp.any(needed, axis=1),  # (T, n_ch)
        blk_has_work=jnp.any(needed, axis=2),  # (T, KB)
        overflowed=overflow,
    )


# --- kernels -----------------------------------------------------------------
#
# Both kernels evaluate the quadratic form in the tile-centered basis:
#   g' = T(g; x0):  A' = A,  b' = b + 2 A x0,  c' = c + b.x0 + x0^T A x0
# with the packed layout [A00, A11, A22, 2A01, 2A02, 2A12, b0, b1, b2, c]
# (see gmath.gaussian_quadratic_form). The transform is linear in g, so the
# backward applies its transpose to the centered-basis cotangent.


def _center_transform(gf, x0, y0, z0):
    """(K, 10) original-basis forms -> centered-basis forms (VPU, per block)."""
    g0, g1, g2 = gf[:, 0], gf[:, 1], gf[:, 2]
    g3, g4, g5 = gf[:, 3], gf[:, 4], gf[:, 5]
    g6, g7, g8, g9 = gf[:, 6], gf[:, 7], gf[:, 8], gf[:, 9]
    b0 = g6 + 2.0 * g0 * x0 + g3 * y0 + g4 * z0
    b1 = g7 + 2.0 * g1 * y0 + g3 * x0 + g5 * z0
    b2 = g8 + 2.0 * g2 * z0 + g4 * x0 + g5 * y0
    c = (
        g9
        + g6 * x0 + g7 * y0 + g8 * z0
        + g0 * x0 * x0 + g1 * y0 * y0 + g2 * z0 * z0
        + g3 * x0 * y0 + g4 * x0 * z0 + g5 * y0 * z0
    )
    return jnp.stack([g0, g1, g2, g3, g4, g5, b0, b1, b2, c], axis=1)


def _center_transform_t(dgp, x0, y0, z0):
    """Transpose of `_center_transform` in g: centered-basis cotangent ->
    original-basis cotangent."""
    d0, d1, d2 = dgp[:, 0], dgp[:, 1], dgp[:, 2]
    d3, d4, d5 = dgp[:, 3], dgp[:, 4], dgp[:, 5]
    d6, d7, d8, d9 = dgp[:, 6], dgp[:, 7], dgp[:, 8], dgp[:, 9]
    return jnp.stack(
        [
            d0 + 2.0 * x0 * d6 + x0 * x0 * d9,
            d1 + 2.0 * y0 * d7 + y0 * y0 * d9,
            d2 + 2.0 * z0 * d8 + z0 * z0 * d9,
            d3 + y0 * d6 + x0 * d7 + x0 * y0 * d9,
            d4 + z0 * d6 + x0 * d8 + x0 * z0 * d9,
            d5 + z0 * d7 + y0 * d8 + y0 * z0 * d9,
            d6 + x0 * d9,
            d7 + y0 * d9,
            d8 + z0 * d9,
            d9,
        ],
        axis=1,
    )


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bf16_dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _maha_centered_bf16(x_hi, x_lo, gp):
    """(S, 10)-pair centered monomials x (K, 10) centered forms -> (S, K).

    bf16x3-style product in ONE MXU pass: concatenating [x_hi, x_hi, x_lo]
    against [g_hi, g_lo, g_hi] along K puts the three cross terms in a K=30
    contraction, which the MXU pads to 128 anyway — same cost as K=10. The
    dropped lo*lo term is ~2^-16 relative. f32 accumulation via
    preferred_element_type.
    """
    g_hi, g_lo = _split_hi_lo(gp)
    xcat = jnp.concatenate([x_hi, x_hi, x_lo], axis=1)  # (S, 30) bf16
    gcat = jnp.concatenate([g_hi, g_lo, g_hi], axis=1)  # (K, 30) bf16
    return _bf16_dot(xcat, gcat, ((1,), (1,)))


def _slot_mask(bb, cnt_t, g_tile):
    """(1, K) validity of this Gaussian block's slots (block bb of the
    per-tile list; slots >= counts[t] are top_k padding)."""
    base = bb * g_tile
    col = jax.lax.broadcasted_iota(jnp.int32, (1, g_tile), 1) + base
    return (col < cnt_t).astype(jnp.float32)


def _rs_fwd_kernel(ft, fj, fb, first, cnt, counts, cx, x_ref, gw_ref, out_ref,
                   *, t_ang, n_c):
    i = pl.program_id(0)
    live = i < cnt[0]

    @pl.when(jnp.logical_and(live, first[i] == 1))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(live)
    def _():
        tile = fj[i] * t_ang + ft[i]
        x0, y0, z0 = cx[tile, 0], cx[tile, 1], cx[tile, 2]
        gw = gw_ref[0]
        gp = _center_transform(gw[:, :FDIM], x0, y0, z0)
        smask = _slot_mask(fb[i], counts[ft[i]], gw.shape[0])
        m = _maha_centered_bf16(
            x_ref[0][:, :FDIM], x_ref[0][:, FDIM:], gp
        )
        p = jnp.exp(-0.5 * jnp.maximum(m, 0.0))
        for c in range(n_c):
            w = gw[:, FDIM + c] * smask[0]
            out_ref[0, :, c] += jnp.sum(p * w[None, :], axis=1)


def _rs_bwd_kernel(bt, bj, bb, first, cnt, counts, cx, x_ref, gw_ref, go_ref,
                   dgw_ref, *, t_ang, n_c):
    i = pl.program_id(0)
    live = i < cnt[0]

    @pl.when(jnp.logical_and(live, first[i] == 1))
    def _():
        dgw_ref[...] = jnp.zeros_like(dgw_ref)

    @pl.when(live)
    def _():
        tile = bj[i] * t_ang + bt[i]
        x0, y0, z0 = cx[tile, 0], cx[tile, 1], cx[tile, 2]
        gw = gw_ref[0]
        gp = _center_transform(gw[:, :FDIM], x0, y0, z0)
        x_hi = x_ref[0][:, :FDIM]
        x_lo = x_ref[0][:, FDIM:]
        smask = _slot_mask(bb[i], counts[bt[i]], gw.shape[0])[0]
        m = _maha_centered_bf16(x_hi, x_lo, gp)
        p = jnp.exp(-0.5 * jnp.maximum(m, 0.0))
        # dw[k, c] = sum_a p[a, k] go[a, c] — MXU (M = 2C pads to 8 sublanes)
        # beats a per-channel VPU sublane reduction; bf16x3-style split with
        # the go_hi/go_lo halves packed into one pass.
        p_hi, p_lo = _split_hi_lo(p)
        go_hi, go_lo = _split_hi_lo(go_ref[0])  # (S, C)
        go_cat = jnp.concatenate([go_hi, go_lo], axis=1)  # (S, 2C)
        t1 = _bf16_dot(go_cat, p_hi, ((0,), (0,)))  # (2C, K)
        dw = t1[:n_c] + t1[n_c:] + _bf16_dot(go_hi, p_lo, ((0,), (0,)))
        dw = dw * smask[None, :]
        w0 = gw[:, FDIM] * smask
        wg = go_ref[0, :, 0][:, None] * w0[None, :]
        for c in range(1, n_c):
            wc = gw[:, FDIM + c] * smask
            wg += go_ref[0, :, c][:, None] * wc[None, :]
        dm = jnp.where(m > 0.0, -0.5 * p * wg, 0.0)
        # dg'[k, f] = sum_a dm[a, k] x[a, f] — bf16x3 over the (large,
        # unpadded) S contraction in TWO passes: [x_hi | x_lo] share the
        # first dot's lane padding (N = 20 <= 128), the lo x hi term needs
        # its own pass.
        dm_hi, dm_lo = _split_hi_lo(dm)
        both = _bf16_dot(dm_hi, x_ref[0], ((0,), (0,)))  # (K, 2*FDIM)
        dgp = both[:, :FDIM] + both[:, FDIM:] + _bf16_dot(
            dm_lo, x_hi, ((0,), (0,))
        )
        dg = _center_transform_t(dgp, x0, y0, z0)
        dgw_ref[0] += jnp.concatenate([dg, dw.T], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def rsort_field(
    xfeat,  # (n_tiles_total, S, 20) CENTERED monomials, bf16 [hi | lo]
    centers,  # (n_tiles_total, 3) tile centers
    gw_sorted,  # (T_ang, k_ang, 10 + C) gathered forms+weights (orig basis)
    counts,  # (T_ang,) valid slots per tile (w-masking happens in-kernel)
    fwd_t, fwd_j, fwd_b, fwd_first,  # (W,) forward work list
    bwd_t, bwd_j, bwd_b, bwd_first,  # (W,) backward work list
    n_items,  # (1,) int32
    tile_has_work,  # (T_ang, n_ch)
    blk_has_work,  # (T_ang, KB)
    spec: RSortSpec = RSortSpec(),
    dims: Tuple[int, int, int] = (4, 2, 25),  # (n_tt, n_pt, n_ch)
    interpret: Optional[bool] = None,
):
    """out (n_tiles_total, S, C) = per-chunk field sums (work-list-sparse)."""
    return _rsort_fwd_impl(
        xfeat, centers, gw_sorted, counts, fwd_t, fwd_j, fwd_b, fwd_first,
        n_items, tile_has_work, spec, dims, interpret,
    )


def _tile_id_map(n_tt, n_pt):
    def f(t, j):
        tt = t // n_pt
        ptt = t % n_pt
        return (j * n_tt + tt) * n_pt + ptt

    return f


def _rsort_fwd_impl(xfeat, centers, gw_sorted, counts, fwd_t, fwd_j, fwd_b,
                    fwd_first, n_items, tile_has_work, spec, dims, interpret):
    n_tt, n_pt, n_ch = dims
    t_ang = n_tt * n_pt
    s = xfeat.shape[1]
    c = gw_sorted.shape[-1] - FDIM
    interp = _interpret_default() if interpret is None else interpret
    tid = _tile_id_map(n_tt, n_pt)

    def ie(i, cnt):
        return jnp.clip(i, 0, jnp.maximum(cnt[0] - 1, 0))

    def x_map(i, ft, fj, fb, first, cnt, counts_r, cx):
        k = ie(i, cnt)
        return (tid(ft[k], fj[k]), 0, 0)

    def g_map(i, ft, fj, fb, first, cnt, counts_r, cx):
        k = ie(i, cnt)
        return (ft[k], fb[k], 0)

    out = pl.pallas_call(
        functools.partial(_rs_fwd_kernel, t_ang=t_ang, n_c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(spec.w_max,),
            in_specs=[
                pl.BlockSpec((1, s, 2 * FDIM), x_map),
                pl.BlockSpec((1, spec.g_tile, FDIM + c), g_map),
            ],
            out_specs=pl.BlockSpec((1, s, c), x_map),
        ),
        out_shape=jax.ShapeDtypeStruct((xfeat.shape[0], s, c), jnp.float32),
        interpret=interp,
    )(
        fwd_t, fwd_j, fwd_b, fwd_first, n_items, counts, centers,
        xfeat, gw_sorted,
    )
    # Tiles with no work items are never visited by the kernel: their output
    # blocks are uninitialized memory. Mask them to exact zeros (NaN-safe).
    tile_ids = jnp.arange(xfeat.shape[0])
    t_of = tile_ids % t_ang  # padded-layout tile order is (j, t)
    j_of = tile_ids // t_ang
    has = tile_has_work[t_of, j_of]  # (n_tiles_total,)
    return jnp.where(has[:, None, None], out, 0.0)


def _rsort_vjp_fwd(xfeat, centers, gw_sorted, counts, fwd_t, fwd_j, fwd_b,
                   fwd_first, bwd_t, bwd_j, bwd_b, bwd_first, n_items,
                   tile_has_work, blk_has_work, spec, dims, interpret):
    out = _rsort_fwd_impl(
        xfeat, centers, gw_sorted, counts, fwd_t, fwd_j, fwd_b, fwd_first,
        n_items, tile_has_work, spec, dims, interpret,
    )
    return out, (xfeat, centers, gw_sorted, counts, bwd_t, bwd_j, bwd_b,
                 bwd_first, n_items, blk_has_work)


def _rsort_vjp_bwd(spec, dims, interpret, res, go):
    (xfeat, centers, gw_sorted, counts, bwd_t, bwd_j, bwd_b, bwd_first,
     n_items, blk_has_work) = res
    n_tt, n_pt, n_ch = dims
    t_ang = n_tt * n_pt
    s = xfeat.shape[1]
    c = gw_sorted.shape[-1] - FDIM
    interp = _interpret_default() if interpret is None else interpret
    tid = _tile_id_map(n_tt=n_tt, n_pt=n_pt)

    def ie(i, cnt):
        return jnp.clip(i, 0, jnp.maximum(cnt[0] - 1, 0))

    def x_map(i, bt, bj, bb, first, cnt, counts_r, cx):
        k = ie(i, cnt)
        return (tid(bt[k], bj[k]), 0, 0)

    def g_map(i, bt, bj, bb, first, cnt, counts_r, cx):
        k = ie(i, cnt)
        return (bt[k], bb[k], 0)

    dgw = pl.pallas_call(
        functools.partial(_rs_bwd_kernel, t_ang=t_ang, n_c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(spec.w_max,),
            in_specs=[
                pl.BlockSpec((1, s, 2 * FDIM), x_map),
                pl.BlockSpec((1, spec.g_tile, FDIM + c), g_map),
                pl.BlockSpec((1, s, c), x_map),
            ],
            out_specs=pl.BlockSpec((1, spec.g_tile, FDIM + c), g_map),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (t_ang, gw_sorted.shape[1], FDIM + c), jnp.float32
        ),
        interpret=interp,
    )(bwd_t, bwd_j, bwd_b, bwd_first, n_items, counts, centers,
      xfeat, gw_sorted, go)
    # Gaussian blocks with no work items are never visited: mask their
    # (uninitialized) gradient rows to zero before the scatter-back.
    has = jnp.repeat(blk_has_work, spec.g_tile, axis=1)  # (T_ang, k_ang)
    dgw = dgw * has[..., None]
    return (None, None, dgw) + (None,) * 12


rsort_field.defvjp(_rsort_vjp_fwd, _rsort_vjp_bwd)


@jax.custom_vjp
def permute_rows(table, perm, inv_perm):
    """Row permutation whose backward is the inverse-permutation gather
    (a plain fancy-index backward would be an XLA scatter, which serializes
    on TPU; for a permutation the cotangent is just rows reshuffled)."""
    return table[perm]


def _permute_rows_fwd(table, perm, inv_perm):
    return table[perm], inv_perm


def _permute_rows_bwd(inv_perm, g):
    return g[inv_perm], None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def tune_rsort_spec(
    scene,
    camera_positions,  # (B, 3) representative scan points
    box_points,
    num_sampling_points: int,
    start: int,
    end: int,
    c: float,
    delta_t: float,
    base: RSortSpec = RSortSpec(),
    headroom: float = 1.25,
    scaling_modifier: float = 1.0,
) -> RSortSpec:
    """Fit the rsort capacities to a scene by measuring the cull once.

    Runs `rsort_cull` (with generous probe caps) for a few representative
    cameras and returns a spec whose k_ang / w_max cover the observed maxima
    with `headroom`. Static shapes stay static: call this once before
    building the train step (capacities change rarely — `fit` re-tunes after
    densification milestones and on any runtime overflow).
    """
    import numpy as np

    from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

    g = scene.capacity
    k_probe = pl.cdiv(g, base.g_tile) * base.g_tile
    n_ch = pl.cdiv(end - start, base.t_chunk)
    t_ang = pl.cdiv(num_sampling_points, base.t_theta) * pl.cdiv(
        num_sampling_points, base.t_phi
    )
    probe = base._replace(
        k_ang=k_probe,
        w_max=max((k_probe // base.g_tile) * n_ch * t_ang, 1),
    )
    max_count = 0
    max_items = 1
    for cam in np.asarray(camera_positions).reshape(-1, 3):
        grid = shell_grid(
            jnp.asarray(cam), box_points, num_sampling_points, start, end,
            c, delta_t,
        )
        t = rsort_cull(
            scene.means, scene.scales, scene.alive, jnp.asarray(cam),
            grid.theta, grid.phi, grid.r, probe, scaling_modifier,
        )
        max_count = max(max_count, int(jnp.max(t.counts)))
        max_items = max(max_items, int(t.n_items[0]))

    k_ang = min(
        pl.cdiv(int(max_count * headroom), base.g_tile) * base.g_tile,
        pl.cdiv(g, base.g_tile) * base.g_tile,
    )
    k_ang = max(k_ang, base.g_tile)
    return base._replace(
        k_ang=k_ang,
        w_max=int(max_items * headroom) + 8,
    )


def rsort_gaussian_field(
    gfeat,  # (G, 10)
    channel_weights,  # (G, C)
    points,  # (num_r, ns, ns, 3)
    tiles: RSortTiles,
    spec: RSortSpec,
    interpret: Optional[bool] = None,
):
    """Full work-list-sparse field evaluation: (num_r, ns, ns, C) + overflow."""
    num_r, ns = points.shape[0], points.shape[1]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)

    # Reuse the (r, theta, phi) tiler at chunk granularity.
    from nlos_gaussian_renderer_tpu.ops.fused import TileSpec

    tp_spec = TileSpec(
        t_theta=spec.t_theta, t_phi=spec.t_phi, t_r=spec.t_chunk
    )
    xfeat, centers = tile_points_centered(
        points, ns, num_r, tp_spec, n_tt, n_pt, n_ch
    )

    gw = jnp.concatenate([gfeat, channel_weights], axis=1)
    # One cheap full-population permutation (gather both ways), then ONE
    # padded-list gather; sorted_ids live in permuted space. Padding-slot
    # weights are masked IN-KERNEL from `counts` (an (T, k_ang, C) mask
    # multiply out here cost ~2.5 ms/step at 100k).
    gw_perm = permute_rows(gw, tiles.perm, tiles.inv_perm)
    gw_sorted = take_rows(gw_perm, tiles.sorted_ids, tiles.counts, True)

    # Pre-split bf16 hi/lo monomials (same bytes as f32; saves the split on
    # every kernel step).
    x_hi = xfeat.astype(jnp.bfloat16)
    x_lo = (xfeat - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xfeat_hl = jnp.concatenate([x_hi, x_lo], axis=-1)

    out = rsort_field(
        xfeat_hl, centers, gw_sorted, tiles.counts,
        tiles.fwd_t, tiles.fwd_j, tiles.fwd_b, tiles.fwd_first,
        tiles.bwd_t, tiles.bwd_j, tiles.bwd_b, tiles.bwd_first,
        tiles.n_items, tiles.tile_has_work, tiles.blk_has_work,
        spec, (n_tt, n_pt, n_ch), interpret,
    )
    field = untile_field(out, ns, num_r, tp_spec, n_tt, n_pt, n_ch)
    return field, tiles.overflowed
