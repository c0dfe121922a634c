"""Duplicated-layout cull (pallas backend v5, 'dsort').

The rsort backend's pattern-sorted layout keeps every Gaussian in ONE table
row, shared by all the angular tiles it touches — which forces the angular
tile to be large (8x16 rays) so that pattern counts stay small. But measured
pair utilization at that tile size is ~1%: a trained Gaussian's angular
footprint (~0.04 rad) is smaller than ONE ray spacing, while the tile spans
128 rays. The kernels are exp-bound on (sample, gaussian) pairs, so that 100x
angular over-coverage is the dominant cost at 100k Gaussians.

dsort inverts the trade: each Gaussian is DUPLICATED into every (small)
angular tile it touches — at fine tiles the duplication factor is ~1.1-1.3
(the footprint crosses at most one tile boundary per axis), measured sorts
and scatters on this hardware are ~0.03 ms at 800k rows, and in exchange:

  * every table block is TILE-PURE: no membership patterns, no bit masks —
    the existing rsort kernels run unchanged with a constant all-ones
    membership word;
  * the angular tile shrinks to ~4x4 rays, cutting kernel pairs ~10x;
  * the work list is per (block, chunk) — each block belongs to exactly one
    tile — so scheduling is simpler than rsort's (block, tile, chunk).

The gradient combine becomes one scatter-add over the duplicated rows
(duplicates of a Gaussian each accumulate their tile's contribution), which
is well-defined for XLA scatter-add and measured cheap.

Degenerate footprints (cull sphere containing the scan point, pole-wrapping
cones, phi-seam crossings) cover a full axis and can exceed `d_max`
duplicates; that trips the overflow flag (never a silent drop) and
`tune_dsort_spec` re-sizes d_max to the observed maximum.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nlos_gaussian_renderer_tpu.ops.fused import TileSpec, untile_field_t
from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
    RSortSpec,
    _full_rect_word,
    angular_footprints,
    rsort_field,
    tile_points_centered,
    xfeat_slab,
)


class DSortTiles(NamedTuple):
    """Duplicated-layout cull result (kernel-facing fields mirror RSortTiles)."""

    full_perm: jax.Array  # (G_pad,) padded slot -> ORIGINAL gaussian row
    words: jax.Array  # (G_pad, 1) full-rect word for valid slots, 0 for padding
    counts: jax.Array  # (T_ang,) per-tile duplicate counts (diagnostics)
    fwd_t: jax.Array
    fwd_j: jax.Array
    fwd_b: jax.Array
    fwd_first: jax.Array
    fwd_bl: jax.Array  # (W,) per-item active bin range within the chunk
    fwd_bh: jax.Array
    bwd_t: jax.Array
    bwd_j: jax.Array
    bwd_b: jax.Array
    bwd_first: jax.Array
    bwd_bl: jax.Array
    bwd_bh: jax.Array
    n_items: jax.Array  # (1,)
    tile_has_work: jax.Array  # (T_ang, n_ch)
    blk_has_work: jax.Array  # (KB,)
    max_dups: jax.Array  # () int32 observed per-gaussian duplicate count
    n_rows: jax.Array  # () int32 observed valid duplicate rows
    overflowed: jax.Array  # () bool — any capacity saturated


def _dsort_rows(g: int, spec: RSortSpec) -> int:
    return spec.dup_rows if spec.dup_rows > 0 else g * spec.d_max


def _padded_rows(g: int, spec: RSortSpec, t_ang: int) -> int:
    rows = _dsort_rows(g, spec)
    return pl.cdiv(rows, spec.g_tile) * spec.g_tile + t_ang * spec.g_tile


def dsort_cull(
    means, scales, alive, cam, theta, phi, r, spec: RSortSpec,
    scaling_modifier: float = 1.0,
) -> DSortTiles:
    ns = theta.shape[0]
    num_r = r.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)
    t_ang = n_tt * n_pt
    g = means.shape[0]
    d_max = spec.d_max

    d, radius, m_th, m_ph, in_window = angular_footprints(
        means, scales, alive, cam, theta, phi, r, spec, scaling_modifier
    )

    # Touched-tile rectangle per Gaussian: footprints are contiguous per axis.
    a0 = jnp.argmax(m_th, axis=1).astype(jnp.int32)
    cnt_a = jnp.sum(m_th.astype(jnp.int32), axis=1)
    b0 = jnp.argmax(m_ph, axis=1).astype(jnp.int32)
    cnt_b = jnp.sum(m_ph.astype(jnp.int32), axis=1)
    valid = in_window & (cnt_a > 0) & (cnt_b > 0)
    cnt = jnp.where(valid, cnt_a * cnt_b, 0)
    dup_overflow = jnp.any(cnt > d_max)

    # Enumerate up to d_max duplicates (row-major in the rectangle).
    k = jnp.arange(d_max, dtype=jnp.int32)
    cb = jnp.maximum(cnt_b, 1)[:, None]
    ka = k[None, :] // cb
    kb_ = k[None, :] - ka * cb
    tile_k = (a0[:, None] + ka) * n_pt + (b0[:, None] + kb_)  # (G, d_max)
    dup_valid = valid[:, None] & (k[None, :] < cnt[:, None])

    # Packed sort key: (tile | sentinel t_ang) high bits, quantized d low.
    t_bits = max(int(t_ang).bit_length(), 1)
    dq_bits = min(30 - t_bits, 16)
    if dq_bits < 8:
        raise ValueError(f"angular tiling too fine to pack keys: {t_ang}")
    d_lo = jnp.min(d)
    d_span = jnp.maximum(jnp.max(d) - d_lo, 1e-6)
    dq = jnp.clip(
        ((d - d_lo) / d_span * ((1 << dq_bits) - 1)).astype(jnp.int32),
        0, (1 << dq_bits) - 1,
    )
    key = jnp.where(dup_valid, tile_k, t_ang) * (1 << dq_bits) + dq[:, None]
    src = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[:, None], (g, d_max)
    )
    key_s, src_s = jax.lax.sort(
        (key.reshape(-1), src.reshape(-1)), num_keys=1
    )
    tile_s = key_s // (1 << dq_bits)  # (G*d_max,) ascending
    valid_s = tile_s < t_ang
    n_rows = jnp.sum(valid_s.astype(jnp.int32))

    # Per-tile runs -> block-aligned layout. tile_s is sorted, so counts are
    # searchsorted deltas; gathers into the tiny (T_ang,) tables are cheap.
    tids = jnp.arange(t_ang, dtype=jnp.int32)
    left = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    right = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    cnt_t = right - left  # (T_ang,) == counts diagnostics
    padded_t = pl.cdiv(cnt_t, spec.g_tile) * spec.g_tile
    start_t = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_t)[:-1]]
    )

    g_pad = _padded_rows(g, spec, t_ang)
    tile_idx = jnp.minimum(tile_s, t_ang - 1)
    pos = jnp.arange(g * d_max, dtype=jnp.int32) - left[tile_idx]
    dest = jnp.where(valid_s, start_t[tile_idx] + pos, g_pad)
    row_overflow = jnp.any(jnp.where(valid_s, dest, 0) >= g_pad)
    # Duplicated rows belong to every block of their own tile by
    # construction, so their rect word claims full coverage (slot validity
    # still comes from word != 0; padding rows scatter to 0).
    n_words = 1
    sc_vals = jnp.concatenate(
        [
            src_s[:, None],
            jnp.full((g * d_max, 1), _full_rect_word(n_tt, n_pt), jnp.int32),
        ],
        axis=1,
    )
    scat = (
        jnp.zeros((g_pad, 1 + n_words), jnp.int32)
        .at[jnp.where(valid_s, dest, g_pad)]
        .set(sc_vals, mode="drop")
    )
    full_perm = scat[:, 0]
    words = scat[:, 1:]

    # Per-block radial interval + owning tile.
    kb = g_pad // spec.g_tile
    slot_valid = words[:, 0] != 0
    ends = jnp.stack([d - radius, d + radius], axis=1)[full_perm]
    lo = jnp.where(slot_valid, ends[:, 0], jnp.inf).reshape(kb, spec.g_tile)
    hi = jnp.where(slot_valid, ends[:, 1], -jnp.inf).reshape(kb, spec.g_tile)
    blk_lo = jnp.min(lo, axis=1)  # (KB,)
    blk_hi = jnp.max(hi, axis=1)
    blk_start = jnp.arange(kb, dtype=jnp.int32) * spec.g_tile
    start_next = jnp.concatenate([start_t[1:], jnp.full((1,), g_pad, jnp.int32)])
    blk_tile = jnp.searchsorted(
        start_next, blk_start, side="right"
    ).astype(jnp.int32)  # (KB,) owning tile (blocks are run-aligned)

    dr = r[1] - r[0]
    pad_bins = n_ch * spec.t_chunk - num_r
    r_hi_pad = r[-1] + pad_bins * dr
    chunk_lo = r[0] + jnp.arange(n_ch) * (spec.t_chunk * dr) - 0.5 * dr
    chunk_hi = chunk_lo + spec.t_chunk * dr
    chunk_hi = jnp.minimum(chunk_hi, r_hi_pad + 0.5 * dr)
    j_lo = jnp.searchsorted(chunk_hi, blk_lo, side="left").astype(jnp.int32)
    j_hi = (
        jnp.searchsorted(chunk_lo, blk_hi, side="right").astype(jnp.int32) - 1
    )
    nch_b = jnp.maximum(j_hi - j_lo + 1, 0)  # (KB,)
    n_items = jnp.sum(nch_b)

    # Exact absolute bin ranges per block (see rsort_cull): identical cutoff
    # guarantee to the chunk-level test, used for in-kernel radial gating.
    total_bins = n_ch * spec.t_chunk
    abs_lo = jnp.ceil(
        jnp.clip((blk_lo - r[0]) / dr - 0.5 - 1e-4, 0, total_bins - 1)
    ).astype(jnp.int32)
    abs_hi = jnp.floor(
        jnp.clip((blk_hi - r[0]) / dr + 0.5 + 1e-4, 0, total_bins - 1)
    ).astype(jnp.int32)

    # Work lists by prefix-sum expansion over blocks (see rsort_cull; the
    # pair axis here is just the block — each block has ONE tile).
    w = spec.w_max
    off_b = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nch_b)[:-1]]
    )
    blk_ids = jnp.arange(kb, dtype=jnp.int32)
    slot_of = jnp.where(nch_b > 0, off_b, w)
    blk_at = jnp.zeros((w,), jnp.int32).at[slot_of].max(blk_ids, mode="drop")
    blk_slot = jax.lax.associative_scan(jnp.maximum, blk_at)  # (W,)
    off_w = off_b[blk_slot]
    jlo_w = j_lo[blk_slot]
    bwd_b = blk_slot
    bwd_t = blk_tile[blk_slot]
    bwd_j = jnp.clip(
        jlo_w + (jnp.arange(w, dtype=jnp.int32) - off_w), 0, n_ch - 1
    )
    bwd_first = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (bwd_b[1:] != bwd_b[:-1]).astype(jnp.int32),
        ]
    )
    ends_w = jnp.stack([abs_lo, abs_hi], axis=1)[blk_slot]  # (W, 2)
    bwd_bl = jnp.clip(
        ends_w[:, 0] - bwd_j * spec.t_chunk, 0, spec.t_chunk - 1
    )
    bwd_bh = jnp.clip(
        ends_w[:, 1] - bwd_j * spec.t_chunk, 0, spec.t_chunk - 1
    )
    live = jnp.arange(w, dtype=jnp.int32) < n_items
    fkey = jnp.where(
        live, (bwd_t * n_ch + bwd_j) * kb + bwd_b, jnp.iinfo(jnp.int32).max
    )
    f_ord = jnp.argsort(fkey).astype(jnp.int32)
    fwd_t = bwd_t[f_ord]
    fwd_j = bwd_j[f_ord]
    fwd_b = bwd_b[f_ord]
    fwd_bl = bwd_bl[f_ord]
    fwd_bh = bwd_bh[f_ord]
    out_f = fwd_t * n_ch + fwd_j
    fwd_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (out_f[1:] != out_f[:-1]).astype(jnp.int32)]
    )

    j_grid = jnp.arange(n_ch, dtype=jnp.int32)
    covers = (
        (j_grid[None, :] >= j_lo[:, None]) & (j_grid[None, :] <= j_hi[:, None])
    )  # (KB, n_ch)
    tile_onehot = blk_tile[:, None] == tids[None, :]  # (KB, T)
    tile_has_work = jnp.any(
        tile_onehot[:, :, None] & covers[:, None, :], axis=0
    )  # (T, n_ch)

    return DSortTiles(
        full_perm=full_perm,
        words=words,
        counts=cnt_t,
        fwd_t=fwd_t, fwd_j=fwd_j, fwd_b=fwd_b, fwd_first=fwd_first,
        fwd_bl=fwd_bl, fwd_bh=fwd_bh,
        bwd_t=bwd_t, bwd_j=bwd_j, bwd_b=bwd_b, bwd_first=bwd_first,
        bwd_bl=bwd_bl, bwd_bh=bwd_bh,
        n_items=jnp.minimum(n_items, w).reshape(1),
        tile_has_work=tile_has_work,
        blk_has_work=nch_b > 0,
        max_dups=jnp.max(cnt),
        n_rows=n_rows,
        overflowed=dup_overflow | row_overflow | (n_items > w),
    )


@jax.custom_vjp
def dup_gather(table, full_perm):
    """Rows `table[full_perm]` (with DUPLICATES) into the padded layout.

    Backward: scatter-ADD of the padded-row cotangents back to the original
    rows — each duplicate accumulates its tile's contribution. Padding slots
    alias row 0 but carry exactly-zero cotangents (the kernel masks all
    gradient components by the membership word, and padding rows have
    word 0), so the unconditional add is exact.
    """
    return table[full_perm]


def _dup_gather_fwd(table, full_perm):
    return table[full_perm], (full_perm, table.shape[0])


def _dup_gather_bwd(res, g):
    full_perm, n = res
    return jnp.zeros((n,) + g.shape[1:], g.dtype).at[full_perm].add(g), None


dup_gather.defvjp(_dup_gather_fwd, _dup_gather_bwd)


def tune_dsort_spec(
    scene,
    camera_positions,
    box_points,
    num_sampling_points: int,
    start: int,
    end: int,
    c: float,
    delta_t: float,
    base: RSortSpec = RSortSpec(t_theta=4, t_phi=4),
    headroom: float = 1.25,
    scaling_modifier: float = 1.0,
) -> RSortSpec:
    """Fit d_max / dup_rows / w_max to a scene by measuring the cull once."""
    import numpy as np

    from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

    g = scene.capacity
    probe = base._replace(
        d_max=max(base.d_max, 16), dup_rows=0, w_max=1,
    )
    # Probe with unbounded w_max: compute n_items from the cull result.
    t_ang = pl.cdiv(num_sampling_points, base.t_theta) * pl.cdiv(
        num_sampling_points, base.t_phi
    )
    n_ch = pl.cdiv(end - start, base.t_chunk)
    kb = _padded_rows(g, probe, t_ang) // base.g_tile
    probe = probe._replace(w_max=max(kb * n_ch, 1))
    def measure(pr):
        mi, md, mr = 1, 1, 1
        for cam in np.asarray(camera_positions).reshape(-1, 3):
            grid = shell_grid(
                jnp.asarray(cam), box_points, num_sampling_points, start, end,
                c, delta_t,
            )
            t = dsort_cull(
                scene.means, scene.scales, scene.alive, jnp.asarray(cam),
                grid.theta, grid.phi, grid.r, pr, scaling_modifier,
            )
            mi = max(mi, int(t.n_items[0]))
            md = max(md, int(t.max_dups))
            mr = max(mr, int(t.n_rows))
        return mi, md, mr

    max_items, max_dups, max_rows = measure(probe)
    if max_dups > probe.d_max:
        # The probe cap truncated the duplicate enumeration, so n_rows (and
        # n_items) were measured under truncation; max_dups itself is exact
        # (counted pre-cap). Re-probe once at the true maximum so dup_rows
        # is sized to the real row count, not the truncated one.
        probe = probe._replace(d_max=max_dups, dup_rows=0, w_max=1)
        kb2 = _padded_rows(g, probe, t_ang) // base.g_tile
        probe = probe._replace(w_max=max(kb2 * n_ch, 1))
        max_items, max_dups, max_rows = measure(probe)

    return base._replace(
        d_max=max_dups + max(2, max_dups // 4),
        dup_rows=int(max_rows * headroom) + base.g_tile,
        w_max=int(max_items * headroom) + 8,
    )


def dsort_gaussian_field(
    gfeat,  # (G, 10)
    channel_weights,  # (G, C)
    points,  # (num_r, ns, ns, 3)
    tiles: DSortTiles,
    spec: RSortSpec,
    interpret: Optional[bool] = None,
):
    """Duplicated-layout field evaluation: (num_r, ns, ns, C) + overflow.

    Reuses the rsort kernels unchanged: tile-pure blocks carry an all-ones
    membership word, so the kernel's bit extraction degenerates to the
    slot-validity mask."""
    num_r, ns = points.shape[0], points.shape[1]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)
    t_ang = n_tt * n_pt

    tp_spec = TileSpec(
        t_theta=spec.t_theta, t_phi=spec.t_phi, t_r=spec.t_chunk
    )
    xfeat, centers = tile_points_centered(
        points, ns, num_r, tp_spec, n_tt, n_pt, n_ch
    )

    gw = jnp.concatenate([gfeat, channel_weights], axis=1)
    gw_pad = dup_gather(gw, tiles.full_perm)
    patterns = jax.lax.stop_gradient(tiles.words.astype(jnp.float32))
    table = jnp.concatenate([gw_pad, patterns], axis=1)
    n_words = tiles.words.shape[1]
    kb = table.shape[0] // spec.g_tile
    table3 = table.reshape(kb, spec.g_tile, table.shape[-1])

    # Pre-duplicated [hi; hi; lo] slab, samples on LANES (the rsort
    # kernels' transposed-slab contract; see fused_rsort.xfeat_slab).
    xfeat_hl = xfeat_slab(xfeat)

    out = rsort_field(
        xfeat_hl, centers, table3,
        tiles.fwd_t, tiles.fwd_j, tiles.fwd_b, tiles.fwd_first,
        tiles.fwd_bl, tiles.fwd_bh,
        tiles.bwd_t, tiles.bwd_j, tiles.bwd_b, tiles.bwd_first,
        tiles.bwd_bl, tiles.bwd_bh,
        tiles.n_items, tiles.tile_has_work, tiles.blk_has_work,
        # dup_gather's backward scatter-adds EVERY padded row: uninitialized
        # dead-block gradient rows must be zeroed (see RSortSpec).
        spec._replace(mask_dead_blocks=True),
        (n_tt, n_pt, n_ch, n_words, 0), interpret,
    )
    field = untile_field_t(out, ns, num_r, tp_spec, n_tt, n_pt, n_ch)
    return field, tiles.overflowed
