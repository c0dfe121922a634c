"""Group-sorted, work-list-scheduled fused renderer (pallas backend v4,
'rsort').

The v3 design (global d-presort + per-tile top_k lists) spent 8.3 ms/step of
its 25.7 ms at 100k Gaussians moving rows: a 2.1 ms per-tile table gather
forward and a 6.2 ms scatter-add of per-tile-list gradients back to the
population. v4 removes BOTH by making the per-tile work blocks index straight
into ONE global table (this file replaces the reference's per-ray CUDA
pipeline `submodules/cuda-renderer/cuda/volume_renderer.cu:16-185` +
`ray_aabb.cu:10-61`; behavioral provenance only):

  1. **(pattern, d) sort.** Each Gaussian's angular-tile membership is a
     T_ang-bit pattern (a rectangle of tiles — its theta/phi footprint is an
     interval on each axis, so there are few distinct patterns in practice).
     The population is sorted ONCE by (pattern, camera distance). Members of
     any tile then form a handful of contiguous, d-sorted runs of the global
     order — per-tile lists stop existing as data.
  2. **Block-aligned groups.** Each pattern group is padded to a multiple of
     `g_tile`, so every Gaussian block is pattern-pure and d-contiguous:
     its radial footprint for a tile is the exact interval union
     [min(d_i - rho_i), max(d_i + rho_i)] over members — strictly tighter
     than v3's per-tile rho_max inflation (one fat Gaussian no longer bloats
     every chunk range of a dense tile). Groups beyond `max_groups` are
     merged — merged blocks are impure but still CORRECT (membership bits
     and intervals are exact per block); they just schedule more work items.
  3. **Work-list scheduling** (unchanged from v3): surviving
     (tile, chunk, block) triples drive a 1-D Pallas grid via scalar
     prefetch. The forward list is sorted by output tile (consecutive output
     revisits, elided sample-block DMAs); the backward list is sorted by
     GLOBAL Gaussian block — so the backward kernel accumulates gradients
     directly into global-layout blocks. The gradient "scatter-back" is now
     one cheap inverse-permutation gather.

Per-Gaussian tile membership rides into the kernel as ONE packed
footprint-RECTANGLE word (an extra float32 table column): a Gaussian's
angular footprint is an interval on each tile axis (`angular_footprints`),
so its membership pattern is always a rectangle [th_lo, th_hi] x
[ph_lo, ph_hi] of the tile grid. The word packs
[valid | th_lo | th_hi | ph_lo | ph_hi] into <= 23 bits (f32-exact for the
kernel's scaled-floor field extraction, see `_rect_bits`), which keeps the
cull a SINGLE packed-key sort and the table one pattern column at ANY tile
geometry — a 64-tile 4x4 grid costs the same sort as the 8-tile 8x16 grid,
where a membership *bitmap* would need 6 words and a 7-key sort. Padding
slots and dead Gaussians carry word 0 (valid bit 0), so slot-validity
masking comes free from the same decode.

The kernels evaluate the Mahalanobis quadratic form **centered at each
tile's sample centroid** so the MXU contraction runs in bf16 with an
x3-style hi/lo split — one MXU pass instead of six f32-HIGHEST passes (the
uncentered form needs ~15 more mantissa bits than bf16x3 carries; centering
shrinks the cancellation ratio from ~3e4 to ~3e3, and the hi/hi + hi/lo +
lo/hi split rides along K=30 <= 128 inside the SAME padded pass for free).

Block-rounding only ever ADDS sub-cutoff Gaussians (their pdf at the chunk's
samples is below the sigma_cull tail) — never drops one, so the result is a
(slightly more accurate) superset of the dense path's per-shell sum.
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
    tile_points_centered,
    untile_field_t,
)

def _rect_bits(n_tt: int, n_pt: int) -> Tuple[int, int, int]:
    """Static bit widths (b_t, b_p, total) of the packed rectangle word.

    Layout (MSB first): [valid(1) | th_lo(b_t) | th_hi(b_t) | ph_lo(b_p) |
    ph_hi(b_p)]. The kernel decodes fields with floor(word * 2^-k) float
    arithmetic, exact while the word value stays below 2^24 (an integer
    scaled by a power of two keeps its own mantissa; 24-bit words are NOT
    safe — (2^24-1) * 2^-15 lies exactly halfway between two f32 values and
    ties-to-even flips the top field — so `rsort_cull` asserts total <= 23).
    """
    b_t = max(int(n_tt - 1).bit_length(), 1)
    b_p = max(int(n_pt - 1).bit_length(), 1)
    return b_t, b_p, 1 + 2 * b_t + 2 * b_p


def _full_rect_word(n_tt: int, n_pt: int) -> int:
    """Word claiming membership of EVERY tile (dsort's duplicated rows)."""
    b_t, b_p, _ = _rect_bits(n_tt, n_pt)
    w = 1
    w = (w << b_t) | 0
    w = (w << b_t) | (n_tt - 1)
    w = (w << b_p) | 0
    w = (w << b_p) | (n_pt - 1)
    return w


def decode_rect_members(words, n_tt: int, n_pt: int):
    """(R,) int32 rect words -> (R, n_tt*n_pt) bool membership (cull/tests)."""
    b_t, b_p, _ = _rect_bits(n_tt, n_pt)
    v = jnp.asarray(words, jnp.int32).reshape(-1)
    ph_hi = v & ((1 << b_p) - 1)
    v1 = v >> b_p
    ph_lo = v1 & ((1 << b_p) - 1)
    v2 = v1 >> b_p
    th_hi = v2 & ((1 << b_t) - 1)
    v3 = v2 >> b_t
    th_lo = v3 & ((1 << b_t) - 1)
    valid = (v3 >> b_t) > 0
    t = jnp.arange(n_tt * n_pt, dtype=jnp.int32)
    tt, pt = t // n_pt, t % n_pt
    return (
        valid[:, None]
        & (tt[None, :] >= th_lo[:, None]) & (tt[None, :] <= th_hi[:, None])
        & (pt[None, :] >= ph_lo[:, None]) & (pt[None, :] <= ph_hi[:, None])
    )


class RSortSpec(NamedTuple):
    """Static configuration of the rsort renderer."""

    t_theta: int = 8
    t_phi: int = 16
    t_chunk: int = 8  # radial bins per chunk
    g_tile: int = 256
    w_max: int = 4096  # work-list capacity: (tile, chunk, block) triples
    max_groups: int = 64  # pattern-group capacity (excess groups merge)
    sigma_cull: float = 3.0
    margin: float = 1.1
    # Radial gate granularity (bins): the kernels skip whole gate_bins-sized
    # sub-chunks outside the item's exact bin range [bl, bh] (predicated
    # pl.when — no DMA or layout change). Must divide t_chunk. Trained-scene
    # blocks span ~10 of 32 bins, so gating removes most of the per-pair
    # exp/MXU work the chunk-level schedule over-covers.
    gate_bins: int = 4
    # Backward-kernel precision: True runs the Z = p^T @ (go*x) contraction
    # with single-pass bf16 operands (~4e-3 relative on gradients — inside
    # SGD noise) instead of hi/lo splits. Forward output is unaffected.
    bwd_p_bf16: bool = False
    # Evaluate the backward kernel's exp on a bf16 argument (requires
    # bwd_p_bf16; the result feeds the bf16 dot directly). Quantizing m to
    # bf16 costs up to |m| * 2^-9 relative on p — large only deep in the
    # tail where p itself is negligible; measured gradient error stays in
    # the documented bwd_p_bf16 band. Forward exp always rides f32 (the
    # histogram exactness gate).
    bwd_exp_bf16: bool = False
    # Forward-kernel precision: True accumulates the per-channel field with
    # a single bf16 MXU pass over p instead of the per-channel VPU
    # mul+reduce. Per-term bf16 error (~4e-3) averages down over the K-sized
    # Gaussian sum: measured ~2e-4 relative on histograms (vs ~5e-5 exact).
    fwd_p_bf16: bool = False
    # Duplicated-layout (dsort) capacities: max tile duplicates per Gaussian
    # and the padded-table row capacity (0 = worst case G * d_max).
    d_max: int = 8
    dup_rows: int = 0
    # Zero the backward kernel's never-visited (uninitialized) dtable blocks
    # with a post-kernel `where` (~0.4 ms at 100k). The rsort/pad_gather
    # backward never reads those rows — every step-valid Gaussian's block
    # provably has >= 1 work item (its in-window radial interval bounds the
    # block's union, see rsort_cull) and culled rows gather the OOB zero
    # fill — so the flagship path skips the mask. The dsort backward
    # (dup_gather scatter-add) reads EVERY row and must set this.
    mask_dead_blocks: bool = False
    # Build the flat work lists with the serial Pallas kernel
    # (`_ws_build_kernel`) instead of the XLA prefix-sum/argsort chain. The
    # XLA chain's ~15 tiny W-sized ops each land in scalar memory and cost
    # ~0.1 ms of scalar-core time apiece (~1.2 ms/step at 100k — the bulk
    # of the r3 trace's non-kernel tail); the kernel does the same
    # compaction in one dispatch of ~2*KB*T_ang scalar-loop iterations.
    ws_pallas: bool = True


class RSortTiles(NamedTuple):
    """Cull result: a block-aligned (pattern, d)-sorted global layout plus
    flat work lists. All-array pytree (jit-safe)."""

    full_perm: jax.Array  # (G_pad,) int32 padded slot -> original row
    inv_perm: jax.Array  # (G,) int32 original row -> padded slot (G_pad = culled)
    words: jax.Array  # (G_pad, 1) int32 packed footprint-rectangle words
    counts: jax.Array  # (T_ang,) int32 per-tile member counts (diagnostics)
    # Flat work list, forward order (sorted by tile, chunk, block):
    fwd_t: jax.Array  # (W,) int32 angular tile
    fwd_j: jax.Array  # (W,) int32 radial chunk
    fwd_b: jax.Array  # (W,) int32 GLOBAL gaussian block
    fwd_first: jax.Array  # (W,) 1 when this item starts a new output tile
    # Per-item active bin range WITHIN the chunk [bl, bh] (inclusive): the
    # block's exact radial interval maps to a bin sub-range; samples outside
    # it are beyond every member's cull sphere (same cutoff guarantee as
    # chunk-level skipping), so the kernels skip those bins entirely.
    fwd_bl: jax.Array  # (W,) int32 in [0, t_chunk)
    fwd_bh: jax.Array  # (W,) int32 in [0, t_chunk)
    # Same items, backward order (sorted by block, tile, chunk):
    bwd_t: jax.Array  # (W,) int32
    bwd_j: jax.Array  # (W,) int32
    bwd_b: jax.Array  # (W,) int32
    bwd_first: jax.Array  # (W,) 1 when this item starts a new global block
    bwd_bl: jax.Array  # (W,) int32
    bwd_bh: jax.Array  # (W,) int32
    n_items: jax.Array  # (1,) int32 valid work items
    tile_has_work: jax.Array  # (T_ang, n_ch) bool
    blk_has_work: jax.Array  # (KB,) bool
    n_groups: jax.Array  # () int32 observed pattern groups (diagnostics)
    overflowed: jax.Array  # () bool — work list truncated
    # Padded differentiable kernel table (G_pad, FDIM+C+1+3) when the cull
    # was given `gw` (see rsort_cull wide-gather path); None otherwise.
    table: Optional[jax.Array] = None


def _padded_rows(g: int, spec: RSortSpec) -> int:
    """Static padded population: every pattern group block-aligns, so the
    worst case is the exact row count plus one partial block per group."""
    return pl.cdiv(g, spec.g_tile) * spec.g_tile + spec.max_groups * spec.g_tile


def angular_footprints(
    means, scales, alive, cam, theta, phi, r, spec: RSortSpec,
    scaling_modifier: float = 1.0,
):
    """Per-Gaussian (d, radius, m_th, m_ph, in_window) footprint geometry.

    m_th (G, n_tt) / m_ph (G, n_pt) mark which theta/phi tile rows the
    Gaussian's 3-sigma cull sphere can touch (CONTIGUOUS interval per axis —
    degenerate footprints mark the whole axis). Shared by the pattern-sorted
    (rsort) and duplicated-layout (dsort) culls.
    """
    ns = theta.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)

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
    return d, radius, m_th, m_ph, in_window


class RSortLayout(NamedTuple):
    """Frozen sorted block layout: the expensive half of the cull (packed-key
    sort + padded-layout scatter + inverse permutation, ~2.4 ms/step at 100k)
    split out so it can be computed ONCE per scan chunk and reused.

    Correctness never depends on layout freshness: `rsort_cull` recomputes
    the per-Gaussian rect words and per-block interval unions exactly for
    the actual scan point every step, so a layout built from a REFERENCE
    camera (or from slightly stale parameters) only loosens scheduling
    tightness (more work items — capacity-tuned and overflow-flagged as
    always). The one hazard — a Gaussian the layout culled entirely
    becoming visible for the actual camera — is (a) prevented by building
    the layout with `slack` >= the max distance from the reference camera
    to any scan point plus a parameter-drift allowance, and (b) DETECTED:
    `rsort_cull` raises the overflow flag when any step-valid Gaussian has
    no layout slot, which re-tunes and rebuilds through the normal `fit()`
    overflow machinery.
    """

    perm: jax.Array  # (G,) int32 sorted position -> original row
    src: jax.Array  # (G_pad,) int32 padded slot -> SORTED position; G = padding sentinel
    inv_perm: jax.Array  # (G,) int32 original row -> padded slot (G_pad = culled)
    n_groups: jax.Array  # () int32 observed pattern groups (diagnostics/tuning)


def _cull_geometry(
    means, scales, alive, cam, theta, phi, r, spec: RSortSpec,
    scaling_modifier: float = 1.0, slack: float = 0.0,
):
    """Per-Gaussian cull geometry for one camera: (d, radius, word, valid_g,
    counts). `word` is the packed <=23-bit footprint-rectangle word (0 when
    invalid); `slack` widens the radial in-window test by a distance margin
    (used by `rsort_layout` to stay conservative across the scan aperture).
    """
    ns = theta.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    t_ang = n_tt * n_pt
    g = means.shape[0]

    d, radius, m_th, m_ph, in_window = angular_footprints(
        means, scales, alive, cam, theta, phi, r, spec, scaling_modifier
    )
    if slack:
        in_window = (
            (d - radius - slack <= r[-1])
            & (d + radius + slack >= r[0])
            & (radius >= 0.0)
        )
    mask = (
        m_th[:, :, None] & m_ph[:, None, :] & in_window[:, None, None]
    ).reshape(g, t_ang)
    counts = jnp.sum(mask.astype(jnp.int32), axis=0)  # (T_ang,) diagnostics

    # Pack the footprint RECTANGLE (interval x interval — m_th/m_ph are
    # contiguous by construction) into one <=23-bit word: single-key sort
    # and a one-column table at any tile geometry (see module docstring).
    b_t, b_p, b_total = _rect_bits(n_tt, n_pt)
    if b_total > 23:
        raise ValueError(
            f"rect word needs {b_total} bits (> 23): the f32 scaled-floor "
            f"decode loses exactness at this tile grid ({n_tt}x{n_pt})"
        )
    idx_t = jnp.arange(n_tt, dtype=jnp.int32)
    idx_p = jnp.arange(n_pt, dtype=jnp.int32)
    th_lo_i = jnp.min(jnp.where(m_th, idx_t[None, :], n_tt), axis=1)
    th_hi_i = jnp.max(jnp.where(m_th, idx_t[None, :], -1), axis=1)
    ph_lo_i = jnp.min(jnp.where(m_ph, idx_p[None, :], n_pt), axis=1)
    ph_hi_i = jnp.max(jnp.where(m_ph, idx_p[None, :], -1), axis=1)
    valid_g = (th_hi_i >= th_lo_i) & (ph_hi_i >= ph_lo_i) & in_window
    # Clamp before composing: empty-interval sentinels (n_tt / -1) would
    # bleed into neighboring bit fields; the word is discarded via valid_g
    # either way, but keep every lane's arithmetic in-range.
    tl = jnp.clip(th_lo_i, 0, n_tt - 1)
    th = jnp.clip(th_hi_i, 0, n_tt - 1)
    pll = jnp.clip(ph_lo_i, 0, n_pt - 1)
    phh = jnp.clip(ph_hi_i, 0, n_pt - 1)
    word = (
        ((((jnp.int32(1) << b_t) | tl) << b_t | th) << b_p | pll) << b_p
    ) | phh
    word = jnp.where(valid_g, word, 0)  # (G,)
    return d, radius, word, valid_g, counts


def rsort_layout(
    means, scales, alive, cam, theta, phi, r, spec: RSortSpec,
    scaling_modifier: float = 1.0, slack: float = 0.0,
) -> RSortLayout:
    """Build the frozen sorted block layout from a reference camera.

    `slack` (distance units) must cover the largest distance from `cam` to
    any scan point the layout will serve, plus an allowance for parameter
    drift between layout refreshes (positions move ~um/step under Adam) —
    it widens only the radial validity window, so over-estimating costs
    nothing but a few extra layout rows.
    """
    ns = theta.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    g = means.shape[0]
    if _padded_rows(g, spec) >= (1 << 24):
        # start_row below rides a one-hot f32 matmul, exact only while every
        # padded row start fits in f32's 24-bit mantissa. Populations that
        # large need an int32 gather fallback — fail loudly, never corrupt
        # the sorted layout silently.
        raise ValueError(
            f"rsort padded rows {_padded_rows(g, spec)} >= 2^24: the f32 "
            "one-hot start_row gather would lose exactness; shrink "
            "max_groups/g_tile or add an int32 gather path"
        )
    d, _, word, valid_g, _ = _cull_geometry(
        means, scales, alive, cam, theta, phi, r, spec, scaling_modifier,
        slack,
    )
    return _layout_from_geometry(
        d, word, valid_g, g, n_tt, n_pt, spec, d_hi=r[-1]
    )


def _layout_from_geometry(
    d, word, valid_g, g: int, n_tt: int, n_pt: int, spec: RSortSpec,
    d_hi=1.0,
) -> RSortLayout:
    _, _, b_total = _rect_bits(n_tt, n_pt)
    words = word[:, None]
    # --- (pattern, d) sort; empty patterns (dead / out of window) last ------
    # Single packed int32 key: (rect word | compact sentinel 1<<b_total) in
    # the high bits, quantized d in the low bits. d is ONLY a sort key here
    # (it tightens per-block radial intervals; correctness never depends on
    # its resolution — >= 6 bits over the d range is still mm-scale at scene
    # scale, below sigma). One sort operand: ~2x cheaper than key+d at 100k.
    empty = ~valid_g
    dq_bits = min(max(30 - (b_total + 1), 6), 16)
    # STATIC quantization range [0, d_hi]: d is only a sort key (block
    # tightness, never correctness), so the old min/max-of-d reduce — a
    # 100k-row pass plus a scalar->vector sync point — buys nothing over a
    # fixed range. Rows with d > d_hi clip to the top code: they merely
    # lose sort locality within their pattern group (a center past r[-1]
    # can still have d - radius inside the window, so such rows stay
    # valid and are rendered exactly — only their block's radial interval
    # is looser).
    d_span = jnp.maximum(d_hi, 1e-6)
    dq = jnp.clip(
        (d / d_span * ((1 << dq_bits) - 1)).astype(jnp.int32),
        0, (1 << dq_bits) - 1,
    )
    key_c = jnp.where(empty, jnp.int32(1) << b_total, words[:, 0])
    packed = key_c * (1 << dq_bits) + dq
    sorted_ops = jax.lax.sort(
        (packed, jnp.arange(g, dtype=jnp.int32)), num_keys=1
    )
    perm = sorted_ops[-1]
    key_s = sorted_ops[0] // (1 << dq_bits)
    valid_s = key_s < (jnp.int32(1) << b_total)
    words_s = jnp.where(valid_s, key_s, 0)[:, None]  # (G, 1)

    # --- block-aligned group layout -----------------------------------------
    iota = jnp.arange(g, dtype=jnp.int32)
    change = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            jnp.any(words_s[1:] != words_s[:-1], axis=1),
        ]
    )
    raw_gid = jnp.cumsum(change.astype(jnp.int32))
    n_groups = jnp.max(jnp.where(valid_s, raw_gid, -1)) + 1
    gid = jnp.minimum(raw_gid, spec.max_groups - 1)
    # Position within the (possibly merged) effective group.
    eff_change = jnp.concatenate(
        [jnp.zeros((1,), bool), gid[1:] != gid[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(eff_change, iota, 0)
    )
    pos = iota - seg_start
    # Per-group valid counts WITHOUT a segment_sum (whose scatter costs
    # ~0.9 ms at 100k): gid is ascending, so counts are searchsorted deltas,
    # clipped to the valid prefix.
    n_valid = jnp.sum(valid_s.astype(jnp.int32))
    group_ids = jnp.arange(spec.max_groups, dtype=jnp.int32)
    right = jnp.minimum(
        jnp.searchsorted(gid, group_ids, side="right"), n_valid
    )
    left = jnp.minimum(
        jnp.searchsorted(gid, group_ids, side="left"), n_valid
    )
    cnt_g = (right - left).astype(jnp.int32)
    padded_g = pl.cdiv(cnt_g, spec.g_tile) * spec.g_tile
    start_g = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_g)[:-1]]
    )

    g_pad = _padded_rows(g, spec)
    # start_g[gid] as a one-hot f32 matmul: a row-bound table gather costs
    # ~0.7 ms at 100k, the MXU pass is ~none. Starts are < 2^24: f32-exact.
    onehot = (gid[:, None] == group_ids[None, :]).astype(jnp.float32)
    start_row = jax.lax.dot_general(
        onehot, start_g.astype(jnp.float32), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    dest = jnp.where(valid_s, start_row + pos, g_pad)
    # Closed-form padded-slot -> SORTED-row map (no scatter): every padded
    # block belongs to exactly one effective group (groups are g_tile-
    # padded), so per block b the group is the last k with start_g[k] <=
    # b*g_tile, and the block's rows are the contiguous sorted run starting
    # at left[k] + (b*g_tile - start_g[k]) with cnt_g[k] valid rows in the
    # group. The per-block (start, left, cnt) selection rides ONE tiny
    # (KB, max_groups) stair matmul against the group tables' first
    # differences (telescoping: a prefix-of-ones row dotted with diffs
    # yields the value at the last covered k). All quantities are integers
    # with partial sums in [-G, G_pad] < 2^24: f32-exact in any summation
    # order. (The earlier searchsorted-based closed form measured +4.6 ms —
    # it serialized against the sort; the stair matmul does not. A
    # full_perm scatter here measured 0.585 ms/step at 100k.)
    kb = g_pad // spec.g_tile
    blk_start = jnp.arange(kb, dtype=jnp.int32) * spec.g_tile
    stair = (start_g[None, :] <= blk_start[:, None]).astype(jnp.float32)
    gtab = jnp.stack([start_g, left, cnt_g], axis=1).astype(jnp.float32)
    diffs = jnp.diff(gtab, axis=0, prepend=jnp.zeros((1, 3), jnp.float32))
    sel = jax.lax.dot_general(
        stair, diffs, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)  # (KB, 3) = (start_g, left, cnt_g) at each block
    off_bt = (
        blk_start[:, None]
        + jnp.arange(spec.g_tile, dtype=jnp.int32)[None, :]
        - sel[:, 0:1]
    )
    src_raw = sel[:, 1:2] + off_bt
    # Padding slots get the sentinel G: OOB in sorted-row space, so the
    # composed gathers fill zeros / row index 0 (word 0 gates the kernel).
    src = jnp.where(off_bt < sel[:, 2:3], src_raw, g).reshape(g_pad)
    # Culled rows map to the sentinel slot g_pad (a zero gradient row).
    # Permutation inversion BY SORT, not scatter: sorting (perm, dest) by
    # perm yields dest in original-row order. A (int32, int32) sort at 100k
    # rows costs ~0.11 ms on this XLA build while the unique-indices
    # scatter it replaces measured 0.586 ms/step (the single biggest
    # non-kernel item in the r3 trace).
    inv_perm = jax.lax.sort(
        (perm, jnp.where(valid_s, dest, g_pad)), num_keys=1
    )[1]
    return RSortLayout(
        perm=perm, src=src, inv_perm=inv_perm, n_groups=n_groups
    )


def _ws_build_kernel(
    w1, w2, bt, bj, bb, bfir, bbl, bbh, ft, fj, fb, ffir, fbl, fbh,
    nraw, tile_w, blk_w, bcnt, bstart,
    *, kb, t_ang, n_ch, t_chunk, w, ba, bj_bits,
):
    """Serial work-list compaction on the TPU scalar core.

    Inputs are (KB*T_ang,) int32 PACKED words per (block, tile) pair,
    b-major — packed so the per-pair decode is shifts/masks only (an
    integer division per pair measurably slows the scalar loop):
      w1 = abs_lo << ba | (abs_hi + 1)     (absolute active-bin range)
      w2 = j_lo << bj_bits | (j_hi + 1)    (chunk range; empty: 1 << bj_bits)
    Empty pairs give j_lo >= j_hi + 1, so the chunk loop below runs zero
    iterations. Emits BOTH list orders in one pass: the backward list
    directly (the pair loop IS block-major order) and the forward
    (tile, chunk, block)-sorted list via a stable counting sort into
    per-(tile, chunk) buckets — ~2*KB*T_ang + 2W scalar iterations total,
    replacing the XLA scatter/scan/argsort chain. Slots past the item count
    are left uninitialized: every consumer clamps its work index to
    n_items - 1 (see `ie` in the kernel index maps), and parity tests
    compare only the valid prefix.
    """
    nq = t_ang * n_ch

    def zq(i, c):
        tile_w[i] = 0
        bcnt[i] = 0
        return c

    jax.lax.fori_loop(0, nq, zq, 0)

    def zb(i, c):
        blk_w[i] = 0
        return c

    jax.lax.fori_loop(0, kb, zb, 0)

    def pair_body(i, carry):
        # (b, t) ride the carry (increment + wrap): no per-pair division.
        cnt0, last_b0, b, t = carry
        v2 = w2[i]
        jl = v2 >> bj_bits
        jh1 = v2 & ((1 << bj_bits) - 1)
        v1 = w1[i]
        a_lo = v1 >> ba
        a_hi = (v1 & ((1 << ba) - 1)) - 1

        def j_body(j, c):
            cnt, last_b = c

            @pl.when(cnt < w)
            def _():
                bt[cnt] = t
                bj[cnt] = j
                bb[cnt] = b
                bfir[cnt] = jnp.where(b != last_b, 1, 0).astype(jnp.int32)
                base = j * t_chunk
                bbl[cnt] = jnp.clip(a_lo - base, 0, t_chunk - 1)
                bbh[cnt] = jnp.clip(a_hi - base, 0, t_chunk - 1)
                q = t * n_ch + j
                tile_w[q] = 1
                blk_w[b] = 1
                bcnt[q] = bcnt[q] + 1

            return (cnt + 1, b)

        cnt1, last_b1 = jax.lax.fori_loop(jl, jh1, j_body, (cnt0, last_b0))
        t1 = t + 1
        wrap = t1 == t_ang
        return (
            cnt1, last_b1,
            jnp.where(wrap, b + 1, b), jnp.where(wrap, 0, t1),
        )

    cnt, _, _, _ = jax.lax.fori_loop(
        0, kb * t_ang, pair_body,
        (jnp.int32(0), jnp.int32(-1), jnp.int32(0), jnp.int32(0)),
    )
    nraw[0] = cnt

    # Bucket prefix sum: fwd buckets q = t*n_ch + j ascend exactly in the
    # forward sort-key order (t, j). bcnt becomes the placement cursor.
    def prefix(q, acc):
        c = bcnt[q]
        bstart[q] = acc
        bcnt[q] = acc
        return acc + c

    jax.lax.fori_loop(0, nq, prefix, jnp.int32(0))

    # Stable placement: items arrive in block-major order, so each bucket
    # fills with ascending b — matching the XLA argsort's (t, j, b) key.
    def place(i, c):
        t = bt[i]
        q = t * n_ch + bj[i]
        dest = bcnt[q]
        bcnt[q] = dest + 1
        ft[dest] = t
        fj[dest] = bj[i]
        fb[dest] = bb[i]
        fbl[dest] = bbl[i]
        fbh[dest] = bbh[i]
        ffir[dest] = jnp.where(dest == bstart[q], 1, 0).astype(jnp.int32)
        return c

    jax.lax.fori_loop(0, jnp.minimum(cnt, w), place, 0)


def _cull_reduce_kernel(
    rdr_ref, words_ref, lo_ref, hi_ref, w1_ref, w2_ref,
    *, n_tt, n_pt, t_chunk, n_ch, ba, bj_bits,
):
    """Vector phase of the cull finalize: per-(block, tile) radial interval
    unions -> packed builder words, one grid step.

    Inputs are (KB, g_tile) f32 block-major views of the padded geometry
    columns (free bitcast reshapes). For each of the t_ang static tiles:
    decode the rect words, mask the member rows, min/max-reduce the
    interval ends over the block, convert to absolute active-bin ranges,
    and pack the (w1, w2) shift words `_ws_build_kernel` consumes. This
    replaces the XLA where/min/max/ceil/select chain (~0.5 ms of
    100k-row streaming fusions per step) with ~40 vector ops on
    (KB, g_tile) arrays."""
    r0 = rdr_ref[0]
    dr = rdr_ref[1]
    b_t, b_p, _ = _rect_bits(n_tt, n_pt)
    v = words_ref[:]  # (KB, G_T) f32 packed rect words (<= 23 bits, exact)
    q1 = jnp.floor(v * (2.0 ** -b_p))
    ph_hi = v - q1 * (1 << b_p)
    q2 = jnp.floor(q1 * (2.0 ** -b_p))
    ph_lo = q1 - q2 * (1 << b_p)
    q3 = jnp.floor(q2 * (2.0 ** -b_t))
    th_hi = q2 - q3 * (1 << b_t)
    valid = jnp.floor(q3 * (2.0 ** -b_t))
    th_lo = q3 - valid * (1 << b_t)
    ok = valid > 0.0
    lo = lo_ref[:]
    hi = hi_ref[:]
    total_bins = n_ch * t_chunk
    for t in range(n_tt * n_pt):
        tt = float(t // n_pt)
        pt = float(t % n_pt)
        inside = (
            ok & (tt >= th_lo) & (tt <= th_hi)
            & (pt >= ph_lo) & (pt <= ph_hi)
        )
        blk_lo = jnp.min(
            jnp.where(inside, lo, jnp.inf), axis=1, keepdims=True
        )  # (KB, 1)
        blk_hi = jnp.max(
            jnp.where(inside, hi, -jnp.inf), axis=1, keepdims=True
        )
        raw_lo = jnp.ceil((blk_lo - r0) / dr - 0.5 - 1e-4)
        raw_hi = jnp.floor((blk_hi - r0) / dr + 0.5 + 1e-4)
        vp = (
            (blk_lo <= blk_hi) & (raw_hi >= 0)
            & (raw_lo <= total_bins - 1)
        )
        al = jnp.clip(raw_lo, 0, total_bins - 1).astype(jnp.int32)
        ah = jnp.clip(raw_hi, 0, total_bins - 1).astype(jnp.int32)
        w1_ref[:, t:t + 1] = jnp.where(vp, (al << ba) | (ah + 1), 0)
        w2_ref[:, t:t + 1] = jnp.where(
            vp,
            ((al // t_chunk) << bj_bits) | (ah // t_chunk + 1),
            jnp.int32(1 << bj_bits),
        )


def _ws_pack_fits(n_ch: int, t_chunk: int) -> bool:
    """True when the Pallas builder's packed words fit in int32.

    `_cull_reduce_kernel` packs (lo << ba | hi+1) absolute-bin ranges and
    (lo_chunk << bj | hi_chunk+1) chunk ranges into single int32 words; huge
    bin counts overflow the budget. Callers fall back to the XLA work-list
    construction instead of erroring (the two produce identical lists —
    parity-tested in tests/test_rsort.py).
    """
    total_bins = n_ch * t_chunk
    ba = int(total_bins).bit_length()
    bj_bits = int(n_ch).bit_length()
    return 2 * ba <= 31 and 2 * bj_bits <= 31


def _block_ranges_pallas(
    geom_pad, n_gw: int, kb: int, spec: RSortSpec, r,
    n_tt: int, n_pt: int, n_ch: int,
    interpret: Optional[bool] = None,
):
    """(G_pad, >=n_gw+3) padded rows -> packed (KB*T,) builder words."""
    interp = _interpret_default() if interpret is None else interpret
    total_bins = n_ch * spec.t_chunk
    ba = int(total_bins).bit_length()
    bj_bits = int(n_ch).bit_length()
    if not _ws_pack_fits(n_ch, spec.t_chunk):
        # Callers route around this via _ws_pack_fits; keep the guard so a
        # direct call can never silently corrupt the packed words.
        raise ValueError(f"bin count {total_bins} too large to pack")
    t_ang = n_tt * n_pt
    gt = spec.g_tile
    rdr = jnp.stack([r[0], r[1] - r[0]])
    words2 = geom_pad[:, n_gw].reshape(kb, gt)
    lo2 = geom_pad[:, n_gw + 1].reshape(kb, gt)
    hi2 = geom_pad[:, n_gw + 2].reshape(kb, gt)
    w1, w2 = pl.pallas_call(
        functools.partial(
            _cull_reduce_kernel, n_tt=n_tt, n_pt=n_pt,
            t_chunk=spec.t_chunk, n_ch=n_ch, ba=ba, bj_bits=bj_bits,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((kb, gt), lambda: (0, 0))] * 3,
        out_specs=[pl.BlockSpec((kb, t_ang), lambda: (0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((kb, t_ang), jnp.int32)] * 2,
        interpret=interp,
    )(rdr, words2, lo2, hi2)
    return w1.reshape(-1), w2.reshape(-1), ba, bj_bits


def _build_work_lists(
    w1, w2, ba: int, bj_bits: int, kb: int, t_ang: int, n_ch: int,
    spec: RSortSpec, interpret: Optional[bool] = None,
):
    """Pallas work-list construction: packed (KB*T,) range words ->
    RSortTiles lists.

    w1/w2 use the `_ws_build_kernel` packing (`_block_ranges_pallas`
    produces them in-kernel). Returns (bwd_t, bwd_j, bwd_b, bwd_first,
    bwd_bl, bwd_bh, fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl, fwd_bh, n_raw,
    tile_w, blk_w); n_raw is the UNCLIPPED item count (overflow = n_raw >
    w_max).
    """
    interp = _interpret_default() if interpret is None else interpret
    w = spec.w_max
    nq = t_ang * n_ch
    # The builder's outputs + scratch live in SMEM (~1 MB/core): 12 w-sized
    # lists + 3 nq-sized cursors + 2 nq scratch + kb counts. Fail at trace
    # time with an actionable message instead of an opaque compiler OOM
    # (hit by the first 50k run: t_chunk=8 x 310 bins x densified 100k
    # population -> w_max ~150k -> 7.18 MB requested).
    smem_bytes = 4 * (12 * w + 5 * nq + kb + 1)
    if not interp and smem_bytes > 900_000:
        raise ValueError(
            f"work-list builder needs ~{smem_bytes/1e6:.2f} MB of SMEM "
            f"(w_max={w}, {n_ch} radial chunks x {t_ang} tiles) but SMEM "
            "is ~1 MB. Use fewer, larger radial chunks — the single "
            "full-window t_chunk (RenderSettings.from_config default) "
            "keeps w_max at O(blocks x tiles)."
        )
    wi = jax.ShapeDtypeStruct((w,), jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _ws_build_kernel, kb=kb, t_ang=t_ang, n_ch=n_ch,
            t_chunk=spec.t_chunk, w=w, ba=ba, bj_bits=bj_bits,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 15,
        out_shape=[wi] * 12 + [
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((nq,), jnp.int32),
            jax.ShapeDtypeStruct((kb,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((nq,), jnp.int32),
            pltpu.SMEM((nq,), jnp.int32),
        ],
        interpret=interp,
    )(w1, w2)


def rsort_cull(
    means, scales, alive, cam, theta, phi, r, spec: RSortSpec,
    scaling_modifier: float = 1.0, layout: Optional[RSortLayout] = None,
    gw=None,
) -> RSortTiles:
    """Cull + schedule for one scan point. With `layout` (a frozen
    `rsort_layout`), the per-step work is gathers and dense reduces only —
    no sort, no scatter; words and block interval unions are still exact
    for THIS camera, so the render is exact regardless of layout staleness
    (see `RSortLayout`).

    With `gw` ((G, FDIM + C) differentiable forms|weights), the kernel
    table rides the SAME two chained row gathers as the cull geometry
    (`wide_pad_gather`): `tiles.table` then holds the padded
    [forms | weights | word | d-lo | d-hi | iota] rows ready for the
    kernels (which ignore the 3 trailing geometry columns), and
    `rsort_gaussian_field` skips its separate `pad_gather` + pattern
    concatenate + re-layout chain (~0.4 ms/step at 100k). Gather cost is
    row-count-bound, not width-bound, so widening the existing gather is
    nearly free."""
    ns = theta.shape[0]
    num_r = r.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)
    t_ang = n_tt * n_pt
    g = means.shape[0]
    g_pad = _padded_rows(g, spec)

    d, radius, word, valid_g, counts = _cull_geometry(
        means, scales, alive, cam, theta, phi, r, spec, scaling_modifier
    )
    if layout is None:
        layout = _layout_from_geometry(
            d, word, valid_g, g, n_tt, n_pt, spec, d_hi=r[-1]
        )
        inv_perm_step = layout.inv_perm
    else:
        # Frozen layouts can hold slots for rows the ACTUAL camera culls;
        # such slots may sit in blocks with no work this step, whose
        # backward rows are uninitialized (the dead-block mask is skipped —
        # see RSortSpec.mask_dead_blocks). Route step-culled rows to the
        # OOB zero fill so the pad_gather backward never reads them.
        inv_perm_step = jnp.where(valid_g, layout.inv_perm, g_pad)
    n_groups = layout.n_groups

    # --- per-step padded-layout values: TWO chained row gathers -------------
    # Rect word, both radial interval ends, AND the composed original-row
    # index (full_perm = perm o src, the iota column) ride row gathers
    # through the sort permutation then the closed-form block map (scalar
    # gathers in lane-major layout cost 0.7 ms EACH at 100k; row gathers
    # are ~0.2 ms; the full_perm scatter these replace was 0.585 ms). The
    # word and iota roundtrip f32 exactly (<= 23 / < 24 bits). Padding
    # slots (src sentinel G) take the OOB zero fill: word 0 gates them out
    # of the kernels, and full_perm 0 is harmless — the fetched row 0 data
    # is finite and its smask is 0 in every kernel.
    geom = jnp.stack(
        [
            word.astype(jnp.float32),
            d - radius,
            d + radius,
            jnp.arange(g, dtype=jnp.float32),
        ],
        axis=1,
    )
    if gw is None:
        n_gw = 0
        per_row = jnp.take(
            jnp.take(geom, layout.perm, axis=0), layout.src, axis=0,
            mode="fill", fill_value=0.0,
        )  # (g_pad, 4)
        table = None
    else:
        n_gw = gw.shape[1]
        per_row = wide_pad_gather(
            gw, geom, layout.perm, layout.src, inv_perm_step, n_gw
        )  # (g_pad, n_gw + 4)
        table = per_row
    geom_r = jax.lax.stop_gradient(per_row[:, n_gw:])
    full_perm = geom_r[:, 3].astype(jnp.int32)
    words_pad = geom_r[:, 0:1].astype(jnp.int32)
    # A step-valid Gaussian with no layout slot would be silently dropped —
    # flag it through the overflow channel (fit() re-tunes and rebuilds,
    # which refreshes the layout). Never fires when the layout is fresh.
    missed = jnp.any(valid_g & (layout.inv_perm >= g_pad))

    kb = g_pad // spec.g_tile
    if spec.ws_pallas and _ws_pack_fits(n_ch, spec.t_chunk):
        # Vector finalize kernel + serial builder: the per-(block, tile)
        # interval unions, bin-range conversion, and packing all happen in
        # `_cull_reduce_kernel`; XLA never materializes memb/blk_lo/blk_hi.
        w1, w2, ba, bjb = _block_ranges_pallas(
            geom_r, 0, kb, spec, r, n_tt, n_pt, n_ch
        )
        (bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl, bwd_bh,
         fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl, fwd_bh,
         n_raw, tile_w, blk_w) = _build_work_lists(
            w1, w2, ba, bjb, kb, t_ang, n_ch, spec,
        )
        return RSortTiles(
            full_perm=full_perm,
            inv_perm=inv_perm_step,
            words=words_pad,
            counts=counts,
            fwd_t=fwd_t, fwd_j=fwd_j, fwd_b=fwd_b, fwd_first=fwd_first,
            fwd_bl=fwd_bl, fwd_bh=fwd_bh,
            bwd_t=bwd_t, bwd_j=bwd_j, bwd_b=bwd_b, bwd_first=bwd_first,
            bwd_bl=bwd_bl, bwd_bh=bwd_bh,
            n_items=jnp.minimum(n_raw, spec.w_max),
            tile_has_work=tile_w.reshape(t_ang, n_ch) > 0,
            blk_has_work=blk_w > 0,
            n_groups=n_groups,
            overflowed=(n_raw[0] > spec.w_max) | missed,
            table=table,
        )

    # --- XLA fallback construction (reference for the kernels above) --------
    # Per-(block, tile) exact radial footprint unions, then per-pair
    # ABSOLUTE bin ranges: bin a is active iff its center r0 + a*dr lies
    # within [blk_lo - dr/2, blk_hi + dr/2] (samples outside are beyond
    # every member's cull sphere radially, reverse triangle inequality).
    # The 1e-4-bin widening absorbs f32 rounding. Chunk ranges derive from
    # the bin ranges (j = a // t_chunk). Empty pairs (no members:
    # blk_lo = +inf > blk_hi = -inf) and pairs entirely outside the padded
    # bin range encode al = total_bins, ah = -1.
    memb = decode_rect_members(words_pad[:, 0], n_tt, n_pt)  # (g_pad, T)
    lo = geom_r[:, 1].reshape(kb, spec.g_tile)
    hi = geom_r[:, 2].reshape(kb, spec.g_tile)
    memb3 = memb.reshape(kb, spec.g_tile, t_ang)
    blk_lo = jnp.min(
        jnp.where(memb3, lo[:, :, None], jnp.inf), axis=1
    )  # (KB, T)
    blk_hi = jnp.max(jnp.where(memb3, hi[:, :, None], -jnp.inf), axis=1)
    dr = r[1] - r[0]
    total_bins = n_ch * spec.t_chunk
    raw_lo = jnp.ceil((blk_lo - r[0]) / dr - 0.5 - 1e-4)
    raw_hi = jnp.floor((blk_hi - r[0]) / dr + 0.5 + 1e-4)
    valid_pair = (
        (blk_lo <= blk_hi) & (raw_hi >= 0) & (raw_lo <= total_bins - 1)
    )
    abs_lo = jnp.where(
        valid_pair,
        jnp.clip(raw_lo, 0, total_bins - 1).astype(jnp.int32),
        total_bins,
    )
    abs_hi = jnp.where(
        valid_pair,
        jnp.clip(raw_hi, 0, total_bins - 1).astype(jnp.int32),
        -1,
    )
    j_lo = jnp.where(valid_pair, abs_lo // spec.t_chunk, n_ch)
    j_hi = jnp.where(valid_pair, abs_hi // spec.t_chunk, -1)
    nch_bt = jnp.maximum(j_hi - j_lo + 1, 0)  # (KB, T)
    n_items = jnp.sum(nch_bt)

    # --- work lists by prefix-sum expansion (no large sorts) ----------------
    # Pairs in (block, tile) order; each expands to its chunk range. The
    # expansion IS the backward order (block-major: consecutive revisits of
    # each global block). The forward order is a small argsort of the W
    # expanded items (W ~ thousands, not KB*T*n_ch).
    w = spec.w_max
    nch_flat = nch_bt.reshape(-1)  # (KB*T,)
    off_flat = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nch_flat)[:-1]]
    )
    pair_ids = jnp.arange(nch_flat.shape[0], dtype=jnp.int32)
    slot_of = jnp.where(nch_flat > 0, off_flat, w)
    pair_at = (
        jnp.zeros((w,), jnp.int32)
        .at[slot_of]
        .max(pair_ids, mode="drop")
    )
    # Fill: every slot belongs to the latest pair started at or before it
    # (pair starts are scattered in ascending slot AND pair order).
    pair_slot = jax.lax.associative_scan(jnp.maximum, pair_at)  # (W,)
    off_w = off_flat[pair_slot]
    jlo_w = j_lo.reshape(-1)[pair_slot]
    bwd_b = pair_slot // t_ang
    bwd_t = pair_slot % t_ang
    # Clip: on work-list overflow the tail slots extend the last scattered
    # pair past its range; the render is wrong (and flagged) either way, but
    # the chunk index must stay in-bounds for the DMA index maps.
    bwd_j = jnp.clip(
        jlo_w + (jnp.arange(w, dtype=jnp.int32) - off_w), 0, n_ch - 1
    )
    bwd_first = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (bwd_b[1:] != bwd_b[:-1]).astype(jnp.int32),
        ]
    )
    # One fused row gather for both range ends, then chunk-relative clamp.
    ends_w = jnp.stack([abs_lo.reshape(-1), abs_hi.reshape(-1)], axis=1)[
        pair_slot
    ]  # (W, 2)
    bwd_bl = jnp.clip(
        ends_w[:, 0] - bwd_j * spec.t_chunk, 0, spec.t_chunk - 1
    )
    bwd_bh = jnp.clip(
        ends_w[:, 1] - bwd_j * spec.t_chunk, 0, spec.t_chunk - 1
    )
    # forward order: (t, j, b) — argsort of W keys (invalid items last).
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

    # Output masking helpers (dense reduces; never sorted or scattered).
    j_grid = jnp.arange(n_ch, dtype=jnp.int32)
    covers = (j_grid[None, None, :] >= j_lo[:, :, None]) & (
        j_grid[None, None, :] <= j_hi[:, :, None]
    )  # (KB, T, n_ch)
    return RSortTiles(
        full_perm=full_perm,
        inv_perm=inv_perm_step,
        words=words_pad,
        counts=counts,
        fwd_t=fwd_t, fwd_j=fwd_j, fwd_b=fwd_b, fwd_first=fwd_first,
        fwd_bl=fwd_bl, fwd_bh=fwd_bh,
        bwd_t=bwd_t, bwd_j=bwd_j, bwd_b=bwd_b, bwd_first=bwd_first,
        bwd_bl=bwd_bl, bwd_bh=bwd_bh,
        n_items=jnp.minimum(n_items, w).reshape(1),
        tile_has_work=jnp.any(covers, axis=0),  # (T, n_ch)
        blk_has_work=jnp.any(nch_bt > 0, axis=1),  # (KB,)
        n_groups=n_groups,
        overflowed=(n_items > w) | missed,
        table=table,
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
    """bf16 hi/lo split — MOSAIC-KERNEL-ONLY.

    Mosaic lowers the convert pair faithfully. In XLA-land the same
    pattern is folded to identity under `allow_excess_precision` (lo
    becomes exactly zero under jit) — use an `optimization_barrier`ed
    split there instead (see `xfeat_slab`)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bf16_dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gcat_bf16(gp):
    """(K, 10) centered forms -> (K, 30) bf16x3 contraction operand,
    PRE-SCALED by -0.5.

    Pairs with the transposed monomial slab `xcat = [x_hi; x_hi; x_lo]`
    ((30, S), samples on LANES): m = gcat @ xcat is the bf16x3-style
    Mahalanobis product in ONE MXU pass — the F=30 contraction pads to 128
    anyway, same cost as F=10. The dropped lo*lo term is ~2^-16 relative;
    f32 accumulation via preferred_element_type.

    The -0.5 of exp(-0.5 q) is folded into the operand here (exact: a
    power-of-two scale of the f32 forms before the hi/lo split), so both
    kernels evaluate p = exp(min(m, 0)) with no per-element multiply on
    the (K, S) slab. The backward's -0.5 factor on dg' is the d(exp)
    chain term and stays where it is.
    """
    g_hi, g_lo = _split_hi_lo(-0.5 * gp)
    return jnp.concatenate([g_hi, g_lo, g_hi], axis=1)  # (K, 30) bf16


def _member_bits(words, t, n_tt, n_pt):
    """(K,) {0,1} float mask: does the row's footprint RECTANGLE cover
    angular tile `t`?

    `words` is (K, 1) float32 holding packed rect words (<= 23 bits — every
    scaled floor below is f32-exact, see `_rect_bits`); `t` is a traced
    tile id; n_tt/n_pt are static. Word 0 (padding / dead rows) decodes
    valid = 0."""
    b_t, b_p, _ = _rect_bits(n_tt, n_pt)
    v = words[:, 0]
    q1 = jnp.floor(v * (2.0 ** -b_p))
    ph_hi = v - q1 * (1 << b_p)
    q2 = jnp.floor(q1 * (2.0 ** -b_p))
    ph_lo = q1 - q2 * (1 << b_p)
    q3 = jnp.floor(q2 * (2.0 ** -b_t))
    th_hi = q2 - q3 * (1 << b_t)
    valid = jnp.floor(q3 * (2.0 ** -b_t))
    th_lo = q3 - valid * (1 << b_t)
    tt_i = t // n_pt
    tt = tt_i.astype(jnp.float32)
    pt = (t - tt_i * n_pt).astype(jnp.float32)
    inside = (
        (tt >= th_lo) & (tt <= th_hi) & (pt >= ph_lo) & (pt <= ph_hi)
    )
    return jnp.where(inside, valid, 0.0)


def _gate_ladder(bl, bh, *, gate_bins, s_ang, t_chunk):
    """Radial gate schedule for the work-list kernels.

    Returns ``(n_gates, locate)`` where ``locate(g) -> (start, off, lmask)``
    gives gate ``g``'s first bin index, its lane offset into the chunk, and
    an optional ``(1, s_ang*gate_bins)`` f32 mask (``None`` when every lane
    in the window is valid).

    When ``s_ang`` is lane-aligned (``% 128 == 0``) the ladder is
    bl-ANCHORED (unaligned): gate g covers bins [bl + g*gate_bins, ...), so
    the trip count is exactly ceil(span / gate_bins) instead of the aligned
    ladder's bh//gb - bl//gb + 1 (mean ~2.9 -> 2 gates at the bench's
    12-bin mean span — ~30% of all per-gate work). The final gate clamps
    its start into the chunk and ``lmask`` zeroes the re-covered leading
    bins so nothing double-deposits. Bins outside the item's range hold
    samples beyond every member's cull sphere (the same cutoff guarantee
    as chunk-level skipping).

    When ``s_ang`` is NOT lane-aligned, dynamic bin starts are unaligned
    lane offsets Mosaic cannot vector-load ("cannot statically prove that
    index ... is a multiple of 128" on hardware — interpret mode does not
    catch this), so the ladder falls back to gate_bins-ALIGNED starts with
    no masking.
    """
    s_gate = s_ang * gate_bins
    if s_ang % 128 == 0:
        n_gates = (bh - bl + gate_bins) // gate_bins
        t_lim = jnp.int32(max(t_chunk - gate_bins, 0))
        lbin = jax.lax.broadcasted_iota(
            jnp.int32, (1, s_gate), 1
        ) // s_ang  # local bin index of each lane (0..gate_bins-1)

        def locate(g):
            start_u = bl + g * gate_bins
            start = jnp.minimum(start_u, t_lim)
            off = pl.multiple_of(start * s_ang, s_ang)
            lmask = (lbin >= (start_u - start)).astype(jnp.float32)
            return start, off, lmask

        return n_gates, locate

    n_gates = bh // gate_bins - bl // gate_bins + 1

    def locate(g):
        start = (bl // gate_bins + g) * gate_bins
        off = pl.multiple_of(start * s_ang, s_gate)
        return start, off, None

    return n_gates, locate


def xfeat_slab(xfeat):
    """(T, S, FDIM) f32 monomials -> (T, 3*FDIM, S) bf16 [hi; hi; lo] slab.

    The kernels' bf16x3 Mahalanobis dot contracts gcat = [g_hi, g_lo, g_hi]
    against [x_hi; x_hi; x_lo]; storing the slab pre-duplicated removes the
    per-gate 30-row concatenate from BOTH kernels (a VPU copy per gate) at
    the cost of 1.5x the window DMA (640 KB -> 960 KB per backward item —
    double-buffered behind compute). Samples ride LANES (see rsort_field).

    This split runs in XLA-land (unlike `_split_hi_lo`, whose callers are
    all inside Mosaic kernels), where XLA's default `allow_excess_precision`
    folds the Dekker round-trip `x - f32(bf16(x))` to zero under jit — the
    exact bf16x3 path silently degrades to single-bf16 Mahalanobis
    precision (eager execution materializes each op, which is why the
    round-4 corruption was jit-only). Fold-proof form: truncate the
    mantissa by BITMASK instead of a convert pair — no f32->bf16->f32
    round-trip exists, so there is nothing for XLA to fold, and (unlike an
    `optimization_barrier`) fusion across the slab build is preserved
    (barrier variant: 8.68 ms/step at 100k; bitcast: 8.04). hi is the
    TRUNCATED bf16 (exactly representable; the convert just narrows), and
    lo = x - hi is exact in f32 before its own bf16 rounding — |lo| <=
    2^-8 |x| vs the round-split's 2^-9, identical at bf16x3's accuracy
    floor (hardware parity 4.6e-4, unchanged). Locked by
    `TestHiLoSplitSurvivesJit`."""
    bits = jax.lax.bitcast_convert_type(xfeat, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    x_hi = hi_f32.astype(jnp.bfloat16)
    x_lo = (xfeat - hi_f32).astype(jnp.bfloat16)
    return jnp.concatenate([x_hi, x_hi, x_lo], axis=-1).transpose(0, 2, 1)


def xfeat_slab_t(xfeat_t):
    """`xfeat_slab` for ALREADY-TRANSPOSED (T, FDIM, S) monomial rows
    (`tile_points_centered_direct_t`): the hi/lo split is elementwise and
    the [hi; hi; lo] stack is a row concatenate — no minor-axis shuffle.
    Same fold-proof bitmask split (see `xfeat_slab`)."""
    bits = jax.lax.bitcast_convert_type(xfeat_t, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    x_hi = hi_f32.astype(jnp.bfloat16)
    x_lo = (xfeat_t - hi_f32).astype(jnp.bfloat16)
    return jnp.concatenate([x_hi, x_hi, x_lo], axis=1)


def _rs_fwd_kernel(ft, fj, fb, first, fbl, fbh, cnt, cx, x_ref, gw_ref,
                   out_ref, *, t_ang, n_c, n_words, n_tt, n_pt, s_ang,
                   gate_bins, t_chunk, p_bf16=False):
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
        gcat = _gcat_bf16(_center_transform(gw[:, :FDIM], x0, y0, z0))
        smask = _member_bits(gw[:, FDIM + n_c:], ft[i], n_tt, n_pt)
        bl, bh = fbl[i], fbh[i]
        # (C, K) masked channel weights: the K-contraction against p lands
        # the per-channel field directly in the (C, S) output orientation.
        wm = jnp.stack(
            [gw[:, FDIM + c] * smask for c in range(n_c)], axis=0
        )
        if p_bf16:
            wm = wm.astype(jnp.bfloat16)
        s_gate = s_ang * gate_bins
        # Radial gating over the _gate_ladder schedule (bl-anchored when
        # the lane layout allows it, gate-aligned otherwise).
        n_gates, locate = _gate_ladder(
            bl, bh, gate_bins=gate_bins, s_ang=s_ang, t_chunk=t_chunk
        )

        def gate(g, carry):
            _, off, lmask = locate(g)
            # Slab rows are pre-duplicated [hi; hi; lo] (see xfeat_slab).
            xcat = x_ref[0, :, pl.ds(off, s_gate)]  # (30, S_g) bf16
            m = _bf16_dot(gcat, xcat, ((1,), (0,)))  # (K, S_g), = -0.5 q
            p = jnp.exp(jnp.minimum(m, 0.0))
            if lmask is not None:
                p = p * lmask
            if p_bf16:
                # One bf16 MXU pass replaces the per-channel VPU
                # mul+reduce (~2e-4 relative on the field).
                out_ref[0, :, pl.ds(off, s_gate)] += _bf16_dot(
                    wm, p.astype(jnp.bfloat16), ((1,), (0,))
                )
            else:
                # Exact path: the old orientation's `p * w[None, :]` VPU
                # reduce would be a >128-wide lane broadcast here (Mosaic:
                # unimplemented); a HIGHEST-precision (C, K) x (K, S) dot
                # is bf16x3-exact and rides the MXU instead.
                out_ref[0, :, pl.ds(off, s_gate)] += jax.lax.dot_general(
                    wm, p, dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            return carry

        jax.lax.fori_loop(0, n_gates, gate, jnp.int32(0))


def _rs_bwd_kernel(bt, bj, bb, first, bbl, bbh, cnt, cx, x_ref, gw_ref,
                   go_ref, dgw_ref, *, t_ang, n_c, n_words, n_tt, n_pt,
                   s_ang, gate_bins, t_chunk, p_bf16=False, exp_bf16=False):
    """Backward via the rank-C factorization of the cotangent chain.

    With y_c[f, a] = go[c, a] * x[f, a] (an (F, S) slab — F = 20x cheaper
    than any per-(sample, gaussian) temporary; the go row is a SUBLANE
    broadcast in the transposed layout), both gradients fall out of ONE
    lane-contraction Z_c = p @ y_c^T:
        dg'[k, f] = -0.5 * sum_c w_c[k] * Z_c[k, f],
        dw_c[k]   = Z_c[k, 9]          (monomial column 9 is the constant 1).
    This removes the old (S, K) dm materialization, its hi/lo splits, and
    the per-pair mask chain — the VPU cost per pair drops from ~12 ops to
    ~5 (max, exp, p splits). The m > 0 clamp mask on dm is dropped
    deliberately: the dense reference path never clamps, so the unmasked
    cotangent is the closer match (the clamp only guards f32 noise at the
    Gaussian peak where the true gradient vanishes anyway).

    Radial gating: Z accumulates over ONLY the gate_bins-sized sub-chunks
    inside the item's bin range (fori_loop carry); sub-chunks outside are
    never touched — their p is sub-cutoff, the identical guarantee to
    chunk-level skipping.
    """
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
        gcat = _gcat_bf16(_center_transform(gw[:, :FDIM], x0, y0, z0))
        smask = _member_bits(gw[:, FDIM + n_c:], bt[i], n_tt, n_pt)
        bl, bh = bbl[i], bbh[i]
        cf = n_c * FDIM
        s_gate = s_ang * gate_bins
        # _gate_ladder schedule (see _rs_fwd_kernel).
        n_gates, locate = _gate_ladder(
            bl, bh, gate_bins=gate_bins, s_ang=s_ang, t_chunk=t_chunk
        )

        def gate(g, z):
            _, off, lmask = locate(g)
            # Slab rows are pre-duplicated [hi; hi; lo] (see xfeat_slab).
            xcat = x_ref[0, :, pl.ds(off, s_gate)]  # (30, S_g) bf16
            m = _bf16_dot(gcat, xcat, ((1,), (0,)))  # (K, S_g)
            xf32 = (
                xcat[:FDIM].astype(jnp.float32)
                + xcat[2 * FDIM:].astype(jnp.float32)
            )
            go_g = go_ref[0, :, pl.ds(off, s_gate)]  # (C, S_g)
            ys = [go_g[c:c + 1, :] * xf32 for c in range(n_c)]
            ycat = jnp.concatenate(ys, axis=0)  # (C*F, S_g)
            if p_bf16 and exp_bf16:
                # bf16-argument exp: double VPU transcendental rate; the
                # |m| * 2^-9 argument quantization is visible only in the
                # tail where p is negligible (see RSortSpec.bwd_exp_bf16).
                p = jnp.exp(jnp.minimum(m, 0.0).astype(jnp.bfloat16))
                if lmask is not None:
                    p = p * lmask.astype(jnp.bfloat16)
                return z + _bf16_dot(p, ycat.astype(jnp.bfloat16),
                                     ((1,), (1,)))
            p = jnp.exp(jnp.minimum(m, 0.0))
            if lmask is not None:
                p = p * lmask
            if p_bf16:
                # Single-pass variant: p and y in plain bf16 (no splits).
                # The ~2^-8 relative error lands on gradients only.
                return z + _bf16_dot(
                    p.astype(jnp.bfloat16),
                    ycat.astype(jnp.bfloat16), ((1,), (1,))
                )
            p_hi, p_lo = _split_hi_lo(p)
            y_hi, y_lo = _split_hi_lo(ycat)
            # Z = p ycat^T, bf16x3 over the S (lane) contraction in two
            # passes ([y_hi; y_lo] stack on sublanes, 2CF <= 128 output).
            both = _bf16_dot(p_hi, jnp.concatenate([y_hi, y_lo], axis=0),
                             ((1,), (1,)))  # (K, 2*C*F)
            return (
                z + both[:, :cf] + both[:, cf:]
                + _bf16_dot(p_lo, y_hi, ((1,), (1,)))
            )

        z = jax.lax.fori_loop(
            0, n_gates, gate,
            jnp.zeros((gw.shape[0], cf), jnp.float32),
        )
        dgp = jnp.zeros((z.shape[0], FDIM), jnp.float32)
        dw_cols = []
        for c in range(n_c):
            zc = z[:, c * FDIM:(c + 1) * FDIM]
            dgp = dgp - 0.5 * gw[:, FDIM + c][:, None] * zc
            dw_cols.append(zc[:, FDIM - 1] * smask)
        dg = _center_transform_t(dgp, x0, y0, z0) * smask[:, None]
        dw = jnp.stack(dw_cols, axis=1)
        # Pad to the full table width: word column + any trailing
        # geometry columns (wide-gather tables) get zero gradient.
        zero_pat = jnp.zeros(
            (dg.shape[0], gw.shape[1] - FDIM - n_c), jnp.float32
        )
        dgw_ref[0] += jnp.concatenate([dg, dw, zero_pat], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20))
def rsort_field(
    xfeat,  # (n_tiles_total, 30, S) CENTERED monomials, bf16 [hi; hi; lo], S on LANES
    centers,  # (n_tiles_total, 3) tile centers
    table,  # (KB, g_tile, 10 + C + P) global layout: forms|weights|patterns
    fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl, fwd_bh,  # (W,) forward work list
    bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl, bwd_bh,  # (W,) backward list
    n_items,  # (1,) int32
    tile_has_work,  # (T_ang, n_ch)
    blk_has_work,  # (KB,)
    spec: RSortSpec = RSortSpec(),
    dims: Tuple[int, int, int, int, int] = (4, 2, 25, 1, 0),
    # dims = (n_tt, n_pt, n_ch, n_words, n_extra_geom_cols)
    interpret: Optional[bool] = None,
):
    """out (n_tiles_total, C, S) = per-chunk field sums (work-list-sparse).

    Layout: the sample axis S rides LANES in every per-tile slab (xfeat,
    out, and the backward's go). The old sample-on-sublanes orientation
    lane-padded the C=1 output and 20-wide monomials to 128 lanes — at
    t_chunk=64 that made the out/go windows 4 MB of mostly-padding DMA per
    work item, which the profiler showed to be the kernels' bound. The
    transposed slabs carry the same bytes at 1/16 the DMA. The Gaussian
    table keeps its (K, width) row-major layout: all K-side math (center
    transform, gradient assembly) contracts over lanes <= 128 there.
    """
    return _rsort_fwd_impl(
        xfeat, centers, table, fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl,
        fwd_bh, n_items, tile_has_work, spec, dims, interpret,
    )


def _tile_id_map(n_tt, n_pt):
    def f(t, j):
        tt = t // n_pt
        ptt = t % n_pt
        return (j * n_tt + tt) * n_pt + ptt

    return f


def _rsort_fwd_impl(xfeat, centers, table, fwd_t, fwd_j, fwd_b, fwd_first,
                    fwd_bl, fwd_bh, n_items, tile_has_work, spec, dims,
                    interpret):
    n_tt, n_pt, n_ch, n_words, n_extra = dims
    t_ang = n_tt * n_pt
    s = xfeat.shape[2]
    s_ang = spec.t_theta * spec.t_phi
    if spec.t_chunk % spec.gate_bins:
        raise ValueError(
            f"gate_bins={spec.gate_bins} must divide t_chunk={spec.t_chunk}"
        )
    c = table.shape[-1] - FDIM - n_words - n_extra
    interp = _interpret_default() if interpret is None else interpret
    tid = _tile_id_map(n_tt, n_pt)

    def ie(i, cnt):
        return jnp.clip(i, 0, jnp.maximum(cnt[0] - 1, 0))

    def x_map(i, ft, fj, fb, first, fbl, fbh, cnt, cx):
        k = ie(i, cnt)
        return (tid(ft[k], fj[k]), 0, 0)

    def g_map(i, ft, fj, fb, first, fbl, fbh, cnt, cx):
        k = ie(i, cnt)
        return (fb[k], 0, 0)

    out = pl.pallas_call(
        functools.partial(
            _rs_fwd_kernel, t_ang=t_ang, n_c=c, n_words=n_words,
            n_tt=n_tt, n_pt=n_pt, s_ang=s_ang, gate_bins=spec.gate_bins,
            t_chunk=spec.t_chunk, p_bf16=spec.fwd_p_bf16,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(spec.w_max,),
            in_specs=[
                pl.BlockSpec((1, 3 * FDIM, s), x_map),
                pl.BlockSpec((1, spec.g_tile, table.shape[-1]), g_map),
            ],
            out_specs=pl.BlockSpec((1, c, s), x_map),
        ),
        out_shape=jax.ShapeDtypeStruct((xfeat.shape[0], c, s), jnp.float32),
        interpret=interp,
    )(
        fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl, fwd_bh, n_items, centers,
        xfeat, table,
    )
    # Tiles with no work items are never visited by the kernel: their output
    # blocks are uninitialized memory. Mask them to exact zeros (NaN-safe).
    tile_ids = jnp.arange(xfeat.shape[0])
    t_of = tile_ids % t_ang  # padded-layout tile order is (j, t)
    j_of = tile_ids // t_ang
    has = tile_has_work[t_of, j_of]  # (n_tiles_total,)
    return jnp.where(has[:, None, None], out, 0.0)


def _rsort_vjp_fwd(xfeat, centers, table, fwd_t, fwd_j, fwd_b, fwd_first,
                   fwd_bl, fwd_bh, bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl,
                   bwd_bh, n_items, tile_has_work, blk_has_work, spec, dims,
                   interpret):
    out = _rsort_fwd_impl(
        xfeat, centers, table, fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl,
        fwd_bh, n_items, tile_has_work, spec, dims, interpret,
    )
    return out, (xfeat, centers, table, bwd_t, bwd_j, bwd_b,
                 bwd_first, bwd_bl, bwd_bh, n_items, blk_has_work)


def _rsort_vjp_bwd(spec, dims, interpret, res, go):
    (xfeat, centers, table, bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl, bwd_bh,
     n_items, blk_has_work) = res
    n_tt, n_pt, n_ch, n_words, n_extra = dims
    t_ang = n_tt * n_pt
    s = xfeat.shape[2]
    s_ang = spec.t_theta * spec.t_phi
    f_in = table.shape[-1]
    c = f_in - FDIM - n_words - n_extra
    interp = _interpret_default() if interpret is None else interpret
    tid = _tile_id_map(n_tt=n_tt, n_pt=n_pt)

    def ie(i, cnt):
        return jnp.clip(i, 0, jnp.maximum(cnt[0] - 1, 0))

    def x_map(i, bt, bj, bb, first, bbl, bbh, cnt, cx):
        k = ie(i, cnt)
        return (tid(bt[k], bj[k]), 0, 0)

    def g_map(i, bt, bj, bb, first, bbl, bbh, cnt, cx):
        k = ie(i, cnt)
        return (bb[k], 0, 0)

    dtable = pl.pallas_call(
        functools.partial(
            _rs_bwd_kernel, t_ang=t_ang, n_c=c, n_words=n_words,
            n_tt=n_tt, n_pt=n_pt, s_ang=s_ang, gate_bins=spec.gate_bins,
            t_chunk=spec.t_chunk, p_bf16=spec.bwd_p_bf16,
            exp_bf16=spec.bwd_exp_bf16,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(spec.w_max,),
            in_specs=[
                pl.BlockSpec((1, 3 * FDIM, s), x_map),
                pl.BlockSpec((1, spec.g_tile, f_in), g_map),
                pl.BlockSpec((1, c, s), x_map),
            ],
            out_specs=pl.BlockSpec((1, spec.g_tile, f_in), g_map),
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, jnp.float32),
        interpret=interp,
    )(bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl, bwd_bh, n_items, centers,
      xfeat, table, go)
    # Global blocks with no work items are never visited: their gradient
    # rows are uninitialized memory. The pad_gather backward never reads
    # them (step-valid rows always land in visited blocks; culled rows take
    # the OOB zero fill), so the flagship path skips this mask. The dsort
    # scatter-add backward reads EVERY row — a poisoned (NaN) padding row
    # would corrupt Gaussian 0's gradient — and sets mask_dead_blocks.
    # Must be a `where`, not a multiply: NaN * 0 = NaN.
    if spec.mask_dead_blocks:
        dtable = jnp.where(blk_has_work[:, None, None], dtable, 0.0)
    return (None, None, dtable) + (None,) * 15


rsort_field.defvjp(_rsort_vjp_fwd, _rsort_vjp_bwd)


@jax.custom_vjp
def pad_gather(table, full_perm, inv_perm):
    """Rows `table[full_perm]` into the padded global layout, with an
    inverse-permutation-gather backward.

    A plain fancy-index backward would be an XLA scatter-add (serializing,
    row-count-bound on TPU — the v3 scatter-back cost 6.2 ms/step at 100k).
    Every original row appears in at most ONE padded slot; padding slots
    alias row 0 but their cotangents are exactly zero (the kernel masks all
    gradient components by the membership bit, and padding rows carry
    pattern 0), so the cotangent of row j is just `g[inv_perm[j]]` — culled
    rows read the sentinel zero row g_pad.
    """
    return _pad_gather_rows(table, full_perm)


def _pad_gather_rows(table, full_perm):
    # OOB slots (>= G, e.g. a dsort sentinel) take the native zero fill —
    # appending a zero sentinel row via concatenate costs a full-tensor
    # pad/copy, ~0.35 ms at 100k. Padding slots from the closed-form rsort
    # layout carry index 0 instead: they fetch row 0's (finite) data, which
    # every kernel gates out via the zero pattern word, and whose cotangent
    # rows are never read back (see pad_gather).
    return jnp.take(table, full_perm, axis=0, mode="fill", fill_value=0)


def _pad_gather_fwd(table, full_perm, inv_perm):
    return _pad_gather_rows(table, full_perm), inv_perm


def _pad_gather_bwd(inv_perm, g):
    # Culled rows carry the sentinel slot g_pad (OOB -> zero fill); overflow
    # slots past g_pad fill zero too (previously clamped onto the sentinel).
    return (
        jnp.take(g, inv_perm, axis=0, mode="fill", fill_value=0), None, None
    )


pad_gather.defvjp(_pad_gather_fwd, _pad_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def wide_pad_gather(gw, geom, perm, src, inv_perm, n_diff):
    """Differentiable columns `gw` + stop-grad geometry columns `geom`
    through the chained sort-permutation + closed-form-block-map row
    gathers, as ONE wide row gather pair.

    Row-gather cost at 100k rows is row-count-bound, not width-bound
    (hardware: an 11-col gather = a 4-col gather = ~0.14 ms), so carrying
    the kernel table inside the cull's existing geometry gather is free —
    it replaces the separate `pad_gather` + pattern concatenate +
    re-layout chain. Backward mirrors `pad_gather`: the cotangent of
    original row j is `g[inv_perm[j], :n_diff]` (padding slots' cotangents
    are exactly zero — the kernels mask every gradient component by the
    membership bit and padding rows carry word 0); geometry columns get
    no cotangent.

    The padding-slot zeros come from ONE appended zero row + `mode="clip"`
    takes, NOT `mode="fill"`: fill lowers to gather + compare + full-width
    select — three extra streaming passes over the 128-lane-padded row
    tables (~0.22 ms/step at 100k, trace: broadcast_select_fusion.{13,14,
    15}). The `src` sentinel is exactly `g` (see `_layout_from_geometry`),
    so it lands on the appended zero row; the row-append rides the concat
    fusion that already materializes the table, and `perm2`'s extra entry
    keeps the zero row at index g through the first gather. Only the WORD
    column actually needs the zero (it gates padding slots out of the
    kernels and the cull-finalize unions); the zero row gives the whole
    row for free.
    """
    g = gw.shape[0]
    full = jnp.concatenate([gw, geom], axis=1)
    full = jnp.concatenate(
        [full, jnp.zeros((1, full.shape[1]), full.dtype)], axis=0
    )  # (g + 1, F), row g = 0
    perm2 = jnp.concatenate([perm, jnp.full((1,), g, perm.dtype)])
    inner = jnp.take(full, perm2, axis=0, mode="clip")
    return jnp.take(inner, src, axis=0, mode="clip")


def _wide_pad_gather_fwd(gw, geom, perm, src, inv_perm, n_diff):
    return wide_pad_gather(gw, geom, perm, src, inv_perm, n_diff), inv_perm


def _wide_pad_gather_bwd(n_diff, inv_perm, g):
    # Culled rows (inv_perm == g_pad) and overflowed rows (> g_pad, the
    # `missed` channel) take the OOB zero fill. `mode="fill"` is RIGHT
    # here even though the forward uses the appended-zero-row clip trick:
    # the cotangent arrives as a standalone buffer, so appending a zero
    # row costs a full (G_pad, n_diff) copy — measured +0.1/+0.19 ms at
    # 100k (bf16/exact backward) vs fill's gather+select.
    dgw = jnp.take(
        g[:, :n_diff], inv_perm, axis=0, mode="fill", fill_value=0.0
    )
    return (dgw, None, None, None, None)


wide_pad_gather.defvjp(_wide_pad_gather_fwd, _wide_pad_gather_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "ns", "start", "end", "c", "delta_t", "scaling_modifier"
    ),
)
def _tune_probe_jit(means, scales, alive, cams, box_points, *, spec, ns,
                    start, end, c, delta_t, scaling_modifier):
    """One dispatch: cull every probe cam, return (max items, max groups)."""
    from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

    def one(cam):
        grid = shell_grid(cam, box_points, ns, start, end, c, delta_t)
        t = rsort_cull(
            means, scales, alive, cam, grid.theta, grid.phi, grid.r, spec,
            scaling_modifier,
        )
        return t.n_items[0], jnp.asarray(t.n_groups)

    items, groups = jax.lax.map(one, cams)
    return jnp.max(items), jnp.max(groups)


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
    ref_cam=None,
    slack: float = 0.0,
) -> RSortSpec:
    """Fit the rsort capacities to a scene by measuring the cull once.

    Runs `rsort_cull` (with generous probe caps) for a few representative
    cameras and returns a spec whose w_max / max_groups cover the observed
    maxima with `headroom`. Static shapes stay static: call this once before
    building the train step (capacities change rarely — `fit` re-tunes after
    densification milestones and on any runtime overflow).

    With `ref_cam`/`slack` (the frozen-layout training mode), every probe
    cull runs against ONE layout built from the reference camera — so the
    fitted w_max includes the scheduling slack a frozen layout costs at the
    scan corners.
    """
    import numpy as np

    from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

    g = scene.capacity
    t_ang = pl.cdiv(num_sampling_points, base.t_theta) * pl.cdiv(
        num_sampling_points, base.t_phi
    )
    n_ch = pl.cdiv(end - start, base.t_chunk)
    probe_groups = min(max(4 * base.max_groups, 64), 512)
    kb_probe = _padded_rows(g, base._replace(max_groups=probe_groups)) // base.g_tile
    probe = base._replace(
        max_groups=probe_groups,
        w_max=max(kb_probe * t_ang * n_ch, 1),
    )
    layout = None
    if ref_cam is not None:
        grid0 = shell_grid(
            jnp.asarray(ref_cam, jnp.float32), box_points,
            num_sampling_points, start, end, c, delta_t,
        )
        layout = rsort_layout(
            scene.means, scene.scales, scene.alive,
            jnp.asarray(ref_cam, jnp.float32), grid0.theta, grid0.phi,
            grid0.r, probe, scaling_modifier, slack=slack,
        )
    cams = np.asarray(camera_positions, np.float32).reshape(-1, 3)
    if layout is None:
        # Hot path: `fit` re-tunes after EVERY densification event, so the
        # probe must be cheap. One jitted dispatch maps the cull over all
        # probe cams (lax.map, not vmap — Mosaic rejects a batched
        # `_ws_build_kernel`); eager probing cost ~5-10 s per re-tune
        # through the dispatch tunnel (~40% of the first real 50k run's
        # steady-state wall clock).
        items, groups = _tune_probe_jit(
            scene.means, scene.scales, scene.alive, jnp.asarray(cams),
            jnp.asarray(box_points), spec=probe,
            ns=num_sampling_points, start=start, end=end, c=c,
            delta_t=delta_t, scaling_modifier=scaling_modifier,
        )
        max_items = max(1, int(items))
        max_groups_obs = max(1, int(groups))
    else:
        # Frozen-layout tuning (bench/option path): rare, stays eager.
        max_items = 1
        max_groups_obs = 1
        for cam in cams:
            grid = shell_grid(
                jnp.asarray(cam), box_points, num_sampling_points, start,
                end, c, delta_t,
            )
            t = rsort_cull(
                scene.means, scene.scales, scene.alive, jnp.asarray(cam),
                grid.theta, grid.phi, grid.r, probe, scaling_modifier,
                layout=layout,
            )
            max_items = max(max_items, int(t.n_items[0]))
            max_groups_obs = max(max_groups_obs, int(t.n_groups))

    return base._replace(
        w_max=int(max_items * headroom) + 8,
        # Group merging stays CORRECT (impure blocks only add work items),
        # so modest headroom suffices here.
        max_groups=min(max_groups_obs + max(4, max_groups_obs // 4),
                       probe_groups),
    )


def rsort_gaussian_field(
    gfeat,  # (G, 10)
    channel_weights,  # (G, C)
    points,  # (num_r, ns, ns, 3) — used only when `grid`/`cam` not given
    tiles: RSortTiles,
    spec: RSortSpec,
    interpret: Optional[bool] = None,
    grid=None,
    cam=None,
):
    """Full work-list-sparse field evaluation: (num_r, ns, ns, C) + overflow.

    Pass `grid` (ShellGrid) + `cam` to build the tiled sample monomials
    directly in tile-major order (`tile_points_centered_direct`) — the
    transpose-based tiler costs ~2 ms/step at 100k-scale."""
    if grid is not None:
        num_r, ns = grid.r.shape[0], grid.theta.shape[0]
    else:
        num_r, ns = points.shape[0], points.shape[1]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)

    # Reuse the (r, theta, phi) tiler at chunk granularity.
    from nlos_gaussian_renderer_tpu.ops.fused import (
        TileSpec,
        tile_points_centered_direct,
    )

    tp_spec = TileSpec(
        t_theta=spec.t_theta, t_phi=spec.t_phi, t_r=spec.t_chunk
    )
    xfeat_t = None
    if grid is not None:
        from nlos_gaussian_renderer_tpu.ops.fused import (
            tile_points_centered_direct_t,
        )

        # Transposed-orientation build: monomial rows written directly in
        # the kernels' (T, rows, S) layout — skips the (T, S, 90) ->
        # (T, 90, S) minor-axis shuffle of the row-major slab build
        # (8.04 -> measured-below ms at 100k).
        xfeat_t, centers = tile_points_centered_direct_t(
            jax.lax.stop_gradient(grid.theta),
            jax.lax.stop_gradient(grid.phi),
            jax.lax.stop_gradient(grid.r),
            jax.lax.stop_gradient(jnp.asarray(cam)),
            tp_spec, n_tt, n_pt, n_ch,
        )
    else:
        xfeat, centers = tile_points_centered(
            points, ns, num_r, tp_spec, n_tt, n_pt, n_ch
        )

    n_words = tiles.words.shape[1]
    if tiles.table is not None:
        # The cull's wide-gather already produced the padded differentiable
        # table [forms | weights | word | 3 geometry cols] — the kernels
        # DMA the 3 trailing columns along but never read them. The gfeat /
        # channel_weights arguments are NOT re-read here: the gw passed to
        # rsort_cull must equal concat([gfeat, channel_weights], axis=1),
        # and the geometry tail is exactly 3 columns — assert the widths
        # agree so a mismatched caller fails loudly instead of the kernel
        # silently mis-slicing geometry columns as weights.
        table = tiles.table
        n_extra = table.shape[-1] - FDIM - channel_weights.shape[1] - n_words
        if n_extra != 3:
            raise ValueError(
                f"tiles.table width {table.shape[-1]} does not match "
                f"[{FDIM} forms | {channel_weights.shape[1]} weights | "
                f"{n_words} word | 3 geometry] — the gw given to rsort_cull "
                "must be concat([gfeat, channel_weights], axis=1) with the "
                "same channel count used at render time"
            )
    else:
        gw = jnp.concatenate([gfeat, channel_weights], axis=1)
        # ONE padded-layout gather (backward: ONE inverse gather — no
        # scatter).
        gw_pad = pad_gather(gw, tiles.full_perm, tiles.inv_perm)
        patterns = jax.lax.stop_gradient(tiles.words.astype(jnp.float32))
        table = jnp.concatenate([gw_pad, patterns], axis=1)
        n_extra = 0
    kb = table.shape[0] // spec.g_tile
    table3 = table.reshape(kb, spec.g_tile, table.shape[-1])

    # Pre-split, pre-duplicated bf16 [hi; hi; lo] monomial slab (saves the
    # split AND the 30-row concatenate on every kernel gate), transposed so
    # samples ride LANES (see rsort_field: 1/16 the window DMA of the
    # row-major form).
    xfeat_hl = xfeat_slab_t(xfeat_t) if xfeat_t is not None else xfeat_slab(xfeat)

    out = rsort_field(
        xfeat_hl, centers, table3,
        tiles.fwd_t, tiles.fwd_j, tiles.fwd_b, tiles.fwd_first,
        tiles.fwd_bl, tiles.fwd_bh,
        tiles.bwd_t, tiles.bwd_j, tiles.bwd_b, tiles.bwd_first,
        tiles.bwd_bl, tiles.bwd_bh,
        tiles.n_items, tiles.tile_has_work, tiles.blk_has_work,
        spec, (n_tt, n_pt, n_ch, n_words, n_extra), interpret,
    )
    field = untile_field_t(out, ns, num_r, tp_spec, n_tt, n_pt, n_ch)
    return field, tiles.overflowed
