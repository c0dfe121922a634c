"""Fused block-sparse Gaussian field evaluation (Pallas TPU kernel).

This is the TPU replacement for the reference's CUDA renderer stack
(`submodules/cuda_renderer/src/{ray_aabb.cu,volume_renderer.cu}`): per-ray
Gaussian culling + field accumulation. The design is TPU-shaped rather than a
port of the per-ray-thread CUDA model:

  1. **Cull**: each Gaussian's 3-sigma bounding sphere is projected to a
     (theta, phi, r) footprint interval around the scan point; a boolean block
     mask marks which (angular-tile x radial-tile) blocks it can touch
     (replaces the slab-test index lists of `ray_aabb.cu:10-61`).
  2. **Compact**: per tile, the indices of intersecting Gaussians are
     compacted into a fixed-capacity buffer with lax.top_k on the tile mask
     (static shapes; overflow reported, not silently wrong).
  3. **Fused kernel**: per (tile, sample-block, gaussian-block) the kernel
     computes the Mahalanobis quadratic form as an MXU matmul
     (see `ops/math.py` quadratic-form compilation), applies exp on the VPU,
     and contracts against per-Gaussian channel weights — never materializing
     the (samples x gaussians) matrix in HBM. Blocks beyond a tile's Gaussian
     count are skipped entirely.

Gradients: `fused_field` carries a custom VJP whose backward recomputes the
per-tile PDF (flash-attention style) and emits two matmuls per tile — fixing
the reference's zero-gradient CUDA autograd placeholder
(`gaussian_model/cuda_autograd.py:147-191`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nlos_gaussian_renderer_tpu.ops import math as gmath

FDIM = gmath.QUADRATIC_DIM  # 10


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Fused field kernel: out[t, a, c] = sum_k w[t, k, c] * exp(-0.5 * <x[t,a], g[t,k]>)
# ---------------------------------------------------------------------------


def _maha_tile(x, g):
    """(A_SUB, 10) x (G_TILE, 10) -> (A_SUB, G_TILE) quadratic forms.

    MXU dot at HIGHEST (f32-exact). Measured against a 10-FMA VPU unroll:
    the MXU wins (14.8 vs 17.9 ms kernel fwd at 500M pairs) despite the
    K=10->128 padding; Mosaic has no HIGH lowering for dot_general.
    """
    return jax.lax.dot_general(
        x, g,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pdf_tile(x, g):
    return jnp.exp(-0.5 * jnp.maximum(_maha_tile(x, g), 0.0))


def _field_fwd_kernel(counts_ref, x_ref, g_ref, w_ref, out_ref):
    k = pl.program_id(2)
    t = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    g_tile = g_ref.shape[1]

    @pl.when(k * g_tile < counts_ref[t])
    def _():
        p = _pdf_tile(x_ref[0], g_ref[0])
        # Channel contraction on the VPU: an MXU (A,G)@(G,C) with C ~ 2 pads
        # the output lanes 2 -> 128 and costs as much as the main matmul.
        for c in range(out_ref.shape[-1]):
            out_ref[0, :, c] += jnp.sum(p * w_ref[0, :, c][None, :], axis=1)


def _field_bwd_kernel(counts_ref, x_ref, g_ref, w_ref, go_ref, dg_ref, dw_ref):
    a = pl.program_id(2)
    t = pl.program_id(0)

    @pl.when(a == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    g_tile = g_ref.shape[1]

    @pl.when(pl.program_id(1) * g_tile < counts_ref[t])
    def _():
        n_c = w_ref.shape[-1]
        m = _maha_tile(x_ref[0], g_ref[0])  # (A_SUB, G_TILE)
        p = jnp.exp(-0.5 * jnp.maximum(m, 0.0))
        # Thin C-dim contractions on the VPU (see fwd kernel note).
        # dw[k, c] = sum_a p[a, k] go[a, c]  (sublane reduction per channel)
        for c in range(n_c):
            dw_ref[0, :, c] += jnp.sum(p * go_ref[0, :, c][:, None], axis=0)
        # wg[a, k] = sum_c go[a, c] w[k, c]  (rank-C outer-product broadcast)
        wg = go_ref[0, :, 0][:, None] * w_ref[0, :, 0][None, :]
        for c in range(1, n_c):
            wg += go_ref[0, :, c][:, None] * w_ref[0, :, c][None, :]
        dm = jnp.where(m > 0.0, -0.5 * p * wg, 0.0)
        # dg[k, f] = sum_a dm[a, k] x[a, f]
        dg_ref[0] += jax.lax.dot_general(
            dm, x_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def fused_field(
    xfeat: jax.Array,  # (T, A, 10) per-tile sample monomials
    gfeat: jax.Array,  # (T, K, 10) per-tile gathered Gaussian forms
    weights: jax.Array,  # (T, K, C) per-tile channel weights (0 on padding)
    counts: jax.Array,  # (T,) int32 valid Gaussians per tile
    a_sub: int = 1024,
    g_tile: int = 256,
    interpret: Optional[bool] = None,
    precision: str = "highest",
) -> jax.Array:
    """out[t, a, c] = sum_k weights[t,k,c] * exp(-0.5 * max(<x, g>, 0)).

    `precision` is accepted for API stability; the kernels pin f32-exact
    HIGHEST on MXU dots and run the thin contractions on the VPU.
    """
    return _fused_field_fwd_impl(
        xfeat, gfeat, weights, counts, a_sub, g_tile, interpret, precision
    )


def _fused_field_fwd_impl(xfeat, gfeat, weights, counts, a_sub, g_tile,
                          interpret, precision="highest"):
    t, a, _ = xfeat.shape
    k = gfeat.shape[1]
    c = weights.shape[2]
    a_sub = min(a_sub, a)
    g_tile = min(g_tile, k)
    interpret = _interpret_default() if interpret is None else interpret

    grid = (t, pl.cdiv(a, a_sub), pl.cdiv(k, g_tile))
    del precision

    def k_clamped(t_i, a_i, k_i, c_ref):
        # Pin beyond-count gaussian blocks to the last valid block: Pallas
        # elides the DMA when consecutive grid steps map to the same block,
        # so tiles with small counts don't pay fetch time for k_max padding.
        last = jnp.maximum(c_ref[t_i] - 1, 0) // g_tile
        return (t_i, jnp.minimum(k_i, last), 0)

    out = pl.pallas_call(
        _field_fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, a_sub, FDIM), lambda t, a, k, c_ref: (t, a, 0)),
                pl.BlockSpec((1, g_tile, FDIM), k_clamped),
                pl.BlockSpec((1, g_tile, c), k_clamped),
            ],
            out_specs=pl.BlockSpec((1, a_sub, c), lambda t, a, k, c_ref: (t, a, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((t, a, c), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * a * k * (FDIM + c),
            bytes_accessed=4 * t * (a * FDIM + k * (FDIM + c) + a * c),
            transcendentals=t * a * k,
        ),
    )(counts, xfeat, gfeat, weights)
    return out


def _fused_field_vjp_fwd(xfeat, gfeat, weights, counts, a_sub, g_tile,
                         interpret, precision):
    out = _fused_field_fwd_impl(
        xfeat, gfeat, weights, counts, a_sub, g_tile, interpret, precision
    )
    return out, (xfeat, gfeat, weights, counts)


def _fused_field_vjp_bwd(a_sub, g_tile, interpret, precision, residuals, go):
    xfeat, gfeat, weights, counts = residuals
    t, a, _ = xfeat.shape
    k = gfeat.shape[1]
    c = weights.shape[2]
    a_sub_eff = min(a_sub, a)
    g_tile_eff = min(g_tile, k)
    interp = _interpret_default() if interpret is None else interpret

    # Grid: accumulate over sample blocks (innermost) for each gaussian block.
    grid = (t, pl.cdiv(k, g_tile_eff), pl.cdiv(a, a_sub_eff))

    def k_clamped(t_i, k_i, a_i, c_ref):
        # See forward kernel: skip DMA for beyond-count gaussian blocks.
        last = jnp.maximum(c_ref[t_i] - 1, 0) // g_tile_eff
        return (t_i, jnp.minimum(k_i, last), 0)

    def a_pinned(t_i, k_i, a_i, c_ref):
        # When this gaussian block is entirely padding, pin the sample-block
        # index so the (larger) x/go fetches are elided across the inner loop.
        valid = k_i * g_tile_eff < c_ref[t_i]
        return (t_i, jnp.where(valid, a_i, 0), 0)

    dg, dw = pl.pallas_call(
        _field_bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, a_sub_eff, FDIM), a_pinned),
                pl.BlockSpec((1, g_tile_eff, FDIM), k_clamped),
                pl.BlockSpec((1, g_tile_eff, c), k_clamped),
                pl.BlockSpec((1, a_sub_eff, c), a_pinned),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, g_tile_eff, FDIM), lambda t, k, a, c_ref: (t, k, 0)
                ),
                pl.BlockSpec((1, g_tile_eff, c), lambda t, k, a, c_ref: (t, k, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t, k, FDIM), jnp.float32),
            jax.ShapeDtypeStruct((t, k, c), jnp.float32),
        ],
        interpret=interp,
        cost_estimate=pl.CostEstimate(
            flops=6 * t * a * k * (FDIM + c),
            bytes_accessed=4 * t * (a * FDIM + 2 * k * (FDIM + c) + a * c),
            transcendentals=t * a * k,
        ),
    )(counts, xfeat, gfeat, weights, go)
    # Sample features carry no gradient (stop-gradient geometry), counts are
    # integral.
    return None, dg, dw, None


fused_field.defvjp(_fused_field_vjp_fwd, _fused_field_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def take_rows(
    table: jax.Array,
    idx: jax.Array,
    counts: Optional[jax.Array] = None,
    unique_per_tile: bool = False,
):
    """Gather rows `table[idx]` with a tuned scatter-add backward.

    idx: (T, K) row ids. When `unique_per_tile` (true for the top_k compaction
    path, whose per-tile index lists are permutation prefixes — unique but not
    globally sorted), the backward runs one unique-indices scatter per tile —
    faster than the single duplicated scatter XLA emits for plain
    fancy-indexing (measured 6.7 vs 8.9 ms at (32, 16384) -> (100k, 12)).

    Both cull paths zero-PAD their per-tile index lists (so index 0 repeats
    whenever a tile is not full), and duplicate indices under
    unique_indices=True are undefined behavior in XLA. `counts` (T,) marks the
    valid prefix of each tile's list; padding slots are rerouted to unique
    sentinel rows >= len(table) in a widened scatter buffer, keeping the
    per-tile uniqueness guarantee honest. Padding-slot cotangents are exactly
    zero (channel weights are masked before the kernel, which in turn zeroes
    the quadratic-form gradient), so the rerouted rows discard nothing.
    Callers requesting `unique_per_tile` without `counts` fall back to the
    duplicate-safe plain scatter.
    """
    return table[idx]


def _take_rows_fwd(table, idx, counts, unique_per_tile):
    return table[idx], (idx, counts, table.shape)


def _take_rows_bwd(unique_per_tile, res, g):
    idx, counts, tshape = res
    n_rows = tshape[0]
    if unique_per_tile and counts is not None:
        k = idx.shape[1]
        slot = jnp.arange(k, dtype=idx.dtype)[None, :]
        safe_idx = jnp.where(slot < counts[:, None], idx, n_rows + slot)
        buf = jnp.zeros((n_rows + k,) + tuple(tshape[1:]), g.dtype)
        for t in range(idx.shape[0]):
            # Per-tile lists are ascending (top_k over the d-permuted mask)
            # and the sentinels (n_rows + slot) extend that order, so the
            # scatter can claim sorted+unique indices.
            buf = buf.at[safe_idx[t]].add(
                g[t], unique_indices=True, indices_are_sorted=True
            )
        out = buf[:n_rows]
    else:
        out = (
            jnp.zeros(tshape, g.dtype)
            .at[idx.reshape(-1)]
            .add(g.reshape((-1,) + g.shape[2:]))
        )
    return out, None, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


# ---------------------------------------------------------------------------
# Cull + compact
# ---------------------------------------------------------------------------


def _topk_compaction(g: int, n_tiles: int) -> bool:
    """Compaction strategy selector (shared by cull_tiles and take_rows: the
    top_k path yields per-tile-unique index lists; the scatter path pads with
    zeros, i.e. duplicates)."""
    return g * n_tiles > 1_000_000


class TileSpec(NamedTuple):
    """Static tiling of the (r, theta, phi) sample grid."""

    t_theta: int = 8
    t_phi: int = 16
    t_r: int = 64
    k_max: int = 2048  # per-tile Gaussian capacity
    a_sub: int = 2048  # sample-block rows per kernel step (swept optimum)
    g_tile: int = 256
    sigma_cull: float = 3.0
    margin: float = 1.1  # safety factor on angular footprints
    # Reserved: kernel matmul precision (kernels currently pin f32-exact
    # HIGHEST on the MXU; Mosaic has no HIGH lowering).
    precision: str = "highest"


class CompactTiles(NamedTuple):
    """All-array pytree (safe through jit); static tile-grid dims come from
    `tile_grid_dims`."""

    indices: jax.Array  # (T, k_max) int32 Gaussian ids (0-padded)
    counts: jax.Array  # (T,) int32
    slot_valid: jax.Array  # (T, k_max) float32 1/0
    overflowed: jax.Array  # () bool — any tile truncated


def tile_grid_dims(ns: int, num_r: int, spec: "TileSpec"):
    """(n_theta_tiles, n_phi_tiles, n_r_tiles) for an (ns, ns, num_r) grid."""
    return pl.cdiv(ns, spec.t_theta), pl.cdiv(ns, spec.t_phi), pl.cdiv(num_r, spec.t_r)


def cull_tiles(
    means: jax.Array,
    scales: jax.Array,
    alive: jax.Array,
    cam: jax.Array,
    theta: jax.Array,  # (ns,)
    phi: jax.Array,  # (ns,)
    r: jax.Array,  # (num_r,)
    spec: TileSpec,
    scaling_modifier: float = 1.0,
) -> CompactTiles:
    """Project Gaussian bounding spheres to (theta, phi, r) footprints and
    build per-tile compact index lists.

    Conservative analogue of the CUDA ray-AABB filter (`ray_aabb.cu:10-61`)
    at tile granularity.
    """
    ns = theta.shape[0]
    num_r = r.shape[0]
    n_tt, n_pt, n_rt = tile_grid_dims(ns, num_r, spec)

    rel = means - cam[None, :]
    sph = gmath.cartesian_to_spherical(rel)  # (G, 3): d, theta, phi
    d = jnp.maximum(sph[:, 0], 1e-9)
    radius = (
        spec.sigma_cull
        * scaling_modifier
        * jnp.max(scales, axis=-1)
        * spec.margin
    )
    # Dead Gaussians get empty footprints.
    radius = jnp.where(alive > 0.5, radius, -1.0)

    alpha = jnp.arcsin(jnp.clip(radius / d, -1.0, 1.0))
    th_lo, th_hi = sph[:, 1] - alpha, sph[:, 1] + alpha
    # Conservative phi half-width: sin(theta) attains its minimum over the
    # theta interval at an endpoint (sin is concave on [0, pi]).
    sin_min = jnp.maximum(
        jnp.minimum(jnp.sin(jnp.clip(th_lo, 0.0, jnp.pi)),
                    jnp.sin(jnp.clip(th_hi, 0.0, jnp.pi))),
        1e-3,
    )
    phi_ratio = radius / (d * sin_min)
    dphi = jnp.arcsin(jnp.clip(phi_ratio, -1.0, 1.0))
    ph_lo, ph_hi = sph[:, 2] - dphi, sph[:, 2] + dphi
    r_lo, r_hi = d - radius, d + radius
    # Footprints that escape the interval parameterization must cover every
    # angular tile: a cull sphere containing the scan point (radius >= d) sees
    # the full sphere; a cone whose sin(half-angle) reaches sin(theta) wraps
    # around a pole (full phi circle); a phi window crossing the +-pi seam
    # wraps. arcsin's clamp used to cap these at pi/2 — a silent drop.
    full_th = radius >= d
    full_ph = full_th | (phi_ratio >= 1.0) | (ph_lo < -jnp.pi) | (ph_hi > jnp.pi)
    full_th = full_th & (radius >= 0.0)
    full_ph = full_ph & (radius >= 0.0)

    def interval_tile_overlap(lo, hi, axis_vals, tile_size, n_tiles):
        # Tile bounds from the (monotonic) axis grid; padded tiles reuse the
        # last value, giving degenerate (still correct) bounds.
        pad = n_tiles * tile_size - axis_vals.shape[0]
        av = jnp.concatenate([axis_vals, jnp.full((pad,), axis_vals[-1])])
        tiles = av.reshape(n_tiles, tile_size)
        t_lo = jnp.minimum(tiles[:, 0], tiles[:, -1])
        t_hi = jnp.maximum(tiles[:, 0], tiles[:, -1])
        return (lo[:, None] <= t_hi[None, :]) & (hi[:, None] >= t_lo[None, :])

    m_th = interval_tile_overlap(th_lo, th_hi, theta, spec.t_theta, n_tt) | full_th[:, None]
    m_ph = interval_tile_overlap(ph_lo, ph_hi, phi, spec.t_phi, n_pt) | full_ph[:, None]
    m_r = interval_tile_overlap(r_lo, r_hi, r, spec.t_r, n_rt)
    live = radius >= 0.0

    mask = (
        m_r[:, :, None, None]
        & m_th[:, None, :, None]
        & m_ph[:, None, None, :]
        & live[:, None, None, None]
    )  # (G, n_rt, n_tt, n_pt)
    g = means.shape[0]
    n_tiles = n_rt * n_tt * n_pt
    mask2 = mask.reshape(g, n_tiles)

    raw_counts = jnp.sum(mask2.astype(jnp.int32), axis=0)  # (T,)
    # Compaction strategy by problem size (both yield set-bit indices in
    # ascending order, zero-padded):
    #  - large G*T: lax.top_k on the 0/1 mask (~3x faster than scatter at
    #    100k x 32 — XLA scatters serialize: 17.6 ms vs 6.1 ms);
    #  - small G*T: cumsum+scatter (top_k is a near-full sort when
    #    k_max ~ G and dominates small-scene steps).
    if _topk_compaction(g, n_tiles):
        k_cap = min(spec.k_max, g)
        _, idx = jax.lax.top_k(mask2.astype(jnp.float32).T, k_cap)  # (T, k_cap)
        if k_cap < spec.k_max:
            idx = jnp.pad(idx, ((0, 0), (0, spec.k_max - k_cap)))
        indices = idx.astype(jnp.int32)
    else:
        pos = jnp.cumsum(mask2.astype(jnp.int32), axis=0) - 1  # (G, T)
        valid = mask2 & (pos < spec.k_max)
        tile_ids = jnp.broadcast_to(
            jnp.arange(n_tiles)[None, :], (g, n_tiles)
        )
        flat_idx = jnp.where(
            valid, tile_ids * spec.k_max + pos, n_tiles * spec.k_max
        )
        gauss_ids = jnp.broadcast_to(
            jnp.arange(g, dtype=jnp.int32)[:, None], (g, n_tiles)
        )
        indices = (
            jnp.zeros((n_tiles * spec.k_max,), jnp.int32)
            .at[flat_idx.reshape(-1)]
            .set(gauss_ids.reshape(-1), mode="drop")
            .reshape(n_tiles, spec.k_max)
        )
    counts = jnp.minimum(raw_counts, spec.k_max)
    slot_valid = (
        jnp.arange(spec.k_max)[None, :] < counts[:, None]
    ).astype(jnp.float32)
    return CompactTiles(
        indices=indices,
        counts=counts,
        slot_valid=slot_valid,
        overflowed=jnp.any(raw_counts > spec.k_max),
    )


# ---------------------------------------------------------------------------
# Tiled sample-feature layout
# ---------------------------------------------------------------------------


def tile_coords(points: jax.Array, ns: int, num_r: int, spec: TileSpec,
                n_tt: int, n_pt: int, n_rt: int) -> jax.Array:
    """(num_r, ns, ns, 3) world points -> (T, S, 3) per-tile sample coords.

    Tile order matches `cull_tiles` mask layout: (r_t, theta_t, phi_t); sample
    order within a tile is (r, theta, phi) — unpacked by `untile_field`.
    """
    pr = n_rt * spec.t_r - num_r
    pt = n_tt * spec.t_theta - ns
    pp = n_pt * spec.t_phi - ns
    pts = jnp.pad(points, ((0, pr), (0, pt), (0, pp), (0, 0)))
    pts = pts.reshape(
        n_rt, spec.t_r, n_tt, spec.t_theta, n_pt, spec.t_phi, 3
    ).transpose(0, 2, 4, 1, 3, 5, 6)
    return pts.reshape(
        n_rt * n_tt * n_pt, spec.t_r * spec.t_theta * spec.t_phi, 3
    )


def tile_points(points: jax.Array, ns: int, num_r: int, spec: TileSpec,
                n_tt: int, n_pt: int, n_rt: int) -> jax.Array:
    """(num_r, ns, ns, 3) world points -> (T, S, 10) per-tile monomials."""
    return gmath.point_monomials(
        tile_coords(points, ns, num_r, spec, n_tt, n_pt, n_rt)
    )


def tile_points_centered(points: jax.Array, ns: int, num_r: int,
                         spec: TileSpec, n_tt: int, n_pt: int, n_rt: int):
    """Per-tile CENTERED monomials + tile centers.

    Centering the quadratic-form evaluation at each tile's sample centroid
    shrinks the term magnitudes by ~|x|/|x - x0| (meters -> tile extent),
    which buys enough headroom that the Mahalanobis matmul can run as ONE
    bf16 MXU pass (with an x3-style hi/lo split) instead of six f32-HIGHEST
    passes — see `_rs_fwd_kernel`. The Gaussian-side transform to the
    centered basis happens in-kernel (it depends on the tile).

    Returns:
      (xfeat (T, S, 10) centered monomials, centers (T, 3)).
    """
    pts = tile_coords(points, ns, num_r, spec, n_tt, n_pt, n_rt)
    centers = jnp.mean(pts, axis=1)  # (T, 3)
    return gmath.point_monomials(pts - centers[:, None, :]), centers


def tile_points_centered_direct(theta, phi, r, cam, spec: TileSpec,
                                n_tt: int, n_pt: int, n_rt: int):
    """`tile_points_centered` built straight from the (theta, phi, r) grid.

    Generates the samples with the broadcast axes ALREADY in tile-major
    order ((r_t, th_t, ph_t, r, th, ph)) — no 6-axis transpose. Measured
    perf-neutral in the full train step (XLA fuses `tile_coords`' transpose
    into the producer; an isolated microbench overstated it), kept for the
    cleaner generation and better-conditioned axis padding: pads extrapolate
    the grid instead of inserting zero points (= the camera position) into
    the last radial chunk's centroid. Padded samples' outputs are dropped by
    `untile_field` and carry zero cotangent, and centering is exact for ANY
    x0, so the two builders agree to f32 rounding on every real sample.

    Returns:
      (xfeat (T, S, 10) centered monomials, centers (T, 3)).
    """
    pts, centers = _tile_points_centered_direct_pts(
        theta, phi, r, cam, spec, n_tt, n_pt, n_rt
    )
    return gmath.point_monomials(pts - centers[:, None, :]), centers


def tile_points_centered_direct_t(theta, phi, r, cam, spec: TileSpec,
                                  n_tt: int, n_pt: int, n_rt: int):
    """`tile_points_centered_direct` in the kernels' TRANSPOSED orientation.

    Emits the centered monomials as ROWS — (T, 10, S) with samples on the
    minor (lane) axis — by stacking the ten (T, S) elementwise products on
    axis=1 instead of building (T, S, 10) and transposing: the kernels
    consume the bf16 slab as (T, 3*FDIM, S) (`xfeat_slab_t`), and the
    (T, S, 90) -> (T, 90, S) minor-axis shuffle of the row-major build is a
    real data movement XLA cannot fuse away.

    Returns:
      (xfeat_t (T, 10, S) centered monomial rows, centers (T, 3)).
    """
    xf, centers = _tile_points_centered_direct_pts(
        theta, phi, r, cam, spec, n_tt, n_pt, n_rt
    )
    cx = xf[..., 0] - centers[:, None, 0]  # (T, S)
    cy = xf[..., 1] - centers[:, None, 1]
    cz = xf[..., 2] - centers[:, None, 2]
    one = jnp.ones_like(cx)
    rows = jnp.stack(
        [cx * cx, cy * cy, cz * cz, cx * cy, cx * cz, cy * cz,
         cx, cy, cz, one],
        axis=1,
    )  # (T, 10, S)
    return rows, centers


def _tile_points_centered_direct_pts(theta, phi, r, cam, spec: TileSpec,
                                     n_tt: int, n_pt: int, n_rt: int):
    """Shared sample generation for the two direct tilers: tile-major
    (T, S, 3) points + (T, 3) centroids."""

    def pad_axis(v, tile, n_tiles):
        extra = n_tiles * tile - v.shape[0]
        if extra:
            step = v[-1] - v[-2] if v.shape[0] >= 2 else jnp.zeros((), v.dtype)
            v = jnp.concatenate([v, v[-1] + step * jnp.arange(1, extra + 1)])
        return v.reshape(n_tiles, tile)

    th = pad_axis(theta, spec.t_theta, n_tt)
    ph = pad_axis(phi, spec.t_phi, n_pt)
    rr = pad_axis(r, spec.t_r, n_rt)
    sin_t = jnp.sin(th)[:, None, :, None]
    cos_t = jnp.cos(th)[:, None, :, None]
    cos_p = jnp.cos(ph)[None, :, None, :]
    sin_p = jnp.sin(ph)[None, :, None, :]
    dirs = jnp.stack(
        [
            sin_t * cos_p,
            sin_t * sin_p,
            jnp.broadcast_to(
                cos_t, (n_tt, n_pt, spec.t_theta, spec.t_phi)
            ),
        ],
        axis=-1,
    )
    pts = (
        rr[:, None, None, :, None, None, None]
        * dirs[None, :, :, None, :, :, :]
        + jnp.asarray(cam)
    )
    t = n_rt * n_tt * n_pt
    s = spec.t_r * spec.t_theta * spec.t_phi
    pts = pts.reshape(t, s, 3)
    return pts, jnp.mean(pts, axis=1)


def untile_field(out: jax.Array, ns: int, num_r: int, spec: TileSpec,
                 n_tt: int, n_pt: int, n_rt: int) -> jax.Array:
    """(T, S, C) tiled field -> (num_r, ns, ns, C)."""
    c = out.shape[-1]
    full = out.reshape(
        n_rt, n_tt, n_pt, spec.t_r, spec.t_theta, spec.t_phi, c
    ).transpose(0, 3, 1, 4, 2, 5, 6)
    full = full.reshape(
        n_rt * spec.t_r, n_tt * spec.t_theta, n_pt * spec.t_phi, c
    )
    return full[:num_r, :ns, :ns]


def untile_field_t(out: jax.Array, ns: int, num_r: int, spec: TileSpec,
                   n_tt: int, n_pt: int, n_rt: int) -> jax.Array:
    """(T, C, S) tiled field (samples on LANES) -> (num_r, ns, ns, C).

    Transposed-slab counterpart of `untile_field` for the rsort kernels'
    channel-major output layout."""
    c = out.shape[1]
    full = out.reshape(
        n_rt, n_tt, n_pt, c, spec.t_r, spec.t_theta, spec.t_phi
    ).transpose(0, 4, 1, 5, 2, 6, 3)
    full = full.reshape(
        n_rt * spec.t_r, n_tt * spec.t_theta, n_pt * spec.t_phi, c
    )
    return full[:num_r, :ns, :ns]


def fused_gaussian_field(
    gfeat: jax.Array,  # (G, 10)
    channel_weights: jax.Array,  # (G, C)
    points: jax.Array,  # (num_r, ns, ns, 3)
    tiles: CompactTiles,
    spec: TileSpec,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Evaluate sum_g w_gc * pdf_g at every shell sample, block-sparsely.

    Returns:
      ((num_r, ns, ns, C) field, overflow flag).
    """
    num_r, ns = points.shape[0], points.shape[1]
    n_tt, n_pt, n_rt = tile_grid_dims(ns, num_r, spec)
    xfeat = tile_points(points, ns, num_r, spec, n_tt, n_pt, n_rt)
    # One combined gather (and one combined scatter-add on the backward) for
    # the quadratic forms and channel weights; narrow separate gathers were
    # ~2x the cost in XLA (see take_rows).
    unique = _topk_compaction(gfeat.shape[0], n_tt * n_pt * n_rt)
    gw = jnp.concatenate([gfeat, channel_weights], axis=1)  # (G, 10 + C)
    gw_tiles = take_rows(gw, tiles.indices, tiles.counts, unique)
    g_tiles = gw_tiles[..., :FDIM]
    w_tiles = gw_tiles[..., FDIM:] * tiles.slot_valid[..., None]
    out = fused_field(
        xfeat, g_tiles, w_tiles, tiles.counts,
        spec.a_sub, spec.g_tile, interpret, spec.precision,
    )
    field = untile_field(out, ns, num_r, spec, n_tt, n_pt, n_rt)
    return field, tiles.overflowed
