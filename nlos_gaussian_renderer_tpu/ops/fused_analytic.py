"""Work-list-scheduled Pallas kernel for CLOSED-FORM (erf) shell integration.

The chunked-jnp analytic backend (`ops/analytic.py`) is exact but dense: it
evaluates every Gaussian against every ray. This module puts the same erf
section math (after "Don't Splat your Gaussians", Condor et al. 2024 — the
technique of the reference's `volume_renderer_analytic.cu:23-173` /
`analytic_integration.cuh:123-172`, rebuilt with REAL per-bin deposition)
behind the rsort backend's culling machinery: the (pattern, d)-sorted global
table, packed membership words, and (tile, chunk, block) work lists of
`ops/fused_rsort.py` are reused verbatim — only the kernel body changes.

Per work item the kernel evaluates, for each ray s of the angular tile and
each Gaussian k of the global block, the ray-quadratic
    m(t) = qa t^2 + qb t + qc
of the squared Mahalanobis along the ray, then deposits the EXACT optical
depth of every time bin in the chunk:
    tau[bin] = integral_{e_bin}^{e_bin+1} exp(-m(t)/2) dt
             = pref * (erf(z1) - erf(z0)),
    pref = 0.5*sqrt(2*pi/qa) * exp(-0.5*(qc - qb^2/(4*qa))),
    z(t) = sqrt(qa/2) * (t + qb/(2*qa)).

**Numerical core — tile-centered ray parameterization.** Evaluating
qc - qb^2/(4qa) in the global frame cancels catastrophically (both terms are
~(d/sigma)^2 ~ 1e4-1e6 while the result is <= ~30 for any culled-in
Gaussian). The kernel therefore re-parameterizes each ray by s = t - t_c
around the point o + t_c*w nearest the tile centroid x0:
    y(s) = u + s*w,  u = (o - x0) + t_c*w   (|u| ~ tile extent, small),
and evaluates the quadratic in the x0-centered form basis
(`_center_transform`): qa = w^T A w, qb = 2 u^T A w + b'.w,
qc = mon(u) . g'. All three come off bf16x3 MXU contractions whose operand
magnitudes are O(tile/sigma), not O(d/sigma) — the same centering trick the
numerical rsort kernels use.

**Backward — closed-form moment integrals.** With E(s) = exp(-m(s)/2) and
I0 = tau, the first two moments have exact recurrences
    I1 = (E(s0) - E(s1) - (qb/2) I0) / qa,
    I2 = (I0 - (qb/2) I1 - (s1 E(s1) - s0 E(s0))) / qa,
giving d tau/d(qa, qb, qc) = -(I2, I1, I0)/2 with no erf derivatives and no
clamping: the cotangent flows through three transposed contractions into the
centered-form basis and `_center_transform_t` maps it back. qa >= 1/s_max^2
is far from zero, so the divisions are well-conditioned.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nlos_gaussian_renderer_tpu.ops.fused import (
    FDIM,
    TileSpec,
    _interpret_default,
    tile_coords,
    untile_field_t,
)
from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
    RSortSpec,
    RSortTiles,
    _bf16_dot,
    _center_transform,
    _center_transform_t,
    _gate_ladder,
    _member_bits,
    _split_hi_lo,
    _tile_id_map,
    pad_gather,
)

# Ray-feature layout along the SUBLANE axis of the xfeat input (rays ride
# LANES — the transposed-slab orientation shared with fused_rsort):
#   [w0, w1, w2, w0^2, w1^2, w2^2, w0*w1, w0*w2, w1*w2] (9), then padding.
XF_ANALYTIC = 16  # padded feature width (sublane-friendly)


def analytic_ray_features(theta, phi, spec: RSortSpec):
    """(T_ang, XF, S_ang) per-angular-tile unit directions + their mon2.

    Sample order within a tile is (theta_local, phi_local) — consistent with
    `tile_coords`' (r, theta, phi) in-tile order once the kernel interleaves
    the chunk's radial bins. Rays on LANES, features on sublanes.
    """
    ns = theta.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    pt = n_tt * spec.t_theta - ns
    pp = n_pt * spec.t_phi - ns
    th = jnp.concatenate([theta, jnp.full((pt,), theta[-1])])
    ph = jnp.concatenate([phi, jnp.full((pp,), phi[-1])])
    sin_t = jnp.sin(th)
    w = jnp.stack(
        [
            sin_t[:, None] * jnp.cos(ph)[None, :],
            sin_t[:, None] * jnp.sin(ph)[None, :],
            jnp.cos(th)[:, None] * jnp.ones((1, ph.shape[0])),
        ],
        axis=-1,
    )  # (ns_t, ns_p, 3)
    tiles = w.reshape(n_tt, spec.t_theta, n_pt, spec.t_phi, 3).transpose(
        0, 2, 1, 3, 4
    ).reshape(n_tt * n_pt, spec.t_theta * spec.t_phi, 3)
    w0, w1, w2 = tiles[..., 0], tiles[..., 1], tiles[..., 2]
    feats = jnp.stack(
        [w0, w1, w2, w0 * w0, w1 * w1, w2 * w2, w0 * w1, w0 * w2, w1 * w2],
        axis=1,
    )  # (T_ang, 9, S_ang)
    pad = XF_ANALYTIC - feats.shape[1]
    return jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))


def analytic_tile_aux(points, cam, ns, num_r, spec: RSortSpec):
    """(n_tiles_total, 4) per-(chunk, tile) metadata [delta(3), t_c].

    delta = cam - x0 (x0 = tile sample centroid), t_c = |x0 - cam|: the ray
    re-parameterization anchor shared by every ray in the tile.
    """
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)
    tp = TileSpec(t_theta=spec.t_theta, t_phi=spec.t_phi, t_r=spec.t_chunk)
    pts = tile_coords(points, ns, num_r, tp, n_tt, n_pt, n_ch)  # (T, S, 3)
    centers = jnp.mean(pts, axis=1)  # (T, 3)
    cam = jnp.asarray(cam)
    delta = cam[None, :] - centers
    t_c = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    return jnp.concatenate([delta, t_c], axis=1)  # (T, 4)


def chunk_edges(r, spec: RSortSpec):
    """(n_ch, t_chunk + 1) absolute bin edges per radial chunk (padded)."""
    from nlos_gaussian_renderer_tpu.ops.analytic import bin_edges_from_grid

    num_r = r.shape[0]
    n_ch = pl.cdiv(num_r, spec.t_chunk)
    dr = r[1] - r[0]
    pad = n_ch * spec.t_chunk - num_r
    edges = bin_edges_from_grid(r)  # (num_r + 1,)
    if pad:
        extra = edges[-1] + dr * jnp.arange(1, pad + 1)
        edges = jnp.concatenate([edges, extra])
    # Overlapping view: chunk j owns edges [j*t_chunk, j*t_chunk + t_chunk].
    idx = (
        jnp.arange(n_ch)[:, None] * spec.t_chunk
        + jnp.arange(spec.t_chunk + 1)[None, :]
    )
    return edges[idx]


def _quad_features(xf, aux_row):
    """Transposed ray-feature slabs (rays on LANES) for the ray quadratics.

    Returns (mon2_w (6, S), qb_feats (9, S), mon_u (10, S)): the dot-side
    features of qa, qb, qc respectively (forward) and of the dqa/dqb/dqc
    contractions (backward)."""
    d0, d1, d2, tc = aux_row[0], aux_row[1], aux_row[2], aux_row[3]
    w0, w1, w2 = xf[0, :], xf[1, :], xf[2, :]
    mon2_w = xf[3:9, :]  # [w0^2, w1^2, w2^2, w0w1, w0w2, w1w2] rows
    u0 = d0 + tc * w0
    u1 = d1 + tc * w1
    u2 = d2 + tc * w2
    mixed = jnp.stack(
        [
            2.0 * u0 * w0,
            2.0 * u1 * w1,
            2.0 * u2 * w2,
            u0 * w1 + u1 * w0,
            u0 * w2 + u2 * w0,
            u1 * w2 + u2 * w1,
        ],
        axis=0,
    )  # (6, S)
    qb_feats = jnp.concatenate([mixed, xf[:3, :]], axis=0)  # (9, S)
    one = jnp.ones_like(u0)
    mon_u = jnp.stack(
        [u0 * u0, u1 * u1, u2 * u2, u0 * u1, u0 * u2, u1 * u2,
         u0, u1, u2, one],
        axis=0,
    )  # (10, S)
    return mon2_w, qb_feats, mon_u


def _analytic_quadratics(feats, gp):
    """(qa, qb, qc) each (K, S) from centered forms gp (K, 10) and the
    `_quad_features` slabs."""
    mon2_w, qb_feats, mon_u = feats
    # qa = w^T A w: A6 . mon2(w) (packed off-diagonals already doubled);
    # qb = 2 u^T A w + b'.w; qc = mon(u) . g' (all 10 components).
    qa = _hilo_matmul(gp[:, :6], mon2_w)
    qb = _hilo_matmul(gp[:, :9], qb_feats)
    qc = _hilo_matmul(gp, mon_u)
    return qa, qb, qc


def _hilo_matmul(g, x):
    """bf16x3-style (K, F) x (F, S) -> (K, S) with f32 accumulation.

    Same one-pass trick as `fused_rsort._gcat_bf16`: concatenate
    [g_hi, g_lo, g_hi] against [x_hi; x_hi; x_lo] along F (3F <= 128 pads
    into one MXU pass; the lo*lo term is ~2^-16 relative).
    """
    g_hi, g_lo = _split_hi_lo(g)
    x_hi, x_lo = _split_hi_lo(x)
    gcat = jnp.concatenate([g_hi, g_lo, g_hi], axis=1)  # (K, 3F)
    xcat = jnp.concatenate([x_hi, x_hi, x_lo], axis=0)  # (3F, S)
    return _bf16_dot(gcat, xcat, ((1,), (0,)))


_SQRT_2PI = 2.5066282746310002

# Abramowitz & Stegun 7.1.26 rational-polynomial erf: max abs error 1.5e-7
# (below f32 resolution of the erf differences we take). Mosaic has NO erf
# lowering (`NotImplementedError: Unimplemented primitive ... erf` on real
# hardware — caught by a TPU run; interpret-mode tests can't see it), so the
# kernel carries its own, built from exp/div/FMA only.
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erf(x):
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + _ERF_P * a)
    a1, a2, a3, a4, a5 = _ERF_A
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _erf_and_gauss(x):
    """(erf(x), exp(-x^2)) sharing the one exp.

    The backward needs both erf(z_b) and E(s_b) = exp(-m(s_b)/2) at every
    edge, and m/2 = z^2 + phi/2 exactly — so E = exp(-phi/2) * exp(-z^2)
    reuses the erf polynomial's own exponential."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + _ERF_P * a)
    a1, a2, a3, a4, a5 = _ERF_A
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    ex = jnp.exp(-a * a)
    return s * (1.0 - poly * ex), ex


def _an_fwd_kernel(ft, fj, fb, first, fbl, fbh, cnt, aux, edges, xf_ref,
                   gw_ref, out_ref, *, t_ang, n_c, n_words, n_tt, n_pt, t_chunk, s_ang,
                   gate_bins):
    i = pl.program_id(0)
    live = i < cnt[0]

    @pl.when(jnp.logical_and(live, first[i] == 1))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(live)
    def _():
        tile = fj[i] * t_ang + ft[i]
        gw = gw_ref[0]
        # Forms centered at x0 = cam - delta: x0 in world coords.
        d0, d1, d2, tc = aux[tile, 0], aux[tile, 1], aux[tile, 2], aux[tile, 3]
        # _center_transform centers at the point x0 given in WORLD coords;
        # x0 = cam - delta.
        cx0 = aux[tile, 4]
        cx1 = aux[tile, 5]
        cx2 = aux[tile, 6]
        gp = _center_transform(gw[:, :FDIM], cx0, cx1, cx2)
        smask = _member_bits(gw[:, FDIM + n_c:], ft[i], n_tt, n_pt)
        xf = xf_ref[0]  # (XF, S_ang), rays on lanes
        feats = _quad_features(xf, (d0, d1, d2, tc))
        qa, qb, qc = _analytic_quadratics(feats, gp)  # (K, S_ang) each
        qa = jnp.maximum(qa, 1e-8)
        inv2qa = 0.5 / qa
        phi = jnp.maximum(qc - qb * qb * inv2qa * 0.5, 0.0)
        pref = (
            0.5 * _SQRT_2PI * jax.lax.rsqrt(qa) * jnp.exp(-0.5 * phi)
        )  # (K, S)
        sqrt_half_qa = jnp.sqrt(0.5 * qa)
        shift = qb * inv2qa
        # (C, K) masked channel weights: the K contraction against the
        # gate's tau slab deposits straight into the (C, S) output rows.
        wm = jnp.stack(
            [gw[:, FDIM + c] * smask for c in range(n_c)], axis=0
        )
        # Gate-chunk march over the item's active bins [bl, bh] (the block's
        # exact radial interval; bins outside get zero tau from every member —
        # beyond the 3-sigma cull radius). Each gate evaluates ALL of its
        # gate_bins+1 edge CDFs as INDEPENDENT unrolled 2D erf's — no
        # loop-carried cdf; the per-bin serial erf chain was the old kernel's
        # bottleneck (each erf waited on the previous bin's). The per-bin
        # taus concatenate on LANES into one (K, s_gate) slab whose single
        # HIGHEST-precision MXU pass against wm deposits the whole gate.
        # Gates ride the fused_rsort._gate_ladder schedule (bl-anchored
        # when the lane layout allows, gate-aligned otherwise).
        j = fj[i]
        bl, bh = fbl[i], fbh[i]
        s_gate = s_ang * gate_bins
        n_gates, locate = _gate_ladder(
            bl, bh, gate_bins=gate_bins, s_ang=s_ang, t_chunk=t_chunk
        )

        def gate(g, carry):
            b0, off, lmask = locate(g)
            cdfs = [
                _erf(sqrt_half_qa * ((edges[j, b0 + e] - tc) + shift))
                for e in range(gate_bins + 1)
            ]
            taus = jnp.concatenate(
                [pref * (cdfs[b + 1] - cdfs[b]) for b in range(gate_bins)],
                axis=1,
            )  # (K, s_gate)
            if lmask is not None:
                taus = taus * lmask
            out_ref[0, :, pl.ds(off, s_gate)] += jax.lax.dot_general(
                wm, taus, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return carry

        jax.lax.fori_loop(0, n_gates, gate, jnp.int32(0))


def _an_bwd_kernel(bt, bj, bb, first, bbl, bbh, cnt, aux, edges, xf_ref,
                   gw_ref, go_ref, dgw_ref, *, t_ang, n_c, n_words, n_tt, n_pt, t_chunk,
                   s_ang, gate_bins):
    i = pl.program_id(0)
    live = i < cnt[0]

    @pl.when(jnp.logical_and(live, first[i] == 1))
    def _():
        dgw_ref[...] = jnp.zeros_like(dgw_ref)

    @pl.when(live)
    def _():
        tile = bj[i] * t_ang + bt[i]
        gw = gw_ref[0]
        d0, d1, d2, tc = aux[tile, 0], aux[tile, 1], aux[tile, 2], aux[tile, 3]
        cx0, cx1, cx2 = aux[tile, 4], aux[tile, 5], aux[tile, 6]
        gp = _center_transform(gw[:, :FDIM], cx0, cx1, cx2)
        smask = _member_bits(gw[:, FDIM + n_c:], bt[i], n_tt, n_pt)
        xf = xf_ref[0]  # (XF, S_ang), rays on lanes
        feats = _quad_features(xf, (d0, d1, d2, tc))
        qa, qb, qc = _analytic_quadratics(feats, gp)  # (K, S_ang) each
        qa = jnp.maximum(qa, 1e-8)
        inv_qa = 1.0 / qa
        inv2qa = 0.5 * inv_qa
        phi = jnp.maximum(qc - qb * qb * inv2qa * 0.5, 0.0)
        eh = jnp.exp(-0.5 * phi)
        pref = 0.5 * _SQRT_2PI * jax.lax.rsqrt(qa) * eh
        sqrt_half_qa = jnp.sqrt(0.5 * qa)
        shift = qb * inv2qa
        j = bj[i]
        half_qb = 0.5 * qb
        wm = jnp.stack(
            [gw[:, FDIM + c] * smask for c in range(n_c)], axis=1
        )  # (K, C)
        # Pre-split hi/lo halves of the dtau contraction's K-side operand,
        # padded to an 8-deep contraction: Mosaic cannot lower a HIGHEST
        # (or tiny-C) f32 dot here ('vector.broadcast' bf16->f32 verifier
        # failure on hardware), so dtau rides the proven bf16x3 pattern.
        w_hi, w_lo = _split_hi_lo(wm)
        cpad = ((3 * n_c + 7) // 8) * 8
        pad_c = jnp.zeros((wm.shape[0], cpad - 3 * n_c), jnp.bfloat16)
        wcat = jnp.concatenate([w_hi, w_lo, w_hi, pad_c], axis=1)  # (K, cpad)
        bl, bh = bbl[i], bbh[i]
        s_gate = s_ang * gate_bins
        # fused_rsort._gate_ladder schedule (same as the forward).
        n_gates, locate = _gate_ladder(
            bl, bh, gate_bins=gate_bins, s_ang=s_ang, t_chunk=t_chunk
        )

        # Gate-chunk march over the block's active radial interval (same
        # schedule as the forward): every gate evaluates all gate_bins + 1
        # edge (erf, exp) pairs as INDEPENDENT unrolled 2D ops — no
        # loop-carried cdf chain, which was the serial bottleneck — then
        # forms the exact moment integrals per bin (E(s) = exp(-phi/2) *
        # exp(-z^2) reuses the erf polynomial's exponential; m/2 = z^2 +
        # phi/2 exactly) and accumulates the quadratic cotangents. All
        # (K, S) slabs keep rays on LANES; the go-side products ride MXU
        # contractions over C (dtau) and S (dw).
        def gate(g, carry):
            dqa, dqb, dqc, dw = carry
            b0, off, lmask = locate(g)
            pairs = [
                _erf_and_gauss(
                    sqrt_half_qa * ((edges[j, b0 + e] - tc) + shift)
                )
                for e in range(gate_bins + 1)
            ]
            go_g = go_ref[0, :, pl.ds(off, s_gate)]  # (C, B*S)
            # Per-bin tau slabs, concatenated on LANES (bin-major, matching
            # the output rows) so the dtau matmul and the dw contraction run
            # ONCE per gate over the full B*S lane axis instead of once per
            # bin — 2 MXU passes/gate vs 16. The dq* accumulators stay
            # per-ray (K, S): carrying (K, B*S) accumulators instead
            # measured 2 ms SLOWER at 100k (3 MB of loop-carried VMEM).
            i0s = [
                pref * (pairs[b + 1][0] - pairs[b][0])
                for b in range(gate_bins)
            ]
            i0c = jnp.concatenate(i0s, axis=1)  # (K, B*S)
            if lmask is not None:
                i0c = i0c * lmask
            # dtau[k, s] = sum_c w[k, c] * go[c, s]: bf16x3 over the
            # zero-padded C contraction (see wcat above), whole gate at once.
            g_hi, g_lo = _split_hi_lo(go_g)
            pad_s = jnp.zeros(
                (wcat.shape[1] - 3 * n_c, go_g.shape[1]), jnp.bfloat16
            )
            gocat = jnp.concatenate([g_hi, g_hi, g_lo, pad_s], axis=0)
            dtau = _bf16_dot(wcat, gocat, ((1,), (0,)))  # (K, B*S)
            if lmask is not None:
                dtau = dtau * lmask
            dw = dw + _contract_s(i0c, go_g)  # (K, C)
            # Summation-by-parts moment accumulation: the per-bin i1/i2
            # moment slabs are never materialized. With dt_b the bin's dtau
            # slice, the gate's contributions to the quadratic cotangents
            # collapse into three cheap bin sums
            #     A0 = sum_b dt_b i0_b,
            #     Ae = sum_b dt_b (ex_b - ex_{b+1}),
            #     As = sum_b dt_b (s1_b ex_{b+1} - s0_b ex_b),
            # (s0/s1 are SMEM scalars, ex the erf polynomial's shared
            # exponential; E_edge = eh * ex factors eh out of every bin)
            # and the moment recurrences applied ONCE per gate:
            #     sum_b dt_b i1_b = (eh Ae - half_qb A0) inv_qa,
            #     sum_b dt_b i2_b = (A0 - half_qb S1 - eh As) inv_qa.
            # Identical math, reassociated — ~2x less per-bin VPU work than
            # materializing i1/i2 (hardware: 19.5 -> 19.3 ms at 100k; the
            # kernel is EUP-bound on the erf/exp chain, so the elementwise
            # cut is small on the wall clock).
            zero = jnp.zeros_like(pref)
            a0, ae, as_ = zero, zero, zero
            for b in range(gate_bins):
                s0 = edges[j, b0 + b] - tc
                s1 = edges[j, b0 + b + 1] - tc
                ex_prev = pairs[b][1]
                ex_cur = pairs[b + 1][1]
                dt_b = dtau[:, b * s_ang:(b + 1) * s_ang]
                a0 = a0 + dt_b * i0s[b]
                ae = ae + dt_b * (ex_prev - ex_cur)
                as_ = as_ + dt_b * (s1 * ex_cur - s0 * ex_prev)
            s1_sum = (eh * ae - half_qb * a0) * inv_qa
            s2_sum = (a0 - half_qb * s1_sum - eh * as_) * inv_qa
            return dqa + s2_sum, dqb + s1_sum, dqc + a0, dw

        zero = jnp.zeros_like(qa)
        dqa, dqb, dqc, dw_kc = jax.lax.fori_loop(
            0, n_gates, gate,
            (zero, zero, zero,
             jnp.zeros((gw.shape[0], n_c), jnp.float32)),
        )
        # -0.5 from d/dq of the moment recurrences, applied once here.
        dqa, dqb, dqc = -0.5 * dqa, -0.5 * dqb, -0.5 * dqc
        dw_acc = [dw_kc[:, c] for c in range(n_c)]

        # Assemble dg' from the three contraction transposes (contract S,
        # the lane axis). The `_quad_features` slabs are exactly the
        # feature sides: qc hits all 10 via mon_u; qb hits [:9] via
        # qb_feats; qa hits [:6] via mon2(w).
        mon2_w, qb_feats, mon_u = feats
        dgp = _contract_s(dqc, mon_u)
        dgp_b = _contract_s(dqb, qb_feats)  # (K, 9)
        dgp_a = _contract_s(dqa, mon2_w)  # (K, 6)
        dgp = (
            dgp
            + jnp.pad(dgp_b, ((0, 0), (0, 1)))
            + jnp.pad(dgp_a, ((0, 0), (0, 4)))
        )
        dg = _center_transform_t(dgp, cx0, cx1, cx2)
        dg = dg * smask[:, None]
        dw_cols = jnp.stack(
            [dw_acc[c] * smask for c in range(n_c)], axis=1
        )
        zero_pat = jnp.zeros((dg.shape[0], n_words), jnp.float32)
        dgw_ref[0] += jnp.concatenate([dg, dw_cols, zero_pat], axis=1)


def _contract_s(dq, feats):
    """(K, S), (F, S) -> (K, F) bf16x3 over the S (lane) contraction.

    The non-contracting rhs dim is padded to a multiple of 8 sublanes:
    Mosaic's ((1,),(1,)) bf16 dot lowering emits an invalid
    'vector.broadcast' (bf16 -> f32) when that dim is under a sublane tile
    (hardware-verified failure at F=2; the rsort backward's 2CF>=8 shapes
    lower fine)."""
    f = feats.shape[0]
    pad = (-f) % 8
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, feats.shape[1]), feats.dtype)], axis=0
        )
    dq_hi, dq_lo = _split_hi_lo(dq)
    f_hi, f_lo = _split_hi_lo(feats)
    both = _bf16_dot(dq_hi, jnp.concatenate([f_hi, f_lo], axis=0),
                     ((1,), (1,)))  # (K, 2*(F+pad))
    fp = f + pad
    return (
        both[:, :f] + both[:, fp:fp + f]
        + _bf16_dot(dq_lo, f_hi, ((1,), (1,)))[:, :f]
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21))
def analytic_rsort_field(
    xfeat,  # (T_ang, XF, S_ang) ray features, rays on LANES
    aux,  # (n_tiles_total, 8) [delta(3), t_c, x0(3), pad]
    edges,  # (n_ch, t_chunk + 1)
    table,  # (KB, g_tile, 10 + C + P)
    fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl, fwd_bh,
    bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl, bwd_bh,
    n_items,
    tile_has_work,
    blk_has_work,
    spec: RSortSpec = RSortSpec(),
    dims: Tuple[int, int, int, int] = (4, 2, 25, 1),
    interpret: Optional[bool] = None,
):
    """out (n_tiles_total, C, S): exact per-bin optical depths (tau), summed
    over the block's Gaussians with their channel weights (samples on
    LANES — the transposed-slab layout shared with `rsort_field`)."""
    return _an_fwd_impl(
        xfeat, aux, edges, table, fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl,
        fwd_bh, n_items, tile_has_work, spec, dims, interpret,
    )


def _an_fwd_impl(xfeat, aux, edges, table, fwd_t, fwd_j, fwd_b, fwd_first,
                 fwd_bl, fwd_bh, n_items, tile_has_work, spec, dims,
                 interpret):
    n_tt, n_pt, n_ch, n_words = dims
    t_ang = n_tt * n_pt
    s_ang = xfeat.shape[2]
    s = s_ang * spec.t_chunk
    c = table.shape[-1] - FDIM - n_words
    interp = _interpret_default() if interpret is None else interpret
    tid = _tile_id_map(n_tt, n_pt)

    def ie(i, cnt):
        return jnp.clip(i, 0, jnp.maximum(cnt[0] - 1, 0))

    def x_map(i, ft, fj, fb, first, fbl, fbh, cnt, aux_, edges_):
        k = ie(i, cnt)
        return (ft[k], 0, 0)

    def g_map(i, ft, fj, fb, first, fbl, fbh, cnt, aux_, edges_):
        k = ie(i, cnt)
        return (fb[k], 0, 0)

    def o_map(i, ft, fj, fb, first, fbl, fbh, cnt, aux_, edges_):
        k = ie(i, cnt)
        return (tid(ft[k], fj[k]), 0, 0)

    n_tiles_total = n_ch * t_ang
    out = pl.pallas_call(
        functools.partial(
            _an_fwd_kernel, t_ang=t_ang, n_c=c, n_words=n_words,
            n_tt=n_tt, n_pt=n_pt,
            t_chunk=spec.t_chunk, s_ang=s_ang, gate_bins=spec.gate_bins,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(spec.w_max,),
            in_specs=[
                pl.BlockSpec((1, XF_ANALYTIC, s_ang), x_map),
                pl.BlockSpec((1, spec.g_tile, table.shape[-1]), g_map),
            ],
            out_specs=pl.BlockSpec((1, c, s), o_map),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles_total, c, s), jnp.float32),
        interpret=interp,
    )(
        fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl, fwd_bh, n_items, aux, edges,
        xfeat, table,
    )
    tile_ids = jnp.arange(n_tiles_total)
    t_of = tile_ids % t_ang
    j_of = tile_ids // t_ang
    has = tile_has_work[t_of, j_of]
    return jnp.where(has[:, None, None], out, 0.0)


def _an_vjp_fwd(xfeat, aux, edges, table, fwd_t, fwd_j, fwd_b, fwd_first,
                fwd_bl, fwd_bh, bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl,
                bwd_bh, n_items, tile_has_work, blk_has_work, spec, dims,
                interpret):
    out = _an_fwd_impl(
        xfeat, aux, edges, table, fwd_t, fwd_j, fwd_b, fwd_first, fwd_bl,
        fwd_bh, n_items, tile_has_work, spec, dims, interpret,
    )
    return out, (xfeat, aux, edges, table, bwd_t, bwd_j, bwd_b, bwd_first,
                 bwd_bl, bwd_bh, n_items, blk_has_work)


def _an_vjp_bwd(spec, dims, interpret, res, go):
    (xfeat, aux, edges, table, bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl,
     bwd_bh, n_items, blk_has_work) = res
    n_tt, n_pt, n_ch, n_words = dims
    t_ang = n_tt * n_pt
    s_ang = xfeat.shape[2]
    s = s_ang * spec.t_chunk
    f_in = table.shape[-1]
    c = f_in - FDIM - n_words
    interp = _interpret_default() if interpret is None else interpret
    tid = _tile_id_map(n_tt, n_pt)

    def ie(i, cnt):
        return jnp.clip(i, 0, jnp.maximum(cnt[0] - 1, 0))

    def x_map(i, bt, bj, bb, first, bbl, bbh, cnt, aux_, edges_):
        k = ie(i, cnt)
        return (bt[k], 0, 0)

    def g_map(i, bt, bj, bb, first, bbl, bbh, cnt, aux_, edges_):
        k = ie(i, cnt)
        return (bb[k], 0, 0)

    def o_map(i, bt, bj, bb, first, bbl, bbh, cnt, aux_, edges_):
        k = ie(i, cnt)
        return (tid(bt[k], bj[k]), 0, 0)

    dtable = pl.pallas_call(
        functools.partial(
            _an_bwd_kernel, t_ang=t_ang, n_c=c, n_words=n_words,
            n_tt=n_tt, n_pt=n_pt,
            t_chunk=spec.t_chunk, s_ang=s_ang, gate_bins=spec.gate_bins,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(spec.w_max,),
            in_specs=[
                pl.BlockSpec((1, XF_ANALYTIC, s_ang), x_map),
                pl.BlockSpec((1, spec.g_tile, f_in), g_map),
                pl.BlockSpec((1, c, s), o_map),
            ],
            out_specs=pl.BlockSpec((1, spec.g_tile, f_in), g_map),
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, jnp.float32),
        interpret=interp,
    )(bwd_t, bwd_j, bwd_b, bwd_first, bwd_bl, bwd_bh, n_items, aux, edges,
      xfeat, table, go)
    # `where`, not multiply: unvisited blocks are uninitialized memory and
    # NaN * 0 = NaN (see fused_rsort._rsort_vjp_bwd).
    dtable = jnp.where(blk_has_work[:, None, None], dtable, 0.0)
    return (None, None, None, dtable) + (None,) * 15


analytic_rsort_field.defvjp(_an_vjp_fwd, _an_vjp_bwd)


def analytic_gaussian_field(
    gfeat,  # (G, 10)
    channel_weights,  # (G, C)
    grid,  # ShellGrid
    tiles: RSortTiles,
    spec: RSortSpec,
    cam,
    interpret: Optional[bool] = None,
):
    """Closed-form per-bin field (num_r, ns, ns, C) + overflow flag.

    Values are tau / bin_width — the exact bin average of the field the
    numerical kernels sample at bin centers, so the two backends are
    directly comparable (and converge to each other as bins shrink).
    """
    theta, phi, r = grid.theta, grid.phi, grid.r
    ns = theta.shape[0]
    num_r = r.shape[0]
    n_tt = pl.cdiv(ns, spec.t_theta)
    n_pt = pl.cdiv(ns, spec.t_phi)
    n_ch = pl.cdiv(num_r, spec.t_chunk)

    xfeat = analytic_ray_features(theta, phi, spec)
    aux4 = analytic_tile_aux(
        jax.lax.stop_gradient(grid.points), cam, ns, num_r, spec
    )  # (T, 4) [delta, tc]
    cam_v = jnp.asarray(cam)
    x0 = cam_v[None, :] - aux4[:, :3]
    aux = jnp.concatenate(
        [aux4, x0, jnp.zeros((aux4.shape[0], 1))], axis=1
    )  # (T, 8)
    edges = chunk_edges(r, spec)  # (n_ch, t_chunk + 1)

    gw = jnp.concatenate([gfeat, channel_weights], axis=1)
    gw_pad = pad_gather(gw, tiles.full_perm, tiles.inv_perm)
    patterns = jax.lax.stop_gradient(tiles.words.astype(jnp.float32))
    table = jnp.concatenate([gw_pad, patterns], axis=1)
    n_words = tiles.words.shape[1]
    kb = table.shape[0] // spec.g_tile
    table3 = table.reshape(kb, spec.g_tile, table.shape[-1])

    out = analytic_rsort_field(
        xfeat, aux, edges, table3,
        tiles.fwd_t, tiles.fwd_j, tiles.fwd_b, tiles.fwd_first,
        tiles.fwd_bl, tiles.fwd_bh,
        tiles.bwd_t, tiles.bwd_j, tiles.bwd_b, tiles.bwd_first,
        tiles.bwd_bl, tiles.bwd_bh,
        tiles.n_items, tiles.tile_has_work, tiles.blk_has_work,
        spec, (n_tt, n_pt, n_ch, n_words), interpret,
    )
    tp = TileSpec(t_theta=spec.t_theta, t_phi=spec.t_phi, t_r=spec.t_chunk)
    field = untile_field_t(out, ns, num_r, tp, n_tt, n_pt, n_ch)
    widths = (edges[:, 1:] - edges[:, :-1]).reshape(-1)[:num_r]
    field = field / widths[:, None, None, None]
    return field, tiles.overflowed
