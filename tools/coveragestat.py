"""Quantify kernel pair over-coverage at the benchmark scene (CPU-safe).

The work-list schedule evaluates, per item, ALL g_tile=256 block rows x all
128 tile rays x the gated radial bins. This script decomposes the ratio of
that scheduled work to the "useful" work (pairs within the 3-sigma cull
footprint) into three multiplicative slack factors:

  1. block-membership slack — block rows whose membership bit for the
     item's tile is 0 (zeroed by smask but still computed),
  2. angular slack — a member touches the 8x16 tile but its footprint
     interval covers only part of the tile's theta/phi rows,
  3. radial slack — the item's gated [bl, bh] range (the union over block
     members, at gate_bins granularity) vs each member's own bin interval.

Whichever factor dominates is the axis worth a scheduling redesign.

Run: JAX_PLATFORMS=cpu python tools/coveragestat.py [--gaussians N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--t-theta", type=int, default=8)
    ap.add_argument("--t-phi", type=int, default=16)
    ap.add_argument("--t-chunk", type=int, default=64)
    ap.add_argument("--gate-bins", type=int, default=8)
    ap.add_argument("--sigma-min", type=float, default=0.002)
    ap.add_argument("--sigma-max", type=float, default=0.012)
    args = ap.parse_args()

    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from nlos_gaussian_renderer_tpu.data.synthetic import make_ground_truth_scene
    from nlos_gaussian_renderer_tpu.ops import math as gmath
    from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
        RSortSpec,
        angular_footprints,
        rsort_cull,
        tune_rsort_spec,
    )
    from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

    rng = np.random.default_rng(0)
    volume_position = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    volume_size = 0.6
    c, delta_t = 1.0, 0.0052
    scene = make_ground_truth_scene(
        rng, args.gaussians, volume_position, volume_size
    )
    scene = dc.replace(
        scene,
        log_scales=jnp.asarray(
            rng.uniform(
                np.log(args.sigma_min), np.log(args.sigma_max),
                (args.gaussians, 3),
            ),
            jnp.float32,
        ),
    )
    box = gmath.volume_box_points(jnp.asarray(volume_position), volume_size)
    # Generous fixed caps (the tuner is a multi-minute CPU compile; the
    # stats only need the work list, not tight capacities).
    spec = RSortSpec(
        t_theta=args.t_theta, t_phi=args.t_phi,
        t_chunk=args.t_chunk, gate_bins=args.gate_bins,
        w_max=32768, max_groups=64,
    )
    print(f"spec: w_max={spec.w_max} max_groups={spec.max_groups}")

    cam = np.array([0.1, 0.0, -0.2], np.float32)
    grid = shell_grid(jnp.asarray(cam), box, 32, 100, 300, c, delta_t)
    theta, phi, r = grid.theta, grid.phi, grid.r
    scales = jnp.exp(scene.log_scales)
    tiles = rsort_cull(
        scene.means, scales, scene.alive, cam, theta, phi, r, spec
    )
    d, radius, m_th, m_ph, in_win = angular_footprints(
        scene.means, scales, scene.alive, cam, theta, phi, r, spec
    )

    n_items = int(tiles.n_items[0])
    W = n_items
    ft = np.asarray(tiles.fwd_t[:W])
    fj = np.asarray(tiles.fwd_j[:W])
    fb = np.asarray(tiles.fwd_b[:W])
    fbl = np.asarray(tiles.fwd_bl[:W])
    fbh = np.asarray(tiles.fwd_bh[:W])
    words = np.asarray(tiles.words)  # (G_pad, P) packed patterns
    full_perm = np.asarray(tiles.full_perm)  # padded slot -> original row

    num_r = r.shape[0]
    ns = 32
    n_tt = -(-ns // spec.t_theta)
    n_pt = -(-ns // spec.t_phi)
    s_ang = spec.t_theta * spec.t_phi

    # Decode the packed footprint-rectangle words into per-tile membership.
    from nlos_gaussian_renderer_tpu.ops.fused_rsort import decode_rect_members

    memb = np.asarray(decode_rect_members(words[:, 0], n_tt, n_pt))

    # Per padded row: original Gaussian's footprint geometry.
    valid_row = full_perm >= 0
    rows = np.where(valid_row, full_perm, 0)
    d_r = np.asarray(d)[rows]
    rad_r = np.asarray(radius)[rows]
    m_th_r = np.asarray(m_th)[rows]  # (g_pad, n_tt)
    m_ph_r = np.asarray(m_ph)[rows]
    in_r = np.asarray(in_win)[rows] & valid_row

    # Per-row radial bin interval [lo, hi] clamped to the grid.
    rv = np.asarray(r)
    dr = float(rv[1] - rv[0])
    lo_bin = np.clip(np.floor((d_r - rad_r - rv[0]) / dr), 0, num_r - 1)
    hi_bin = np.clip(np.ceil((d_r + rad_r - rv[0]) / dr), 0, num_r - 1)

    # Per-row angular ray count inside one tile: fraction of theta rows /
    # phi cols of the tile the footprint interval covers. Approximate with
    # the exact per-ray angular windows.
    th_v = np.asarray(theta)
    ph_v = np.asarray(phi)
    sph = np.asarray(
        gmath.cartesian_to_spherical(
            scene.means - jnp.asarray(cam)[None, :]
        )
    )
    alpha = np.arcsin(np.clip(np.asarray(radius) / np.asarray(d), -1, 1))
    th_lo = sph[:, 1] - alpha
    th_hi = sph[:, 1] + alpha
    sin_min = np.maximum(
        np.minimum(np.sin(np.clip(th_lo, 0, np.pi)),
                   np.sin(np.clip(th_hi, 0, np.pi))), 1e-3
    )
    dphi = np.arcsin(np.clip(np.asarray(radius) / (np.asarray(d) * sin_min), -1, 1))
    ph_lo = sph[:, 2] - dphi
    ph_hi = sph[:, 2] + dphi

    th_cov = ((th_v[None, :] >= th_lo[:, None])
              & (th_v[None, :] <= th_hi[:, None]))  # (G, 32)
    ph_cov = ((ph_v[None, :] >= ph_lo[:, None])
              & (ph_v[None, :] <= ph_hi[:, None]))

    th_cov_r = th_cov[rows]
    ph_cov_r = ph_cov[rows]

    # Scheduled work: per item, g_tile rows x s_ang rays x gated bins.
    gate = spec.gate_bins
    g_lo = (fbl // gate) * gate
    g_hi = (fbh // gate + 1) * gate
    gated_bins = np.minimum(g_hi, spec.t_chunk) - g_lo
    sched_pairs = float(np.sum(gated_bins)) * spec.g_tile * s_ang

    # Member work: rows with the membership bit set, same ray/bin coverage.
    tile_of = fj * (n_tt * n_pt) + ft  # not needed; memb indexed by ft only
    blk = fb
    member_pairs = 0.0
    angular_pairs = 0.0
    useful_pairs = 0.0
    for i in range(W):
        t = ft[i]
        rows_i = slice(blk[i] * spec.g_tile, (blk[i] + 1) * spec.g_tile)
        mem = memb[rows_i, t] & in_r[rows_i]
        nb = gated_bins[i]
        member_pairs += mem.sum() * s_ang * nb
        if not mem.any():
            continue
        tt, pt = divmod(t, n_pt)
        th_sl = th_cov_r[rows_i][:, tt * spec.t_theta:(tt + 1) * spec.t_theta]
        ph_sl = ph_cov_r[rows_i][:, pt * spec.t_phi:(pt + 1) * spec.t_phi]
        rays = th_sl.sum(1) * ph_sl.sum(1)  # per-row rays actually covered
        angular_pairs += float((mem * rays).sum()) * nb
        # Per-row bins inside THIS chunk's gated window.
        ch0 = fj[i] * spec.t_chunk
        blo = np.maximum(lo_bin[rows_i] - ch0, g_lo[i])
        bhi = np.minimum(hi_bin[rows_i] - ch0, g_lo[i] + nb - 1)
        nbins = np.maximum(bhi - blo + 1, 0)
        useful_pairs += float((mem * rays * nbins).sum())

    print(f"items: {W}, scheduled pairs: {sched_pairs:.3e}")
    print(f"member pairs:  {member_pairs:.3e}  "
          f"(block-membership slack x{sched_pairs / max(member_pairs,1):.2f})")
    print(f"angular pairs: {angular_pairs:.3e}  "
          f"(angular slack x{member_pairs / max(angular_pairs,1):.2f})")
    print(f"useful pairs:  {useful_pairs:.3e}  "
          f"(radial slack x{angular_pairs / max(useful_pairs,1):.2f})")
    print(f"TOTAL over-coverage: "
          f"x{sched_pairs / max(useful_pairs, 1):.2f}")


if __name__ == "__main__":
    main()
