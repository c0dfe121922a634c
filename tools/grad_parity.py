"""Hardware gradient parity: rsort backward vs chunked-dense ground truth.

VERDICT r3 #1: the blueprint pairs the <10 ms headline with a gradient-parity
row (BASELINE.md "≤ 1e-5"), but the exact bf16x3 backward's actual hardware
gradient error had never been quantified — the test gate (7e-3
max-normalized) is a CPU-interpret-mode bound, not a measurement. This tool
measures it at the HEADLINE scene: 100k Gaussians, 32x32 angular grid,
200 radial bins, the bench's trained-scene scale distribution and tuned
rsort caps.

Ground truth: the dense no-occlusion field (reference semantics,
`gaussian_model.py:346-364` -> `nlos_helpers.py:192-232`) evaluated through
a Gaussian-chunked `lax.scan` (exact — the no-occlusion histogram is linear
in per-Gaussian contributions, so chunked accumulation in f32-HIGHEST
introduces only summation-order noise), differentiated with `jax.grad`
through `jax.checkpoint`ed chunk bodies so the (A, N) matrix never
materializes (A = 204,800, N = 100k -> 82 GB dense).

Measured quantities per parameter group (means, log_scales, quats,
logit_opacities, sh_dc), worst case over 3 probe scan points:
  rel_l2   = ||g_rsort - g_dense|| / ||g_dense||
  max_norm = max|g_rsort - g_dense| / max|g_dense|   (the test-gate metric)

Both backward precisions are measured: the exact bf16x3 contraction
(bwd_p_bf16=False, the headline default) and the single-pass bf16 opt-in.
NOTE the measured error folds in BOTH arithmetic precision AND the 3-sigma
culling truncation (dense integrates full tails); the sigma_cull=5 row
isolates the former.

Writes docs/grad_parity_100k.json. Run on the TPU:
  python tools/grad_parity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--chunk", type=int, default=256,
                    help="dense ground-truth Gaussian chunk")
    ap.add_argument("--sigma-min", type=float, default=0.002)
    ap.add_argument("--sigma-max", type=float, default=0.012)
    ap.add_argument("--ns", type=int, default=32,
                    help="angular grid side (bisection aid)")
    ap.add_argument("--start", type=int, default=100)
    ap.add_argument("--end", type=int, default=300)
    ap.add_argument("--rows", default="sigma3,sigma5,bf16",
                    help="comma list of rows to measure")
    ap.add_argument("--gate-bins", type=int, default=8)
    ap.add_argument("--t-chunk", type=int, default=0,
                    help="0 = single chunk covering all bins")
    ap.add_argument("--fd", action="store_true",
                    help="directional finite-difference arbitration: for "
                         "each parameter group, probe along the two analytic "
                         "gradient directions (g_dense-hat and g_rsort-hat) "
                         "with central differences of BOTH the dense and the "
                         "rsort forward, plus an eps=0 noise-floor estimate")
    ap.add_argument("--out", default="docs/grad_parity_100k.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (interpret-mode kernels) — bisection "
                         "aid while the chip is busy")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from nlos_gaussian_renderer_tpu.data.synthetic import (
        make_ground_truth_scene,
    )
    from nlos_gaussian_renderer_tpu.ops import math as gmath
    from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
        RSortSpec,
        tune_rsort_spec,
    )
    from nlos_gaussian_renderer_tpu.ops.render import (
        RenderSettings,
        mse_loss,
        render_transient,
        view_albedo,
    )
    from nlos_gaussian_renderer_tpu.ops.sampling import (
        attenuation_weights,
        shell_grid,
    )

    log(f"devices: {jax.devices()}")

    # Exact bench geometry (bench.py:126-160).
    rng = np.random.default_rng(0)
    volume_position = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    volume_size = 0.6
    c, delta_t = 1.0, 0.0052
    ns, start, end = args.ns, args.start, args.end
    num_r, ns2 = end - start, ns * ns

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
    vol = jnp.asarray(volume_position)
    target = jnp.asarray(rng.random(num_r).astype(np.float32))
    probe_cams = np.stack(
        [[-0.4, 0, -0.4], [0, 0, 0], [0.4, 0, 0.4]]
    ).astype(np.float32)

    GROUPS = ("means", "log_scales", "quats", "logit_opacities", "sh_dc")

    # ---- chunked-dense ground-truth gradient ----------------------------
    def loss_dense_chunked(sc, cam):
        grid = shell_grid(cam, box, ns, start, end, c, delta_t)
        points = jax.lax.stop_gradient(grid.points.reshape(-1, 3))
        xfeat = gmath.point_monomials(points)  # (A, 10)
        gfeat = sc.quadratic_form(1.0)  # (N, 10)
        w = sc.opacities[:, 0] * view_albedo(sc, cam, 0)  # (N,)
        n = gfeat.shape[0]
        chunk = min(args.chunk, n)
        pad = (-n) % chunk
        n_chunks = (n + pad) // chunk
        gf_c = jnp.pad(gfeat, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
        w_c = jnp.pad(w, (0, pad)).reshape(n_chunks, chunk)

        @jax.checkpoint
        def body(acc, xs):
            gf, wc = xs
            maha = gmath.mahalanobis_matmul(xfeat, gf)  # (A, chunk)
            p = jnp.exp(-0.5 * maha)
            contrib = jnp.einsum(
                "an,n->a", p, wc, precision=jax.lax.Precision.HIGHEST
            )
            return acc + contrib, None

        a = xfeat.shape[0]
        field, _ = jax.lax.scan(body, jnp.zeros((a,), jnp.float32), (gf_c, w_c))
        result = field.reshape(num_r, ns2) * attenuation_weights(grid)
        result = result * (vol[1] ** 2)
        hist = jnp.sum(result, axis=1) * grid.dtheta * grid.dphi
        return mse_loss(hist, target)[0], hist

    grad_dense = jax.jit(jax.grad(loss_dense_chunked, has_aux=True))

    # ---- rsort gradient (exact bench settings) --------------------------
    def rsort_settings(spec):
        from nlos_gaussian_renderer_tpu.ops.fused import TileSpec

        return RenderSettings(
            num_sampling_points=ns, start=start, end=end,
            backend="pallas_rsort",
            tile_spec=TileSpec(t_theta=8, t_phi=16, t_r=64, k_max=16384),
            rsort_spec=spec,
        )

    def loss_rsort(sc, cam, settings):
        _, hist, ovf = render_transient(
            sc, cam, box, c, delta_t, vol, 0, settings
        )
        return mse_loss(hist, target)[0], ovf

    def measure(spec, grads_dense, tag):
        settings = rsort_settings(spec)
        gfn = jax.jit(
            jax.grad(loss_rsort, has_aux=True),
            static_argnames=("settings",),
        )
        # Forward-field parity first: localizes any divergence to the
        # forward kernel vs the backward contraction.
        hist_rel = 0.0
        for i, cam in enumerate(probe_cams):
            hd = hists_dense[i]
            _, hist_r, ovf = render_transient(
                scene, jnp.asarray(cam), box, c, delta_t, vol, 0, settings
            )
            hr = np.asarray(hist_r, np.float64)
            hd = np.asarray(hd, np.float64)
            hist_rel = max(
                hist_rel,
                float(np.linalg.norm(hr - hd) / (np.linalg.norm(hd) + 1e-30)),
            )
        log(f"[{tag}] forward hist rel_l2 (worst cam): {hist_rel:.3e}")
        rows = {g: {"rel_l2": 0.0, "max_norm": 0.0} for g in GROUPS}
        rows["_forward_hist"] = {"rel_l2": hist_rel}
        for i, cam in enumerate(probe_cams):
            gr, ovf = gfn(scene, jnp.asarray(cam), settings)
            if bool(ovf):
                # A saturated culling capacity silently truncates the
                # field — the parity number would measure the truncation,
                # not the kernel. Fail loudly instead.
                raise RuntimeError(
                    f"culling capacity overflow at cam {i} under {tag} — "
                    "re-tune the caps before measuring parity"
                )
            gd = grads_dense[i]
            for name in GROUPS:
                a = np.asarray(getattr(gr, name), np.float64)
                b = np.asarray(getattr(gd, name), np.float64)
                rel = float(
                    np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
                )
                mx = float(
                    np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
                )
                rows[name]["rel_l2"] = max(rows[name]["rel_l2"], rel)
                rows[name]["max_norm"] = max(rows[name]["max_norm"], mx)
        log(f"[{tag}] " + "  ".join(
            f"{g}: l2={rows[g]['rel_l2']:.2e} max={rows[g]['max_norm']:.2e}"
            for g in GROUPS
        ))
        return rows

    # Tune caps once at sigma_cull=3 (bench default); retune for the
    # truncation-isolation row.
    t0 = time.time()
    gate_bins = args.gate_bins
    t_chunk = args.t_chunk or -(-num_r // gate_bins) * gate_bins
    base = RSortSpec(t_chunk=t_chunk, gate_bins=gate_bins)
    spec3 = tune_rsort_spec(
        scene, probe_cams, box, ns, start, end, c, delta_t, base=base
    )
    log(f"tuned sigma_cull=3 caps: max_groups={spec3.max_groups} "
        f"w_max={spec3.w_max} ({time.time()-t0:.0f}s)")
    want = set(args.rows.split(","))
    spec5 = None
    if "sigma5" in want:
        base5 = base._replace(sigma_cull=5.0)
        spec5 = tune_rsort_spec(
            scene, probe_cams, box, ns, start, end, c, delta_t, base=base5
        )
        log(f"tuned sigma_cull=5 caps: max_groups={spec5.max_groups} "
            f"w_max={spec5.w_max}")

    t0 = time.time()
    gd_pairs = [grad_dense(scene, jnp.asarray(cam)) for cam in probe_cams]
    grads_dense = jax.tree_util.tree_map(
        np.asarray, [g for g, _ in gd_pairs]
    )
    hists_dense = [np.asarray(h) for _, h in gd_pairs]
    log(f"chunked-dense ground truth done in {time.time()-t0:.0f}s "
        f"(chunk={args.chunk})")

    gt_noise = None
    if "gtnoise" in set(args.rows.split(",")):
        # The ground truth's own noise floor: the same dense gradient with a
        # different summation order (2x the chunk). Any rsort-vs-dense
        # parity number is only meaningful relative to this.
        args2 = args.chunk * 2

        def loss_dense2(sc, cam):
            grid = shell_grid(cam, box, ns, start, end, c, delta_t)
            points = jax.lax.stop_gradient(grid.points.reshape(-1, 3))
            xf = gmath.point_monomials(points)
            gf = sc.quadratic_form(1.0)
            w = sc.opacities[:, 0] * view_albedo(sc, cam, 0)
            n = gf.shape[0]
            pad = (-n) % args2
            gf_c = jnp.pad(gf, ((0, pad), (0, 0))).reshape(
                (n + pad) // args2, args2, -1
            )
            w_c = jnp.pad(w, (0, pad)).reshape((n + pad) // args2, args2)

            @jax.checkpoint
            def body(acc, xs):
                g2, wc = xs
                p = jnp.exp(-0.5 * gmath.mahalanobis_matmul(xf, g2))
                return acc + jnp.einsum(
                    "an,n->a", p, wc, precision=jax.lax.Precision.HIGHEST
                ), None

            field, _ = jax.lax.scan(
                body, jnp.zeros((xf.shape[0],), jnp.float32), (gf_c, w_c)
            )
            r2 = field.reshape(num_r, ns2) * attenuation_weights(grid)
            hist = jnp.sum(r2 * (vol[1] ** 2), axis=1) * grid.dtheta * grid.dphi
            return mse_loss(hist, target)[0]

        g2fn = jax.jit(jax.grad(loss_dense2))
        gt_noise = {g: 0.0 for g in GROUPS}
        for i, cam in enumerate(probe_cams):
            g2 = g2fn(scene, jnp.asarray(cam))
            for name in GROUPS:
                a = np.asarray(getattr(g2, name), np.float64)
                b = np.asarray(getattr(grads_dense[i], name), np.float64)
                rel = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))
                gt_noise[name] = max(gt_noise[name], rel)
        log("[gtnoise] dense GT self-noise (chunk x2), worst cam: " + "  ".join(
            f"{g}: {gt_noise[g]:.2e}" for g in GROUPS
        ))

    fd_record = None
    if args.fd:
        # Directional-derivative arbitration. Both forwards agree in value;
        # if FD of BOTH forwards matches one analytic gradient and not the
        # other, the other backward is wrong.
        fd_record = {}
        settings3 = rsort_settings(spec3)
        ldense = jax.jit(lambda sc, cam: loss_dense_chunked(sc, cam)[0])
        lrsort = jax.jit(
            lambda sc, cam, st: loss_rsort(sc, cam, st)[0],
            static_argnames=("st",),
        )
        lrsort_ovf = jax.jit(
            lambda sc, cam, st: loss_rsort(sc, cam, st),
            static_argnames=("st",),
        )
        gfn3 = jax.jit(
            jax.grad(loss_rsort, has_aux=True), static_argnames=("settings",)
        )
        cam = jnp.asarray(probe_cams[1])
        gd = grads_dense[1]
        gr, _ = gfn3(scene, cam, settings3)
        log(f"[fd] L_dense={float(ldense(scene, cam)):.8e} "
            f"L_rsort={float(lrsort(scene, cam, settings3)):.8e}")
        for name in GROUPS:
            x = np.asarray(getattr(scene, name))
            a = np.asarray(getattr(gr, name), np.float64)
            b = np.asarray(getattr(gd, name), np.float64)
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            cosab = float((a * b).sum() / (na * nb + 1e-30))
            log(f"[fd:{name}] ||g_dense||={nb:.4e} ||g_rsort||={na:.4e} "
                f"cos={cosab:+.4f}")
            fd_record[name] = {
                "norm_dense": float(nb), "norm_rsort": float(na),
                "cos": cosab, "dirs": {},
            }
            # FD along each analytic gradient direction, through BOTH
            # forwards. The true directional derivative along v-hat is
            # <g_true, v-hat>; if dense is right, FD along g_dense-hat ==
            # ||g_dense|| and FD along g_rsort-hat == <g_dense, g_rsort-hat>.
            # Probing the rsort forward too distinguishes "rsort backward
            # wrong" from "rsort forward is a different (gated/truncated)
            # function whose gradient is correct".
            for tag, g in (("gdense", b), ("grsort", a)):
                v = (g / (np.linalg.norm(g) + 1e-30)).astype(np.float32)
                pred_d = float((b * v).sum())
                pred_r = float((a * v).sum())
                # eps=0 noise floor: f32 forward scatter at the base point.
                def ev_pair(sign, eps):
                    sc2 = dc.replace(
                        scene, **{name: jnp.asarray(x + sign * eps * v)}
                    )
                    ld = float(ldense(sc2, cam))
                    hr, ovf = lrsort_ovf(sc2, cam, settings3)
                    if bool(ovf):
                        log(f"[fd:{name}] WARNING: culling overflow at "
                            f"perturbed point (dir={tag} eps={eps:.0e} "
                            f"sign={sign:+.0f}) — rsort FD row is truncated")
                    return ld, float(hr)
                l0d_a, l0r_a = ev_pair(+1.0, 0.0)
                l0d_b, l0r_b = ev_pair(-1.0, 0.0)
                log(f"[fd:{name}] dir={tag} noise floor: "
                    f"dense={abs(l0d_a-l0d_b):.3e} "
                    f"rsort={abs(l0r_a-l0r_b):.3e} (|L(+0)-L(-0)|)")
                drec = {
                    "pred_dense": pred_d, "pred_rsort": pred_r,
                    "noise_floor_dense": abs(l0d_a - l0d_b),
                    "noise_floor_rsort": abs(l0r_a - l0r_b),
                    "eps": {},
                }
                fd_record[name]["dirs"][tag] = drec
                for eps in (3e-3, 1e-3):
                    lpd, lpr = ev_pair(+1.0, eps)
                    lmd, lmr = ev_pair(-1.0, eps)
                    fd_d = (lpd - lmd) / (2 * eps)
                    fd_r = (lpr - lmr) / (2 * eps)
                    log(f"[fd:{name}] dir={tag} eps={eps:.0e} "
                        f"fd_dense={fd_d:+.6e} fd_rsort={fd_r:+.6e} "
                        f"pred_dense={pred_d:+.6e} pred_rsort={pred_r:+.6e}")
                    drec["eps"][f"{eps:.0e}"] = {
                        "fd_dense": fd_d, "fd_rsort": fd_r,
                    }

    out = {
        "scene": {
            "gaussians": args.gaussians, "angular_grid": [ns, ns],
            "bins": [start, end],
            "sigma_range_m": [args.sigma_min, args.sigma_max],
            "probe_cams": probe_cams.tolist(),
        },
        "ground_truth": (
            f"dense no-occlusion field, lax.scan over {args.chunk}-Gaussian "
            "chunks, f32 HIGHEST matmuls, jax.checkpoint bodies"
        ),
        "metrics": {
            "rel_l2": "||g_rsort-g_dense||_2 / ||g_dense||_2, worst of 3 cams",
            "max_norm": "max|g_rsort-g_dense| / max|g_dense|, worst of 3 cams",
        },
        "platform": str(jax.devices()),
        "rows": {},
    }
    if gt_noise is not None:
        out["rows"]["dense_gt_self_noise_chunk_x2"] = {
            g: {"rel_l2": gt_noise[g]} for g in GROUPS
        }
    if "sigma3" in want:
        out["rows"]["exact_bf16x3_sigma3"] = measure(
            spec3, grads_dense, "exact bf16x3, sigma_cull=3 (headline config)"
        )
    if "sigma5" in want:
        out["rows"]["exact_bf16x3_sigma5"] = measure(
            spec5, grads_dense,
            "exact bf16x3, sigma_cull=5 (truncation isolated)"
        )
    if "bf16" in want:
        out["rows"]["bf16_backward_sigma3"] = measure(
            spec3._replace(bwd_p_bf16=True), grads_dense,
            "bf16 single-pass backward, sigma_cull=3 (opt-in)"
        )
    if "masked" in want:
        out["rows"]["exact_masked_sigma3"] = measure(
            spec3._replace(mask_dead_blocks=True), grads_dense,
            "exact bf16x3 + mask_dead_blocks (dead-block garbage probe)"
        )
    if "xlaws" in want:
        out["rows"]["exact_xlaws_sigma3"] = measure(
            spec3._replace(ws_pallas=False), grads_dense,
            "exact bf16x3 + XLA work-list builder (builder probe)"
        )
    if "nogate" in want:
        out["rows"]["exact_nogate_sigma3"] = measure(
            spec3._replace(gate_bins=spec3.t_chunk), grads_dense,
            "exact bf16x3 + single gate (gate-ladder probe)"
        )
    if "maskeq" in want:
        # Dead-block-safety invariant (VERDICT r4 #5): the flagship path
        # skips the post-kernel dead-block mask on a prose proof that the
        # pad_gather backward never reads never-visited blocks. Check it ON
        # HARDWARE: gradients with mask_dead_blocks on/off must be
        # BIT-IDENTICAL at every probe cam.
        gfn_m = jax.jit(
            jax.grad(loss_rsort, has_aux=True), static_argnames=("settings",)
        )
        worst = 0.0
        for i, cam in enumerate(probe_cams):
            g_off, _ = gfn_m(
                scene, jnp.asarray(cam), rsort_settings(spec3)
            )
            g_on, _ = gfn_m(
                scene, jnp.asarray(cam),
                rsort_settings(spec3._replace(mask_dead_blocks=True)),
            )
            for name in GROUPS:
                a = np.asarray(getattr(g_off, name))
                b = np.asarray(getattr(g_on, name))
                d = float(np.abs(a - b).max())
                worst = max(worst, d)
        log(f"[maskeq] max |grad(mask off) - grad(mask on)| over cams/groups:"
            f" {worst:.3e}")
        out["rows"]["dead_block_mask_equality"] = {
            "max_abs_grad_diff": worst,
            "bit_identical": worst == 0.0,
        }

    if fd_record is not None:
        out["fd_arbitration_cam1"] = fd_record

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # Merge into an existing artifact: probe runs (--rows maskeq etc.) add
    # rows without clobbering previously measured ones.
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if prev.get("scene") == out["scene"]:
                prev_rows = prev.get("rows", {})
                prev_rows.update(out["rows"])
                prev.update(out)
                prev["rows"] = prev_rows
                out = prev
        except (json.JSONDecodeError, OSError):
            pass
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
