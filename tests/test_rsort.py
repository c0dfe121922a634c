"""Parity + gradient tests for the distance-sorted range-culled backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_gaussian_renderer_tpu.models.scene import GaussianScene, init_scene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
    RSortSpec,
    decode_rect_members,
    rsort_cull,
)
from nlos_gaussian_renderer_tpu.ops.render import (
    RenderSettings,
    mse_loss,
    render_transient,
)
from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

VOL_POS = jnp.array([0.0, 1.0, 0.0])
VOL_SIZE = 0.6
C, DT = 1.0, 0.01
BOX = gmath.volume_box_points(VOL_POS, VOL_SIZE)
CAM = jnp.array([0.05, 0.0, -0.1])

SPEC = RSortSpec(t_theta=4, t_phi=8, t_chunk=8, g_tile=32, w_max=256,
                 max_groups=16)
SETTINGS = RenderSettings(
    num_sampling_points=8, start=60, end=140, backend="pallas_rsort",
    rsort_spec=SPEC,
)
DENSE = SETTINGS._replace(backend="dense")


def make_scene(n=40, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.asarray(VOL_POS) + rng.uniform(-0.25, 0.25, size=(n, 3))
    scene = init_scene(
        pts.astype(np.float32),
        rng.uniform(0.2, 0.8, size=(n, 1)).astype(np.float32),
        np.asarray(VOL_POS) - VOL_SIZE / 2, np.asarray(VOL_POS) + VOL_SIZE / 2,
        max_sh_degree=1, knn_scale_init=False,
    )
    return GaussianScene(
        means=scene.means,
        log_scales=jnp.asarray(rng.uniform(-4.0, -2.5, (n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
        sh_dc=scene.sh_dc,
        sh_rest=0.1 * jnp.asarray(rng.normal(size=scene.sh_rest.shape), jnp.float32),
        alive=scene.alive,
    )


class TestRSortCull:
    def test_ranges_cover_relevant_gaussians(self):
        scene = make_scene(48, seed=1)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        tiles = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        assert not bool(tiles.overflowed)
        rel = np.asarray(gmath.cartesian_to_spherical(scene.means - CAM))
        # Padded-slot membership (decoded rect words), per original gaussian.
        inv = np.asarray(tiles.inv_perm)
        words = np.asarray(tiles.words)
        memb = np.asarray(decode_rect_members(words[:, 0], 2, 1))
        n_items = int(tiles.n_items[0])
        work = set(zip(np.asarray(tiles.fwd_t)[:n_items].tolist(),
                       np.asarray(tiles.fwd_j)[:n_items].tolist(),
                       np.asarray(tiles.fwd_b)[:n_items].tolist()))
        r = np.asarray(grid.r)
        theta, phi = np.asarray(grid.theta), np.asarray(grid.phi)
        n_ch = (80 + SPEC.t_chunk - 1) // SPEC.t_chunk
        # every gaussian center strictly inside a tile's angular bounds and
        # the radial window must appear in that tile's list, in the right
        # block range for its chunk. (Centers in the gap between tile bounds
        # are covered via footprint overlap and are skipped here.)
        th_tiles = theta.reshape(-1, SPEC.t_theta)
        ph_tiles = phi.reshape(-1, SPEC.t_phi)
        for g in range(48):
            d, th, ph = rel[g]
            if not (r[0] <= d <= r[-1]):
                continue
            tts = [k for k in range(th_tiles.shape[0])
                   if th_tiles[k, 0] <= th <= th_tiles[k, -1]]
            pts = [k for k in range(ph_tiles.shape[0])
                   if ph_tiles[k, 0] <= ph <= ph_tiles[k, -1]]
            if not tts or not pts:
                continue
            t = tts[0] * ph_tiles.shape[0] + pts[0]
            j = min(int((d - r[0]) / (SPEC.t_chunk * (r[1] - r[0]))), n_ch - 1)
            slot = int(inv[g])
            assert slot < words.shape[0], (g, t)  # not culled
            assert memb[slot, t], (g, t)
            blk = slot // SPEC.g_tile
            assert (t, j, blk) in work, (g, t, j, blk)

    def test_groups_block_aligned_and_d_sorted(self):
        """Each pattern group occupies whole g_tile blocks and is d-ascending
        within itself — the invariant that makes per-block radial intervals
        tight."""
        scene = make_scene(32, seed=2)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        tiles = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        d = np.linalg.norm(np.asarray(scene.means) - np.asarray(CAM), axis=1)
        words = np.asarray(tiles.words)
        full_perm = np.asarray(tiles.full_perm)
        occupied = (words != 0).any(axis=1)
        slots = np.where(occupied)[0]
        # Block-aligned: a group's first slot is a multiple of g_tile.
        starts = [
            s for s in slots
            if s % SPEC.g_tile == 0
            or (words[s] != words[s - 1]).any()
        ]
        for s in starts:
            if (s > 0 and occupied[s - 1]
                    and (words[s] != words[s - 1]).any()):
                assert s % SPEC.g_tile == 0, s
        # d-ascending within each group (contiguous equal-pattern slot runs).
        # Padding/culled slots hold the sentinel index G (zero row).
        ds = d[np.minimum(full_perm, len(d) - 1)]
        for i in range(1, len(slots)):
            a, b = slots[i - 1], slots[i]
            if b == a + 1 and (words[a] == words[b]).all():
                assert ds[a] <= ds[b] + 1e-6, (a, b)


class TestRSortParity:
    @pytest.mark.parametrize("occ", [False, True])
    def test_histogram_parity(self, occ):
        scene = make_scene(48, seed=3)
        s_r = SETTINGS._replace(occlusion=occ)
        s_d = DENSE._replace(occlusion=occ)
        _, hr, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_r)
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_d)
        np.testing.assert_allclose(hr, hd, rtol=3e-3, atol=1e-9)

    def test_gradient_parity(self):
        scene = make_scene(32, seed=4)
        target = jnp.ones(SETTINGS.num_bins) * 0.1

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        gr = jax.grad(lambda sc: loss(sc, SETTINGS))(scene)
        gd = jax.grad(lambda sc: loss(sc, DENSE))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities", "sh_dc"):
            a, b = np.asarray(getattr(gr, name)), np.asarray(getattr(gd, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=7e-3,
                                       err_msg=name)

    def test_histogram_parity_fwd_bf16(self):
        """bf16 forward channel contraction: per-term bf16 error averages
        down over the Gaussian sum — histograms stay within ~1e-3 of dense."""
        scene = make_scene(48, seed=3)
        s16 = SETTINGS._replace(rsort_spec=SPEC._replace(fwd_p_bf16=True))
        _, h16, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s16)
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, DENSE)
        rel = float(jnp.linalg.norm(h16 - hd) / (jnp.linalg.norm(hd) + 1e-12))
        assert rel < 2e-3, rel
        # Occlusion path (C=2) too.
        s16o = s16._replace(occlusion=True)
        _, h16o, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s16o)
        _, hdo, _ = render_transient(
            scene, CAM, BOX, C, DT, VOL_POS, 1, DENSE._replace(occlusion=True)
        )
        rel = float(
            jnp.linalg.norm(h16o - hdo) / (jnp.linalg.norm(hdo) + 1e-12)
        )
        assert rel < 2e-3, rel

    def test_gradient_parity_bf16_bwd(self):
        """The single-pass bf16 backward variant tracks the dense gradients
        at ~bf16 resolution (forward output is untouched by the flag)."""
        scene = make_scene(32, seed=4)
        target = jnp.ones(SETTINGS.num_bins) * 0.1
        s16 = SETTINGS._replace(rsort_spec=SPEC._replace(bwd_p_bf16=True))

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        g16 = jax.grad(lambda sc: loss(sc, s16))(scene)
        gd = jax.grad(lambda sc: loss(sc, DENSE))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities", "sh_dc"):
            a, b = np.asarray(getattr(g16, name)), np.asarray(getattr(gd, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                       err_msg=name)
        # And the forward histogram is bit-level unaffected by the flag.
        _, h16, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s16)
        _, h32, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, SETTINGS)
        np.testing.assert_array_equal(np.asarray(h16), np.asarray(h32))

    def test_gradient_parity_bf16_exp_bwd(self):
        """bwd_exp_bf16 (bf16-argument exp feeding the bf16 contraction)
        stays inside the bwd_p_bf16 tolerance band: the |m| * 2^-9 argument
        quantization is only large deep in the Gaussian tail where p itself
        is negligible."""
        scene = make_scene(32, seed=4)
        target = jnp.ones(SETTINGS.num_bins) * 0.1
        s16 = SETTINGS._replace(
            rsort_spec=SPEC._replace(bwd_p_bf16=True, bwd_exp_bf16=True)
        )

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        g16 = jax.grad(lambda sc: loss(sc, s16))(scene)
        gd = jax.grad(lambda sc: loss(sc, DENSE))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities", "sh_dc"):
            a, b = np.asarray(getattr(g16, name)), np.asarray(getattr(gd, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                       err_msg=name)
        # Forward histogram is bit-level unaffected by the backward flags.
        _, h16, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s16)
        _, h32, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, SETTINGS)
        np.testing.assert_array_equal(np.asarray(h16), np.asarray(h32))

    def test_matches_pallas_tile_backend(self):
        from nlos_gaussian_renderer_tpu.ops.fused import TileSpec

        scene = make_scene(40, seed=5)
        s_t = SETTINGS._replace(
            backend="pallas",
            tile_spec=TileSpec(t_theta=4, t_phi=8, t_r=16, k_max=64,
                               a_sub=256, g_tile=32),
        )
        _, hr, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, SETTINGS)
        _, ht, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_t)
        # atol floor at 1e-3 of the histogram peak: the rsort kernels'
        # radial gating drops SUB-CUTOFF tail mass that the tile backend's
        # whole-tile evaluation keeps — edge bins whose entire signal is
        # 3-sigma tail mass differ by that (bounded, tiny) absolute amount.
        np.testing.assert_allclose(
            np.asarray(hr), np.asarray(ht), rtol=3e-3,
            atol=1e-3 * float(np.max(np.abs(ht))),
        )


class TestFrozenLayout:
    """Chunk-frozen sorted block layout (opt-in; measured slower at the
    bench geometry but exactness must hold wherever it is enabled)."""

    REF = jnp.array([0.12, 0.0, 0.08])  # displaced reference camera
    SLACK = 0.35  # > |REF - CAM| with margin

    def _layout(self, scene, spec, slack=None):
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import rsort_layout

        grid0 = shell_grid(self.REF, BOX, 8, 60, 140, C, DT)
        return rsort_layout(
            scene.means, scene.scales, scene.alive, self.REF,
            grid0.theta, grid0.phi, grid0.r, spec,
            slack=self.SLACK if slack is None else slack,
        )

    def test_histogram_exact_vs_fresh_layout(self):
        """A layout built from a DIFFERENT camera (within slack) must render
        the actual camera's histogram identically: words and block interval
        unions are recomputed exactly per step."""
        scene = make_scene(48, seed=3)
        spec = SPEC._replace(w_max=1024, max_groups=32)
        layout = self._layout(scene, spec)
        s = SETTINGS._replace(rsort_spec=spec)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        t_fresh = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, spec,
        )
        t_froz = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, spec, layout=layout,
        )
        assert not bool(t_froz.overflowed)
        # Same per-Gaussian footprint words, independent of slot placement.
        inv_fresh = np.asarray(t_fresh.inv_perm)
        inv_froz = np.asarray(t_froz.inv_perm)
        w_fresh = np.asarray(t_fresh.words)[:, 0]
        w_froz = np.asarray(t_froz.words)[:, 0]
        for g in range(48):
            a, b = inv_fresh[g], inv_froz[g]
            wa = w_fresh[a] if a < len(w_fresh) else 0
            wb = w_froz[b] if b < len(w_froz) else 0
            assert wa == wb, g
        # And the layout-path histogram matches dense at the usual tolerance.
        _, hf, _ = render_transient(
            scene, CAM, BOX, C, DT, VOL_POS, 1, s, layout=layout
        )
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, DENSE)
        np.testing.assert_allclose(hf, hd, rtol=3e-3, atol=1e-9)

    def test_missed_gaussian_raises_overflow(self):
        """A step-valid Gaussian with no slot in a stale layout must raise
        the overflow flag (detection guarantee) — never drop silently."""
        scene = make_scene(32, seed=5)
        spec = SPEC._replace(w_max=1024, max_groups=32)
        # Zero slack + a reference camera far outside the slack contract:
        # some Gaussians valid for CAM fall outside the layout's window.
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import rsort_layout

        far = jnp.array([0.0, 0.0, -0.9])
        grid0 = shell_grid(far, BOX, 8, 60, 140, C, DT)
        stale = rsort_layout(
            scene.means, scene.scales, scene.alive, far,
            grid0.theta, grid0.phi, grid0.r, spec, slack=0.0,
        )
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        t = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, spec, layout=stale,
        )
        fresh = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, spec,
        )
        # Only meaningful if the stale layout actually misses someone.
        missed = any(
            int(stale.inv_perm[g]) >= stale.src.shape[0]
            and int(fresh.inv_perm[g]) < stale.src.shape[0]
            for g in range(32)
        )
        assert missed, "fixture no longer exercises a stale layout"
        assert bool(t.overflowed)

    def test_gradient_parity_through_layout(self):
        scene = make_scene(32, seed=4)
        spec = SPEC._replace(w_max=1024, max_groups=32)
        layout = self._layout(scene, spec)
        s = SETTINGS._replace(rsort_spec=spec)
        target = jnp.ones(s.num_bins) * 0.1

        def loss(sc, st, lo):
            _, h, _ = render_transient(
                sc, CAM, BOX, C, DT, VOL_POS, 1, st, layout=lo
            )
            return mse_loss(h, target)[0]

        gf = jax.grad(lambda sc: loss(sc, s, layout))(scene)
        gd = jax.grad(lambda sc: loss(sc, DENSE, None))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities",
                     "sh_dc"):
            a, b = np.asarray(getattr(gf, name)), np.asarray(getattr(gd, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=7e-3,
                                       err_msg=name)


class TestCullingCapacityDiagnostic:
    def test_reports_saturation(self):
        from nlos_gaussian_renderer_tpu.ops.render import check_culling_capacity

        scene = make_scene(48, seed=6)
        ok = check_culling_capacity(scene, CAM, BOX, C, DT, SETTINGS)
        assert ok["backend"] == "pallas_rsort"
        assert not ok["overflowed"]
        tight = SETTINGS._replace(
            rsort_spec=SPEC._replace(w_max=2)
        )
        bad = check_culling_capacity(scene, CAM, BOX, C, DT, tight)
        assert bad["overflowed"]

    def test_dense_backend_never_overflows(self):
        from nlos_gaussian_renderer_tpu.ops.render import check_culling_capacity

        scene = make_scene(8, seed=7)
        d = check_culling_capacity(scene, CAM, BOX, C, DT, DENSE)
        assert d["overflowed"] is False


class TestTuneSpec:
    def test_fitted_caps_cover_and_shrink(self):
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import tune_rsort_spec
        from nlos_gaussian_renderer_tpu.ops.render import check_culling_capacity

        scene = make_scene(48, seed=8)
        cams = np.array([[0.05, 0, -0.1], [0.0, 0, 0.0]], np.float32)
        spec = tune_rsort_spec(
            scene, cams, BOX, 8, 60, 140, C, DT, base=SPEC
        )
        # Covers the scene (no overflow) ...
        s = SETTINGS._replace(rsort_spec=spec)
        diag = check_culling_capacity(scene, CAM, BOX, C, DT, s)
        assert not diag["overflowed"], diag
        # ... and sized to the observed cull, not the static worst case.
        assert spec.w_max < SPEC.w_max
        assert spec.max_groups <= SPEC.max_groups * 4
        # Render parity still holds with fitted caps.
        _, hr, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s)
        _, hd, _ = render_transient(
            scene, CAM, BOX, C, DT, VOL_POS, 1, DENSE
        )
        np.testing.assert_allclose(hr, hd, rtol=3e-3, atol=1e-9)


class TestDegenerateFootprints:
    def test_engulfing_gaussian_covers_all_angular_tiles(self):
        """A Gaussian whose 3-sigma cull sphere contains the scan point sees
        the full sphere: it must land in EVERY angular tile's list (the
        arcsin clamp used to cap the footprint at a half-sphere and silently
        drop tiles — ADVICE r1)."""
        import dataclasses

        scene = make_scene(8, seed=11)
        # Place gaussian 0 between the scan point and the volume, large
        # enough that radius = 3*1.1*sigma_max > d but still inside the
        # radial in_window test (d + radius >= r[0] = 0.6).
        means = np.array(scene.means)
        direction = np.asarray(VOL_POS) - np.asarray(CAM)
        direction /= np.linalg.norm(direction)
        means[0] = np.asarray(CAM) + 0.35 * direction
        log_scales = np.array(scene.log_scales)
        log_scales[0] = np.log(0.15)  # radius = 3*1.1*0.15 = 0.495 > d = 0.35
        scene = dataclasses.replace(
            scene,
            means=jnp.asarray(means),
            log_scales=jnp.asarray(log_scales),
        )
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        tiles = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        slot = int(tiles.inv_perm[0])
        words = np.asarray(tiles.words)
        assert slot < words.shape[0], "engulfing gaussian was culled"
        t_ang = int(np.asarray(tiles.counts).shape[0])
        memb = np.asarray(decode_rect_members(words[:, 0], 2, 1))
        for t in range(t_ang):
            assert memb[slot, t], f"tile {t} dropped the engulfing gaussian"

    def test_pole_wrapping_gaussian_covers_all_phi_tiles(self):
        """A Gaussian whose angular cone wraps a theta pole must cover every
        phi tile of the affected theta rows (sin(alpha) >= sin(theta) there,
        so the phi footprint is the full circle; the arcsin clamp used to cap
        it at a half-circle)."""
        from nlos_gaussian_renderer_tpu.ops.fused import (
            TileSpec,
            cull_tiles,
            tile_grid_dims,
        )

        # Hand-built near-pole grid: theta hugs 0, phi spans a wide window.
        ns = 8
        theta = jnp.linspace(0.05, 0.4, ns)
        phi = jnp.linspace(-3.0, 3.0, ns)
        r = jnp.linspace(0.6, 1.4, 80)
        cam = jnp.zeros(3)
        d0 = 1.0
        th_g = 0.1
        means = jnp.asarray(
            [[np.sin(th_g), 0.0, np.cos(th_g)],  # near the +z pole, phi = 0
             [0.3, 0.3, 0.8]],
            jnp.float32,
        ) * d0
        # radius = 3 * 1.1 * sigma = 0.198: > d*sin(theta_row0) but << d.
        scales = jnp.full((2, 3), 0.06, jnp.float32)
        alive = jnp.ones(2, jnp.float32)
        spec = TileSpec(t_theta=4, t_phi=2, t_r=16, k_max=2)
        tiles = cull_tiles(means, scales, alive, cam, theta, phi, r, spec)
        n_tt, n_pt, n_rt = tile_grid_dims(ns, 80, spec)
        rt = int((d0 - 0.6) / (16 * float(r[1] - r[0])))
        ids = np.asarray(tiles.indices)
        counts = np.asarray(tiles.counts)
        for pt in range(n_pt):
            t = (rt * n_tt + 0) * n_pt + pt
            assert 0 in ids[t][: counts[t]], (
                f"phi tile {pt} dropped the pole-wrapping gaussian"
            )


class TestMemberBits:
    def test_all_rect_words_all_tiles_exact(self):
        """The kernel's float rect-word decode must match the int decode for
        EVERY representable word at the largest single-word grid this repo
        uses (8x8 tiles, 13-bit words). The earlier bitmap scheme's 24-bit
        variant failed the analogous property ((2^24-1) * 2^-15 lands on a
        round-to-nearest-even tie and flipped a field) — keep the exhaustive
        sweep so any encoding change re-proves exactness."""
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
            _member_bits,
            _rect_bits,
        )

        n_tt = n_pt = 8
        _, _, b_total = _rect_bits(n_tt, n_pt)
        all_words = np.arange(1 << b_total, dtype=np.int64)
        words_f = jnp.asarray(all_words, jnp.float32)[:, None]
        want_all = np.asarray(
            decode_rect_members(jnp.asarray(all_words, jnp.int32),
                                n_tt, n_pt)
        )
        for t in range(n_tt * n_pt):
            got = np.asarray(_member_bits(words_f, jnp.int32(t), n_tt, n_pt))
            np.testing.assert_array_equal(
                got, want_all[:, t].astype(np.float32), err_msg=f"tile {t}"
            )

    def test_rect_word_roundtrip_via_cull(self):
        """Cull-produced words decode to exactly the footprint mask the cull
        computed (valid rows), and padding rows decode to no membership."""
        scene = make_scene(48, seed=7)
        grid = shell_grid(CAM, BOX, 8, 60, 140, C, DT)
        tiles = rsort_cull(
            scene.means, scene.scales, scene.alive, CAM,
            grid.theta, grid.phi, grid.r, SPEC,
        )
        words = np.asarray(tiles.words)
        memb = np.asarray(decode_rect_members(words[:, 0], 2, 1))
        # Padding rows (word 0) claim nothing.
        assert not memb[words[:, 0] == 0].any()
        # Every original gaussian's decoded membership matches counts.
        counts_dec = memb.sum(axis=0)
        np.testing.assert_array_equal(counts_dec, np.asarray(tiles.counts))


class TestTakeRowsScatter:
    def test_padded_unique_scatter_grad_matches_plain(self):
        """Zero-padded index lists repeat row 0; the unique-scatter backward
        must not corrupt row 0's gradient (duplicate indices under
        unique_indices=True are UB in XLA — ADVICE r1). Padding slots carry
        zero cotangent in real use; with counts given, even NONZERO padding
        cotangents must be dropped, matching the masked plain scatter."""
        from nlos_gaussian_renderer_tpu.ops.fused import take_rows

        rng = np.random.default_rng(3)
        table = jnp.asarray(rng.normal(size=(7, 5)), jnp.float32)
        idx = jnp.asarray([[3, 1, 0, 0], [0, 2, 6, 0]], jnp.int32)  # 0-padded
        counts = jnp.asarray([3, 3], jnp.int32)
        g_out = jnp.asarray(rng.normal(size=(2, 4, 5)), jnp.float32)

        def f_unique(t):
            return jnp.sum(take_rows(t, idx, counts, True) * g_out)

        def f_plain(t):
            slot_valid = (jnp.arange(4)[None, :] < counts[:, None])
            masked = g_out * slot_valid[:, :, None]
            return jnp.sum(take_rows(t, idx, None, False) * masked)

        gu = jax.grad(f_unique)(table)
        gp = jax.grad(f_plain)(table)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gp), rtol=1e-6)
        # Row 0 receives exactly the two valid slot-0/slot-2 contributions.
        expected0 = np.asarray(g_out)[0, 2] + np.asarray(g_out)[1, 0]
        np.testing.assert_allclose(np.asarray(gu)[0], expected0, rtol=1e-6)


    def test_wide_pad_gather_zero_row_semantics(self):
        """The wide gather's padding zeros come from ONE appended zero row +
        `mode="clip"` (fill lowers to 3 extra streaming select passes at
        100k). Padding slots (src == g) must read exact zero rows; the
        backward must route culled rows (inv_perm == g_pad) AND overflowed
        rows (inv_perm > g_pad, the `missed` channel) to zero cotangent
        while valid rows get the permuted cotangent exactly."""
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
            wide_pad_gather,
        )

        rng = np.random.default_rng(7)
        g, g_pad, n_gw = 5, 8, 3
        gw = jnp.asarray(rng.normal(size=(g, n_gw)), jnp.float32)
        geom = jnp.asarray(rng.normal(size=(g, 2)), jnp.float32)
        perm = jnp.asarray([2, 0, 4, 1, 3], jnp.int32)
        # slots: 3 valid sorted rows, sentinel g=5 padding, repeat, 2 pads
        src = jnp.asarray([0, 1, 2, 5, 3, 5, 4, 5], jnp.int32)
        # original row -> padded slot; row 1 culled (g_pad), row 3
        # OVERFLOWED past g_pad (missed-layout channel).
        inv_perm = jnp.asarray([1, 8, 0, 9, 2], jnp.int32)

        out = wide_pad_gather(gw, geom, perm, src, inv_perm, n_gw)
        full = np.concatenate([np.asarray(gw), np.asarray(geom)], axis=1)
        expect = full[np.asarray(perm)][np.minimum(np.asarray(src), g - 1)]
        expect[np.asarray(src) >= g] = 0.0
        np.testing.assert_array_equal(np.asarray(out), expect)

        go = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
        dgw = jax.vjp(
            lambda w: wide_pad_gather(w, geom, perm, src, inv_perm, n_gw),
            gw,
        )[1](go)[0]
        exp_g = np.zeros((g, n_gw), np.float32)
        for row, slot in enumerate(np.asarray(inv_perm)):
            if slot < g_pad:
                exp_g[row] = np.asarray(go)[slot, :n_gw]
        np.testing.assert_array_equal(np.asarray(dgw), exp_g)


class TestGateLadderLaneAligned:
    """Lane-aligned specs (s_ang % 128 == 0) select the bl-anchored gate
    ladder (`fused_rsort._gate_ladder`): unaligned gate starts, clamped
    final gates, and lane masks that zero the re-covered leading bins.
    The base SPEC (s_ang=32) only exercises the aligned fallback, so this
    parity check is the interpret-mode coverage for the anchored schedule
    (its Mosaic alignment legality still needs one real-TPU run)."""

    SPEC128 = RSortSpec(t_theta=8, t_phi=16, t_chunk=8, g_tile=32,
                        w_max=512, max_groups=16)
    S_R = RenderSettings(num_sampling_points=16, start=60, end=140,
                         backend="pallas_rsort", rsort_spec=SPEC128)
    S_D = S_R._replace(backend="dense")

    def test_single_chunk_histogram_parity(self):
        """t_chunk = num_bins (ONE radial chunk — the headline bench
        geometry since the 8.46 ms single-chunk default): the whole bin
        axis rides one slab and every item's gates anchor inside it."""
        scene = make_scene(48, seed=11)
        s_one = self.S_R._replace(
            rsort_spec=self.SPEC128._replace(t_chunk=80, sigma_cull=6.0,
                                             w_max=2048)
        )
        _, h1, ov = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, s_one)
        _, hd, _ = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1,
                                    self.S_D)
        assert not bool(ov)
        np.testing.assert_allclose(h1, hd, rtol=5e-4, atol=1e-9)

    def test_histogram_parity(self):
        """The anchored ladder covers EXACTLY [bl, bh] — unlike the aligned
        fallback it no longer over-covers up to gate_bins-1 bins below bl,
        so vs un-culled dense the residual is the true 3-sigma cull tail
        (~1e-2 relative on the smallest leading bins). Widening the cull to
        6 sigma removes the tail and must tighten parity by ~100x — that is
        the check that the ladder itself drops nothing."""
        scene = make_scene(48, seed=11)
        _, hr, ov = render_transient(
            scene, CAM, BOX, C, DT, VOL_POS, 1, self.S_R
        )
        _, hd, _ = render_transient(
            scene, CAM, BOX, C, DT, VOL_POS, 1, self.S_D
        )
        assert not bool(ov)
        np.testing.assert_allclose(hr, hd, rtol=2e-2, atol=1e-9)
        wide = self.S_R._replace(
            rsort_spec=self.SPEC128._replace(sigma_cull=6.0, w_max=2048)
        )
        _, hw, ov = render_transient(scene, CAM, BOX, C, DT, VOL_POS, 1, wide)
        assert not bool(ov)
        np.testing.assert_allclose(hw, hd, rtol=5e-4, atol=1e-9)

    def test_gradient_parity(self):
        scene = make_scene(24, seed=12)
        target = jnp.ones(self.S_R.num_bins) * 0.1

        def loss(sc, st):
            _, h, _ = render_transient(sc, CAM, BOX, C, DT, VOL_POS, 1, st)
            return mse_loss(h, target)[0]

        gr = jax.grad(lambda sc: loss(sc, self.S_R))(scene)
        gd = jax.grad(lambda sc: loss(sc, self.S_D))(scene)
        for name in ("means", "log_scales", "quats", "logit_opacities",
                     "sh_dc"):
            a = np.asarray(getattr(gr, name))
            b = np.asarray(getattr(gd, name))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=7e-3,
                                       err_msg=name)


class TestWorkListBuilder:
    """The serial Pallas work-list kernel must reproduce the XLA prefix-sum
    construction exactly (valid prefix) at every chunk geometry, including
    under vmap and on overflow (`_ws_build_kernel` / RSortSpec.ws_pallas)."""

    FIELDS = ("fwd_t", "fwd_j", "fwd_b", "fwd_first", "fwd_bl", "fwd_bh",
              "bwd_t", "bwd_j", "bwd_b", "bwd_first", "bwd_bl", "bwd_bh")

    def _cull_pair(self, scene, spec, cam=CAM, ns=8):
        grid = shell_grid(cam, BOX, ns, 60, 140, C, DT)
        args = (scene.means, scene.scales, scene.alive, cam,
                grid.theta, grid.phi, grid.r)
        tp = rsort_cull(*args, spec._replace(ws_pallas=True))
        tx = rsort_cull(*args, spec._replace(ws_pallas=False))
        return tp, tx

    @pytest.mark.parametrize("t_chunk,gate", [(8, 4), (16, 8), (80, 80)])
    def test_exact_parity(self, t_chunk, gate):
        scene = make_scene(64, seed=21)
        spec = SPEC._replace(t_chunk=t_chunk, gate_bins=gate)
        tp, tx = self._cull_pair(scene, spec)
        n = int(tp.n_items[0])
        assert n == int(tx.n_items[0]) and n > 0
        assert bool(tp.overflowed) == bool(tx.overflowed) is False
        for f in self.FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(tp, f))[:n],
                np.asarray(getattr(tx, f))[:n], err_msg=f,
            )
        np.testing.assert_array_equal(
            np.asarray(tp.tile_has_work), np.asarray(tx.tile_has_work)
        )
        np.testing.assert_array_equal(
            np.asarray(tp.blk_has_work), np.asarray(tx.blk_has_work)
        )

    def test_overflow_prefix_and_safe_masks(self):
        """On overflow both paths truncate identically; the Pallas has_work
        masks cover ONLY visited (written) items — tiles whose every item
        overflowed stay masked, so their uninitialized output blocks are
        zeroed (the XLA path marked them from the un-truncated cover set)."""
        scene = make_scene(64, seed=22)
        spec = SPEC._replace(w_max=16)
        tp, tx = self._cull_pair(scene, spec)
        assert bool(tp.overflowed) and bool(tx.overflowed)
        n = int(tp.n_items[0])
        assert n == int(tx.n_items[0]) == 16
        for f in self.FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(tp, f))[:n],
                np.asarray(getattr(tx, f))[:n], err_msg=f,
            )
        assert (np.asarray(tp.tile_has_work)
                <= np.asarray(tx.tile_has_work)).all()
        assert (np.asarray(tp.blk_has_work)
                <= np.asarray(tx.blk_has_work)).all()

    def test_vmap_parity(self):
        scene = make_scene(48, seed=23)
        cams = jnp.asarray(
            np.array([[0.0, 0.0, 0.0], [0.2, 0.0, 0.1], [-0.3, 0.0, 0.2]]),
            jnp.float32,
        )
        grid = shell_grid(cams[0], BOX, 8, 60, 140, C, DT)

        def cull(cam, ws):
            return rsort_cull(
                scene.means, scene.scales, scene.alive, cam,
                grid.theta, grid.phi, grid.r,
                SPEC._replace(ws_pallas=ws),
            )

        tp = jax.vmap(lambda c: cull(c, True))(cams)
        tx = jax.vmap(lambda c: cull(c, False))(cams)
        for b in range(3):
            n = int(tp.n_items[b, 0])
            assert n == int(tx.n_items[b, 0])
            for f in self.FIELDS:
                np.testing.assert_array_equal(
                    np.asarray(getattr(tp, f))[b, :n],
                    np.asarray(getattr(tx, f))[b, :n], err_msg=f,
                )


class TestHiLoSplitSurvivesJit:
    """Round-5 regression: XLA's default `allow_excess_precision` folds the
    f32->bf16->f32 round-trip of a Dekker-style split under jit, zeroing the
    lo half — which silently degraded the "exact bf16x3" Mahalanobis to
    single-bf16 precision on every JITTED hardware step while eager probes
    (and the dense reference) stayed exact. `xfeat_slab` pins the hi value
    behind `lax.optimization_barrier`; this test locks the contract on every
    backend XLA (CPU included — the fold reproduces there too)."""

    def test_xfeat_slab_lo_half_nonzero_and_exact_under_jit(self):
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import xfeat_slab

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((3, 64, 10)).astype(np.float32) * 3.7)
        slab = np.asarray(jax.jit(xfeat_slab)(x), np.float32)
        # (T, 3*FDIM, S): rows [0:10] hi, [10:20] hi again, [20:30] lo.
        hi = slab[:, 0:10, :]
        lo = slab[:, 20:30, :]
        xt = np.asarray(x, np.float32).transpose(0, 2, 1)
        # hi must be the ROUNDED bf16 value (not a folded f32 passthrough)
        # and hi + lo must reconstruct x to bf16(residual) accuracy.
        assert np.abs(lo).max() > 0.0, (
            "lo half is exactly zero: the excess-precision fold is back"
        )
        # lo must be EXACTLY the bf16 rounding of the true residual x - hi
        # (both halves bf16): bitwise equality, no tolerance.
        import ml_dtypes

        exact_lo = (xt - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(lo, exact_lo)
        # And hi + lo reconstructs x to the lo half's own rounding (~2^-9
        # of the residual, i.e. ~2^-17 of x).
        np.testing.assert_allclose(hi + lo, xt, rtol=0, atol=4e-5)

    def test_unprotected_split_folds_under_jit_documenting_hazard(self):
        # Documents WHY the barrier exists: the naive pattern really does
        # fold to zero under jit on this XLA build. If this ever starts
        # failing (fold removed upstream), the barrier is still harmless.
        def naive(x):
            h = x.astype(jnp.bfloat16)
            return (x - h.astype(jnp.float32)).astype(jnp.bfloat16)

        x = jnp.asarray(
            np.random.default_rng(3).random((32,)).astype(np.float32) * 3.7
        )
        eager_lo = np.abs(np.asarray(naive(x), np.float32)).max()
        assert eager_lo > 0.0
