"""Differentiable confocal transient rendering (dense jnp path).

Renders, for one scan point on the visible wall, the time-of-flight histogram
of the hidden Gaussian scene by integrating the Gaussian field over spherical
shells (NeTF-style). Semantics follow the reference:

  - field evaluation + weighting: `gaussian_model.estimate_rho_w_no_occlusion`
    (`gaussian_model.py:346-364`) and `estimate_rho_w` (`:297-344`),
  - attenuation / angular integration: `gaussian_transient_rendering`
    (`nlos_helpers.py:206-232`),
  - aggregate-occlusion semantics: CUDA `volume_render_kernel`
    (`volume_renderer.cu:80-137`).

TPU-first design: the Gaussian PDF evaluation is a quadratic-form matmul
(see `ops/math.py`), so the whole no-occlusion render is
    exp(-0.5 * X10 @ G10^T) @ weights
— two MXU matmuls around a fused elementwise exp. The sequential per-ray
transmittance march of the CUDA kernel becomes exp(-cumsum) along the radius
axis (a parallel scan), and the per-Gaussian cumprod of the reference Python
path becomes exp(cumsum(log)) — both XLA-parallel, no sequential loops.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nlos_gaussian_renderer_tpu.models.scene import GaussianScene
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.fused import (
    TileSpec,
    cull_tiles,
    fused_gaussian_field,
)
from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
    RSortSpec,
    rsort_cull,
    rsort_gaussian_field,
)
from nlos_gaussian_renderer_tpu.ops.sampling import ShellGrid, attenuation_weights, shell_grid


class RenderSettings(NamedTuple):
    """Static rendering configuration (hashable; safe as a jit static arg)."""

    num_sampling_points: int
    start: int
    end: int
    occlusion: bool = False
    rendering_type: str = "netf"  # 'netf' | 'nlos-neus'
    occlusion_mode: str = "aggregate"  # 'aggregate' | 'per_gaussian'
    scaling_modifier: float = 1.0
    apply_volume_y2_factor: bool = True
    # 'matmul': quadratic-form MXU path; 'direct': broadcasted-diff reference.
    pdf_impl: str = "matmul"
    # 'dense': pure-jnp field; 'pallas': fused tile-sparse kernel;
    # 'pallas_rsort': distance-sorted range-sparse kernel (fastest at scale).
    backend: str = "dense"
    tile_spec: TileSpec = TileSpec()
    rsort_spec: RSortSpec = RSortSpec()

    @property
    def num_bins(self) -> int:
        return self.end - self.start

    @classmethod
    def from_config(cls, cfg) -> "RenderSettings":
        tile_spec = TileSpec()
        if getattr(cfg, "cull_tile", None) is not None:
            tt, tp, tr = cfg.cull_tile
            tile_spec = tile_spec._replace(t_theta=tt, t_phi=tp, t_r=tr)
        if getattr(cfg, "cull_k_max", None) is not None:
            tile_spec = tile_spec._replace(k_max=cfg.cull_k_max)
        # rsort-family radial schedule: ONE chunk covering the whole bin
        # window (the bl-anchored gate ladder skips out-of-span gates
        # exactly, so bigger chunks only cut the per-(tile, block) item
        # count — bench-measured fastest) — and the only schedule that
        # scales: with the old t_chunk=8 default, a 310-bin window at a
        # densified 100k population produced ~39 chunks x ~650 blocks x 8
        # tiles of work items, and the builder's 12 SMEM work-list outputs
        # (12 * w_max * 4 B) blew the 1 MB SMEM budget at compile time
        # (7.18 M requested — found by the first real 50k-iteration run,
        # round 5). Single-chunk keeps w_max at O(blocks x tiles).
        gate_bins = getattr(cfg, "rsort_gate_bins", None) or 8
        num_bins = cfg.end - cfg.start
        t_chunk = getattr(cfg, "rsort_t_chunk", None) or (
            -(-num_bins // gate_bins) * gate_bins
        )
        rsort_spec = RSortSpec(t_chunk=t_chunk, gate_bins=gate_bins)
        return cls(
            num_sampling_points=cfg.num_sampling_points,
            start=cfg.start,
            end=cfg.end,
            occlusion=cfg.occlusion,
            rendering_type=cfg.rendering_type,
            occlusion_mode=cfg.occlusion_mode,
            scaling_modifier=cfg.scaling_modifier,
            apply_volume_y2_factor=cfg.apply_volume_y2_factor,
            backend=(
                cfg.renderer
                if cfg.renderer in ("pallas", "pallas_rsort", "pallas_analytic",
                                    "pallas_dsort", "analytic")
                else "dense"
            ),
            tile_spec=tile_spec,
            rsort_spec=rsort_spec,
        )


def view_albedo(scene: GaussianScene, camera_pos, active_sh_degree) -> jax.Array:
    """Per-Gaussian view-dependent albedo rho (N,).

    rho = clamp(eval_sh(sh, normalize(mu - cam)) + 0.5, 0) — reference
    `gaussian_model.py:303-310`. `active_sh_degree` may be traced (annealing);
    bands above it are masked rather than sliced (static shapes).
    """
    dirs = scene.means - jnp.asarray(camera_pos)[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    sh_val = gmath.eval_sh_dynamic(
        scene.sh, dirs, active_sh_degree, scene.max_sh_degree
    )
    return jnp.clip(sh_val + 0.5, min=0.0)


def gaussian_pdf(
    scene: GaussianScene, points, settings: RenderSettings
) -> jax.Array:
    """Unnormalized anisotropic Gaussian PDFs exp(-0.5 * maha).

    Args:
      scene: N Gaussians.
      points: (A, 3) sample positions.
    Returns:
      (A, N) PDF values.
    """
    mod = settings.scaling_modifier
    if settings.pdf_impl == "matmul":
        gfeat = scene.quadratic_form(mod)
        xfeat = gmath.point_monomials(points)
        maha = gmath.mahalanobis_matmul(xfeat, gfeat)
    else:
        maha = gmath.mahalanobis_direct(
            points, scene.means, scene.scales * mod, scene.rotations
        )
    return jnp.exp(-0.5 * maha)


def _exclusive_cumsum(x, axis):
    cs = jnp.cumsum(x, axis=axis)
    return cs - x  # exclusive: sum over strictly-preceding entries


def field_response(
    scene: GaussianScene,
    points,
    camera_pos,
    c,
    delta_t,
    active_sh_degree,
    settings: RenderSettings,
    gauss_axis: Optional[str] = None,
) -> jax.Array:
    """rho-weighted emission per sample point (A,), A = num_r * ns^2.

    Dispatches on (occlusion, rendering_type, occlusion_mode):
      - no occlusion:     sum_g pdf * op * rho                    (reference default)
      - netf/aggregate:   (sum_g pdf*op*rho) * T * c*dt,  T = exp(-c*dt * excl-cumsum_r(sum_g pdf*op))
      - netf/per_gaussian: sum_g pdf*op * T_g * rho * c*dt, T_g from the
        Gaussian's own density (reference Python semantics incl. the +1e-7
        inside the cumprod, `gaussian_model.py:316-324`)
      - nlos-neus/*:      alpha compositing analogues (`gaussian_model.py:326-339`)

    When `gauss_axis` is set (shard_map over a Gaussian-sharded scene), every
    sum over Gaussians is psum-reduced across that mesh axis. This is exact
    for all modes: each mode's per-sample output is a sum over Gaussians of
    per-Gaussian terms (per_gaussian transmittance depends only on the
    Gaussian's own density; aggregate transmittance is computed *after* the
    psum of the aggregate density).
    """
    ns2 = settings.num_sampling_points**2
    num_r = settings.num_bins
    pdf = gaussian_pdf(scene, points, settings)  # (A, N)
    op = scene.opacities[:, 0]  # (N,) alive-masked
    rho = view_albedo(scene, camera_pos, active_sh_degree)  # (N,)

    def gsum(x):
        return x if gauss_axis is None else jax.lax.psum(x, gauss_axis)

    def weighted(w):
        # (A, N) @ (N,) with full f32 accumulation (this XLA build's default
        # matmul precision downcasts; see tests/test_math.py precision notes).
        return jnp.einsum("an,n->a", pdf, w, precision=jax.lax.Precision.HIGHEST)

    if not settings.occlusion:
        # `estimate_rho_w_no_occlusion` (`gaussian_model.py:346-364`).
        return gsum(weighted(op * rho))

    cdt = c * delta_t
    if settings.occlusion_mode == "aggregate":
        # CUDA kernel semantics (`volume_renderer.cu:80-137`): one
        # transmittance from the aggregate mixture density per ray.
        both = gsum(
            jnp.stack([weighted(op), weighted(op * rho)], axis=0)
        ).reshape(2, num_r, ns2)
        density, rho_density = both[0], both[1]
        if settings.rendering_type == "netf":
            trans = jnp.exp(-cdt * _exclusive_cumsum(density, axis=0))
            out = rho_density * trans * cdt
        elif settings.rendering_type == "nlos-neus":
            alpha = 1.0 - jnp.exp(-density * cdt)
            trans = jnp.exp(
                _exclusive_cumsum(jnp.log1p(-alpha + 1e-7), axis=0)
            )
            mean_rho = rho_density / jnp.maximum(density, 1e-12)
            out = alpha * trans * mean_rho
        else:
            raise ValueError(settings.rendering_type)
        return out.reshape(-1)

    elif settings.occlusion_mode == "per_gaussian":
        # Reference Python semantics (`gaussian_model.py:313-339`): each
        # Gaussian is attenuated by its own accumulated density along r.
        density = (pdf * op[None, :]).reshape(num_r, ns2, -1)  # (Nr, ns2, N)
        if settings.rendering_type == "netf":
            # T = cumprod(cat(ones, exp(-density*cdt) + 1e-7))[:-1]
            #   = exp(exclusive_cumsum(log(exp(-density*cdt) + 1e-7)))
            log_occ = jnp.log(jnp.exp(-density * cdt) + 1e-7)
            trans = jnp.exp(_exclusive_cumsum(log_occ, axis=0))
            out = jnp.sum(density * trans * rho[None, None, :], axis=-1) * cdt
        elif settings.rendering_type == "nlos-neus":
            alpha = 1.0 - jnp.exp(-density * cdt)
            log_t = jnp.log(1.0 - alpha + 1e-7)
            trans = jnp.exp(_exclusive_cumsum(log_t, axis=0))
            out = jnp.sum(alpha * trans * rho[None, None, :], axis=-1)
        else:
            raise ValueError(settings.rendering_type)
        return out.reshape(-1)
    raise ValueError(settings.occlusion_mode)


def field_response_per_gaussian_chunked(
    scene: GaussianScene,
    points,
    camera_pos,
    c,
    delta_t,
    active_sh_degree,
    settings: RenderSettings,
    gauss_chunk: Optional[int] = None,
    gauss_axis: Optional[str] = None,
) -> jax.Array:
    """Memory-safe per_gaussian occlusion field (A,), chunked over Gaussians.

    The per_gaussian transmittance is SELF-contained — each Gaussian is
    attenuated only by its own accumulated density along r (reference
    `gaussian_model.py:316-324`) — so the sum over Gaussians chunks exactly:
    no cross-chunk state. This replaces the dense path's (A, N) matrix with
    (A, chunk) blocks inside a scan (the fused kernels can't host this mode:
    their output is a per-sample Gaussian-SUM, but per_gaussian needs the
    un-reduced matrix for the per-Gaussian cumsum along r).

    The scan body is rematerialized (`jax.checkpoint`) so the backward pass
    recomputes each chunk's PDFs instead of storing (A, chunk) residuals for
    every chunk — peak memory stays ~3 chunk-sized temporaries either way.
    """
    ns2 = settings.num_sampling_points**2
    num_r = settings.num_bins
    a = num_r * ns2
    if gauss_chunk is None:
        # ~3 live (A, chunk) f32 temporaries (pdf, trans, product); cap
        # ~250 MB total.
        gauss_chunk = max(64, int(80e6 // max(4 * a, 1)))
    n = scene.capacity
    chunk = min(gauss_chunk, n)
    pad = (-n) % chunk
    n_chunks = (n + pad) // chunk
    idx = jnp.arange(n + pad) % n  # wrap; padded entries get weight 0
    valid = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])

    mod = settings.scaling_modifier
    gfeat = scene.quadratic_form(mod)  # (N, 10)
    op = (scene.opacities[:, 0])[idx] * valid  # (N+pad,) padded rows dead
    rho = view_albedo(scene, camera_pos, active_sh_degree)[idx]  # (N+pad,)
    gf_c = gfeat[idx].reshape(n_chunks, chunk, gmath.QUADRATIC_DIM)
    op_c = op.reshape(n_chunks, chunk)
    rho_c = rho.reshape(n_chunks, chunk)

    xfeat = gmath.point_monomials(points)  # (A, 10)
    cdt = c * delta_t

    @jax.checkpoint
    def body(acc, args):
        gf, o, rh = args
        maha = gmath.mahalanobis_matmul(xfeat, gf)  # (A, chunk)
        density = (jnp.exp(-0.5 * maha) * o[None, :]).reshape(
            num_r, ns2, chunk
        )
        if settings.rendering_type == "netf":
            log_occ = jnp.log(jnp.exp(-density * cdt) + 1e-7)
            trans = jnp.exp(_exclusive_cumsum(log_occ, axis=0))
            part = (
                jnp.sum(density * trans * rh[None, None, :], axis=-1) * cdt
            )
        elif settings.rendering_type == "nlos-neus":
            alpha = 1.0 - jnp.exp(-density * cdt)
            log_t = jnp.log(1.0 - alpha + 1e-7)
            trans = jnp.exp(_exclusive_cumsum(log_t, axis=0))
            part = jnp.sum(alpha * trans * rh[None, None, :], axis=-1)
        else:
            raise ValueError(settings.rendering_type)
        return acc + part, None

    acc0 = jnp.zeros((num_r, ns2), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (gf_c, op_c, rho_c))
    if gauss_axis is not None:
        out = jax.lax.psum(out, gauss_axis)
    return out.reshape(-1)


def field_response_pallas(
    scene: GaussianScene,
    grid: ShellGrid,
    camera_pos,
    c,
    delta_t,
    active_sh_degree,
    settings: RenderSettings,
    gauss_axis: Optional[str] = None,
    layout=None,
) -> jax.Array:
    """Block-sparse fused-kernel version of `field_response`.

    Supports the no-occlusion mode and both aggregate occlusion types (the
    per-sample field is a Gaussian-sum in those modes, so culling + fused
    accumulation is exact). The per_gaussian occlusion mode needs the
    un-reduced (gaussian, sample) matrix and stays on the dense path.

    Returns:
      (flattened (A,) response, overflow flag) — overflow means a static
      culling capacity saturated and contributions were truncated; it must
      reach the training loop (see `train.StepAux`), never be discarded.
    """
    ns2 = settings.num_sampling_points**2
    num_r = settings.num_bins
    op = scene.opacities[:, 0]
    rho = view_albedo(scene, camera_pos, active_sh_degree)
    gfeat = scene.quadratic_form(settings.scaling_modifier)
    # Channel weights are mode-determined before the cull so the rsort
    # backend can ride them through the cull's wide gather (tiles.table).
    if not settings.occlusion:
        w_pre = (op * rho)[:, None]
    else:
        if settings.occlusion_mode != "aggregate":
            raise NotImplementedError(
                "per_gaussian occlusion uses the dense backend"
            )
        w_pre = jnp.stack([op, op * rho], axis=-1)

    if settings.backend == "pallas_dsort":
        from nlos_gaussian_renderer_tpu.ops.fused_dsort import (
            dsort_cull,
            dsort_gaussian_field,
        )

        spec = settings.rsort_spec
        tiles = dsort_cull(
            scene.means, scene.scales, scene.alive, jnp.asarray(camera_pos),
            grid.theta, grid.phi, grid.r, spec, settings.scaling_modifier,
        )

        def run(w):
            field, _ = dsort_gaussian_field(
                gfeat, w, jax.lax.stop_gradient(grid.points), tiles, spec
            )
            return field
    elif settings.backend in ("pallas_rsort", "pallas_analytic"):
        spec = settings.rsort_spec
        tiles = rsort_cull(
            scene.means, scene.scales, scene.alive, jnp.asarray(camera_pos),
            grid.theta, grid.phi, grid.r, spec, settings.scaling_modifier,
            layout=layout,
            gw=jnp.concatenate([gfeat, w_pre], axis=1),
        )

        if settings.backend == "pallas_analytic":
            from nlos_gaussian_renderer_tpu.ops.fused_analytic import (
                analytic_gaussian_field,
            )

            def run(w):
                field, _ = analytic_gaussian_field(
                    gfeat, w, grid, tiles, spec, camera_pos
                )
                return field
        else:

            def run(w):
                field, _ = rsort_gaussian_field(
                    gfeat, w, None, tiles, spec, grid=grid, cam=camera_pos
                )
                return field
    else:
        spec = settings.tile_spec
        tiles = cull_tiles(
            scene.means, scene.scales, scene.alive, jnp.asarray(camera_pos),
            grid.theta, grid.phi, grid.r, spec, settings.scaling_modifier,
        )

        def run(w):
            field, _ = fused_gaussian_field(
                gfeat, w, jax.lax.stop_gradient(grid.points), tiles, spec
            )
            return field

    overflow = tiles.overflowed

    def gsum(x):
        return x if gauss_axis is None else jax.lax.psum(x, gauss_axis)

    if not settings.occlusion:
        field = run(w_pre)
        return gsum(field[..., 0].reshape(-1)), overflow

    cdt = c * delta_t
    field = run(w_pre)
    both = gsum(field.reshape(num_r, ns2, 2))
    density, rho_density = both[..., 0], both[..., 1]
    if settings.rendering_type == "netf":
        trans = jnp.exp(-cdt * _exclusive_cumsum(density, axis=0))
        out = rho_density * trans * cdt
    elif settings.rendering_type == "nlos-neus":
        alpha = 1.0 - jnp.exp(-density * cdt)
        trans = jnp.exp(_exclusive_cumsum(jnp.log1p(-alpha + 1e-7), axis=0))
        mean_rho = rho_density / jnp.maximum(density, 1e-12)
        out = alpha * trans * mean_rho
    else:
        raise ValueError(settings.rendering_type)
    return out.reshape(-1), overflow


def check_culling_capacity(
    scene: GaussianScene,
    camera_pos,
    box_points,
    c,
    delta_t,
    settings: RenderSettings,
) -> dict:
    """Diagnose culling-capacity saturation for a representative scan point.

    The block-sparse backends have static per-tile capacities (TileSpec.k_max
    / RSortSpec caps); exceeding them silently truncates contributions. Call
    this once at training start (the CLI does) and raise the caps if
    `overflowed` — a lesson learned the hard way: the tile backend at 100k
    Gaussians saturated k_max=16384 and rendered 40%-off histograms.

    Returns:
      {'overflowed': bool, 'max_count': int, ...} per active backend.
    """
    grid = shell_grid(
        camera_pos, box_points, settings.num_sampling_points,
        settings.start, settings.end, c, delta_t,
    )
    if settings.backend == "pallas_dsort":
        from nlos_gaussian_renderer_tpu.ops.fused_dsort import dsort_cull

        t = dsort_cull(
            scene.means, scene.scales, scene.alive, jnp.asarray(camera_pos),
            grid.theta, grid.phi, grid.r, settings.rsort_spec,
            settings.scaling_modifier,
        )
        return {
            "backend": "pallas_dsort",
            "overflowed": bool(t.overflowed),
            "max_dups": int(t.max_dups),
            "d_max": settings.rsort_spec.d_max,
            "n_rows": int(t.n_rows),
            "n_items": int(t.n_items[0]),
            "w_max": settings.rsort_spec.w_max,
        }
    if settings.backend in ("pallas_rsort", "pallas_analytic"):
        t = rsort_cull(
            scene.means, scene.scales, scene.alive, jnp.asarray(camera_pos),
            grid.theta, grid.phi, grid.r, settings.rsort_spec,
            settings.scaling_modifier,
        )
        return {
            "backend": settings.backend,
            "overflowed": bool(t.overflowed),
            "max_count": int(jnp.max(t.counts)),
            "n_groups": int(t.n_groups),
            "max_groups": settings.rsort_spec.max_groups,
            "n_items": int(t.n_items[0]),
            "w_max": settings.rsort_spec.w_max,
        }
    if settings.backend == "pallas":
        t = cull_tiles(
            scene.means, scene.scales, scene.alive, jnp.asarray(camera_pos),
            grid.theta, grid.phi, grid.r, settings.tile_spec,
            settings.scaling_modifier,
        )
        return {
            "backend": "pallas",
            "overflowed": bool(t.overflowed),
            "max_count": int(jnp.max(t.counts)),
            "k_max": settings.tile_spec.k_max,
        }
    return {"backend": settings.backend, "overflowed": False}


def render_transient(
    scene: GaussianScene,
    camera_pos,
    box_points,
    c,
    delta_t,
    volume_position,
    active_sh_degree,
    settings: RenderSettings,
    gauss_axis: Optional[str] = None,
    layout=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Render the (num_r, ns^2) transient field and its (num_r,) histogram.

    Pipeline (reference `gaussian_transient_rendering`, `nlos_helpers.py:192-232`):
      field -> reshape (num_r, ns^2) -> * sin(theta)/r^2 -> * volume_y^2
      -> sum over angles -> * dtheta*dphi.

    Returns:
      (transient (num_r, ns^2), histogram (num_r,), overflow () bool).
      `overflow` is True when a block-sparse backend saturated a static
      culling capacity for this render (dense/analytic backends never
      truncate, so it is constant False there).
    """
    grid = shell_grid(
        camera_pos,
        box_points,
        settings.num_sampling_points,
        settings.start,
        settings.end,
        c,
        delta_t,
    )
    overflow = jnp.asarray(False)
    aggregate_ok = not settings.occlusion or settings.occlusion_mode == "aggregate"
    if settings.backend in (
        "pallas", "pallas_rsort", "pallas_analytic", "pallas_dsort"
    ) and aggregate_ok:
        out, overflow = field_response_pallas(
            scene, grid, camera_pos, c, delta_t, active_sh_degree, settings,
            gauss_axis=gauss_axis, layout=layout,
        )
    elif settings.backend == "analytic" and aggregate_ok:
        from nlos_gaussian_renderer_tpu.ops.analytic import (
            analytic_field_response,
        )

        out = analytic_field_response(
            scene, grid, camera_pos, c, delta_t, active_sh_degree, settings,
            gauss_axis=gauss_axis,
        )
    elif settings.backend != "dense" and not aggregate_ok:
        # per_gaussian occlusion on an accelerated backend: the fused kernels
        # emit Gaussian-SUMS, but this mode needs the un-reduced matrix for
        # its per-Gaussian transmittance — use the exact Gaussian-chunked
        # scan (memory-safe at any population).
        points = jax.lax.stop_gradient(grid.points.reshape(-1, 3))
        out = field_response_per_gaussian_chunked(
            scene, points, camera_pos, c, delta_t, active_sh_degree, settings,
            gauss_axis=gauss_axis,
        )
    else:
        # Sample positions carry no parameter dependence (reference builds
        # them under no_grad, `nlos_helpers.py:311-315`).
        points = jax.lax.stop_gradient(grid.points.reshape(-1, 3))
        out = field_response(
            scene, points, camera_pos, c, delta_t, active_sh_degree, settings,
            gauss_axis=gauss_axis,
        )
    result = out.reshape(settings.num_bins, settings.num_sampling_points**2)
    result = result * attenuation_weights(grid)
    if settings.apply_volume_y2_factor:
        # Radiometric factor the reference flags "WHAT?? WHY?" but which is
        # load-bearing for the loss scale (`nlos_helpers.py:226`).
        result = result * (jnp.asarray(volume_position)[1] ** 2)
    hist = jnp.sum(result, axis=1) * grid.dtheta * grid.dphi
    return result, hist, overflow


def render_histogram(scene, camera_pos, box_points, c, delta_t, volume_position,
                     active_sh_degree, settings: RenderSettings) -> jax.Array:
    """(num_r,) histogram only."""
    _, hist, _ = render_transient(
        scene, camera_pos, box_points, c, delta_t, volume_position,
        active_sh_degree, settings,
    )
    return hist


def render_histogram_batch(
    scene, camera_positions, box_points, c, delta_t, volume_position,
    active_sh_degree, settings: RenderSettings,
) -> jax.Array:
    """(B, num_r) histograms for a batch of scan points.

    Batched counterpart of the reference's (unfinished) `batch_compute_loss` /
    `batch_estimate_rho_w_no_occlusion` (`nlos_helpers.py:348-351`,
    `gaussian_model.py:366-389`).

    Dense/analytic backends vmap over cameras. The block-sparse Pallas
    backends run a sequential `lax.map` instead: Mosaic cannot lower a
    BATCHED `_ws_build_kernel` (its SMEM work-list outputs pick up a batch
    dim the lowering rejects — hardware-only failure, interpret-mode vmap
    works), and eval-time batch rendering is bandwidth-bound anyway, so a
    per-camera loop costs nothing material."""
    cams = jnp.asarray(camera_positions)

    def one(cam):
        return render_histogram(
            scene, cam, box_points, c, delta_t, volume_position,
            active_sh_degree, settings,
        )

    if settings.backend in (
        "pallas", "pallas_rsort", "pallas_analytic", "pallas_dsort"
    ):
        return jax.lax.map(one, cams)
    return jax.vmap(one)(cams)


def mse_loss(pred_hist, target_hist) -> Tuple[jax.Array, jax.Array]:
    """MSE + normalized ('equal') loss (reference `nlos_helpers.py:322-327`).

    target_hist must already include the gt_times factor.
    """
    loss = jnp.mean((pred_hist - target_hist) ** 2)
    loss_coffe = jnp.mean(target_hist**2)
    return loss, loss / jnp.maximum(loss_coffe, 1e-20)
