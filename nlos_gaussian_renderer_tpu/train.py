"""Training: optimizer, jitted train step, and the loop driver.

Reproduces the reference training semantics (`main.py:142-269`):
  - Adam with six parameter groups and per-group LRs
    (`gaussian_model.py:229-238`; eps=1e-15),
  - log-linear position LR decay (`gaussian_model.py:239-242`),
  - one (or a batch of) random confocal scan point(s) per iteration,
  - MSE against the measured histogram window * gt_times,
  - optional |opacity| / |scale| L1 regularizers (`main.py:204-208`),
  - SH-degree annealing every 1000 iters (fixing the reference's inverted
    `% 1000` test at `main.py:240-241` which fired on 999 of 1000 iters).

TPU-first: the whole update is one jitted, donated train step; scan-point
selection happens on device from a prefetched index stream; batching over scan
points (batch_size > 1) amortizes compile/dispatch and feeds the MXU.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams
from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData
from nlos_gaussian_renderer_tpu.models.scene import (
    GaussianScene,
    init_scene,
    scene_param_labels,
)
from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.render import (
    RenderSettings,
    mse_loss,
    render_transient,
)
from nlos_gaussian_renderer_tpu.ops.schedule import expon_lr_schedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    scene: GaussianScene
    opt_state: Any
    step: jax.Array  # int32 scalar, 1-based like the reference
    active_sh_degree: jax.Array  # int32 scalar


def make_optimizer(
    optim: OptimizationParams, spatial_lr_scale: float = 1.0
) -> optax.GradientTransformation:
    """Six Adam groups matching `GaussianModel.training_setup`
    (`gaussian_model.py:223-242`), with the position group on the Plenoxels
    log-linear decay schedule."""

    mu_schedule = expon_lr_schedule(
        lr_init=optim.position_lr_init * spatial_lr_scale,
        lr_final=optim.position_lr_final * spatial_lr_scale,
        lr_delay_mult=optim.position_lr_delay_mult,
        max_steps=optim.position_lr_max_steps,
    )

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    return optax.multi_transform(
        {
            "mu": adam(mu_schedule),
            "f_dc": adam(optim.feature_lr),
            "f_rest": adam(optim.feature_lr / 20.0),
            "opacity": adam(optim.opacity_lr),
            "scaling": adam(optim.scaling_lr),
            "rotation": adam(optim.rotation_lr),
            "frozen": optax.set_to_zero(),
        },
        param_labels=scene_param_labels,
    )


class StepAux(NamedTuple):
    loss: jax.Array
    equal_loss: jax.Array
    pred_hist: jax.Array  # (B, num_r) prediction of the first batch element
    target_hist: jax.Array
    # True when a block-sparse culling capacity saturated during this step's
    # render — the histogram silently lost contributions and the caps must be
    # re-tuned (see `fit`). Constant False on dense/analytic backends.
    overflow: jax.Array = jnp.asarray(False)


def batched_loss_fn(
    scene: GaussianScene,
    cams: jax.Array,  # (B, 3)
    targets: jax.Array,  # (B, num_r), already * gt_times
    box_points: jax.Array,
    c: float,
    delta_t: float,
    volume_position: jax.Array,
    active_sh_degree: jax.Array,
    settings: RenderSettings,
    optim: OptimizationParams,
    gauss_axis: Optional[str] = None,
    layout=None,
) -> Tuple[jax.Array, StepAux]:
    def one(cam, target):
        _, hist, overflow = render_transient(
            scene, cam, box_points, c, delta_t, volume_position,
            active_sh_degree, settings, gauss_axis=gauss_axis,
            layout=layout,
        )
        loss, eq = mse_loss(hist, target)
        return loss, eq, hist, overflow

    if cams.shape[0] == 1:
        # Unbatched fast path: vmap rewrites the cull's (G,) sort into a
        # (1, G) dim-1 sort, which takes a far slower lane-oriented XLA
        # lowering than the flat 1-D sort (hardware-measured; see
        # docs/DESIGN.md). B=1 is the reference's training regime, so this
        # path is the hot one.
        losses, eqs, hists, overflows = jax.tree.map(
            lambda x: x[None], one(cams[0], targets[0])
        )
    else:
        losses, eqs, hists, overflows = jax.vmap(one)(cams, targets)
    loss = jnp.mean(losses)

    if optim.regularization:
        # Reference regs (`main.py:204-208`), masked to alive slots so dead
        # capacity padding cannot bias the means.
        n_alive = scene.num_alive
        op_sum = jnp.sum(jnp.abs(scene.opacities))
        sc_sum = jnp.sum(jnp.abs(scene.scales) * scene.alive[:, None])
        if gauss_axis is not None:
            n_alive, op_sum, sc_sum = jax.lax.psum(
                jnp.stack([n_alive, op_sum, sc_sum]), gauss_axis
            )
        n_alive = jnp.maximum(n_alive, 1.0)
        loss = (
            loss
            + optim.opacity_reg * op_sum / n_alive
            + optim.scale_reg * sc_sum / (3.0 * n_alive)
        )

    return loss, StepAux(
        loss=loss, equal_loss=jnp.mean(eqs), pred_hist=hists,
        target_hist=targets, overflow=jnp.any(overflows),
    )


def sgld_position_noise(
    scene: GaussianScene, key: jax.Array, lr: jax.Array,
    optim: OptimizationParams,
) -> jax.Array:
    """Covariance-shaped exploration noise for the Gaussian positions.

    The stochastic term of MCMC-GS (Kheradmand et al. 2024): per Gaussian,
    noise = lr * noise_lr * gate(opacity) * (R S eps), so low-opacity
    Gaussians random-walk through the volume while confident ones stay put.
    gate is a sharp reverse sigmoid around the dead-opacity knee.
    """
    eps = jax.random.normal(key, scene.means.shape, scene.means.dtype)
    rot = gmath.quat_to_rotmat(scene.rotations)  # (N, 3, 3)
    s_eps = scene.scales * eps  # diag(S) eps
    shaped = jnp.stack(
        [
            sum(rot[:, i, j] * s_eps[:, j] for j in range(3))
            for i in range(3)
        ],
        axis=-1,
    )
    op = jax.nn.sigmoid(scene.logit_opacities[:, 0])
    gate = jax.nn.sigmoid(-100.0 * (op - optim.sgld_opacity_knee))
    scale = lr * optim.noise_lr * gate * scene.alive
    return shaped * scale[:, None]


def make_train_step(
    settings: RenderSettings,
    optim: OptimizationParams,
    tx: optax.GradientTransformation,
    max_sh_degree: int,
    sh_anneal_interval: int = 1000,
    seed: int = 0,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    Signature: step(state, cams (B,3), targets (B,num_r), box_points, c,
                    delta_t, volume_position) -> (state, StepAux)

    `donate=False` keeps the input state buffers alive after the call — the
    training loop uses this to retry a step/chunk from its pre-update state
    when the render reports culling-capacity overflow (no copy needed).
    """
    return jax.jit(
        _unjitted_train_step(
            settings, optim, tx, max_sh_degree, sh_anneal_interval, seed
        ),
        donate_argnums=(0,) if donate else (),
    )


def _unjitted_train_step(
    settings: RenderSettings,
    optim: OptimizationParams,
    tx: optax.GradientTransformation,
    max_sh_degree: int,
    sh_anneal_interval: int = 1000,
    seed: int = 0,
) -> Callable:
    mu_schedule = expon_lr_schedule(
        lr_init=optim.position_lr_init,
        lr_final=optim.position_lr_final,
        lr_delay_mult=optim.position_lr_delay_mult,
        max_steps=optim.position_lr_max_steps,
    )

    def train_step(state: TrainState, cams, targets, box_points, c, delta_t,
                   volume_position, layout=None):
        grad_fn = jax.value_and_grad(batched_loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(
            state.scene,
            cams,
            targets,
            box_points,
            c,
            delta_t,
            volume_position,
            state.active_sh_degree,
            settings,
            optim,
            layout=layout,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.scene)
        scene = optax.apply_updates(state.scene, updates)
        if optim.sgld_noise:
            # Derive the noise stream from the run seed: reruns with different
            # cfg.rng must not share identical SGLD noise.
            key = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            scene = dataclasses.replace(
                scene,
                means=scene.means
                + sgld_position_noise(scene, key, mu_schedule(state.step), optim),
            )
        step = state.step + 1
        # Intended annealing: +1 SH band every `sh_anneal_interval` iters
        # (reference main.py:240-241 has the test inverted; we fix it).
        bump = jnp.logical_and(
            step % sh_anneal_interval == 0, state.active_sh_degree < max_sh_degree
        )
        active = state.active_sh_degree + bump.astype(jnp.int32)
        return (
            TrainState(
                scene=scene, opt_state=opt_state, step=step, active_sh_degree=active
            ),
            aux,
        )

    return train_step


def make_scanned_train_step(
    settings: RenderSettings,
    optim: OptimizationParams,
    tx: optax.GradientTransformation,
    max_sh_degree: int,
    sh_anneal_interval: int = 1000,
    seed: int = 0,
    donate: bool = True,
    ref_cam=None,
    layout_slack: float = 0.0,
    densify_seed: Optional[int] = None,
) -> Callable:
    """Build a jitted K-step train chunk: one dispatch runs K sequential
    steps via lax.scan.

    Per-step host dispatch (pytree flattening + enqueue through the remote
    tunnel) measures ~1.5-2 ms — comparable to the device step itself at
    100k Gaussians. Scanning K steps inside one call amortizes it away.

    With `ref_cam` (rsort-family backends only), the chunk builds ONE frozen
    sorted block layout (`fused_rsort.rsort_layout`) from the entering
    parameters and the reference camera and reuses it for all K steps —
    removing the per-step sort + layout scatters (~2.4 ms/step at 100k).
    Rendering stays exact for every scan point (see `RSortLayout`);
    `layout_slack` must cover the max distance from `ref_cam` to any scan
    point (plus parameter drift over one chunk — mm at Adam scale).

    With `densify_seed` (and `optim.mcmc_densification_flag`), the MCMC
    densification hook (reference `main.py:243-247`) runs IN-GRAPH: after
    each scanned update, a `lax.cond` on the post-update step counter fires
    `densify_step` exactly when the per-step path would (the scene has
    FIXED capacity + an alive mask, so densification is fixed-shape and
    scan-safe). Keys derive from `fold_in(PRNGKey(densify_seed), step)` —
    identical to `fit`'s per-step path, so chunked and per-step densified
    runs are bit-identical. Capacity re-tunes stay host-side: `fit` checks
    chunk-spanned densify events at chunk boundaries, and the overflow gate
    replays any chunk whose mid-chunk growth saturated the caps.

    Signature: step_k(state, cams (K, B, 3), targets (K, B, num_r),
                      box_points, c, delta_t, volume_position)
               -> (state, StepAux) with loss/equal_loss/pred_hist/target_hist
               stacked along a leading K axis and overflow any-reduced.
    """
    single = _unjitted_train_step(
        settings, optim, tx, max_sh_degree, sh_anneal_interval, seed
    )
    use_layout = ref_cam is not None and settings.backend in (
        "pallas_rsort", "pallas_analytic"
    )
    densify = densify_seed is not None and optim.mcmc_densification_flag

    def multi(state, cams_k, targets_k, box_points, c, delta_t,
              volume_position):
        layout = None
        if use_layout:
            from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
                rsort_layout,
            )
            from nlos_gaussian_renderer_tpu.ops.sampling import shell_grid

            cam0 = jnp.asarray(ref_cam, jnp.float32)
            grid0 = shell_grid(
                cam0, box_points, settings.num_sampling_points,
                settings.start, settings.end, c, delta_t,
            )
            sc = state.scene
            layout = rsort_layout(
                sc.means, sc.scales, sc.alive, cam0,
                grid0.theta, grid0.phi, grid0.r, settings.rsort_spec,
                settings.scaling_modifier, slack=layout_slack,
            )

        def body(st, xs):
            cams, tgts = xs
            st2, aux = single(
                st, cams, tgts, box_points, c, delta_t, volume_position,
                layout=layout,
            )
            if densify:
                from nlos_gaussian_renderer_tpu.models.densify import (
                    densify_step,
                )

                # Post-update step counter == the per-step path's
                # `cur = it + 2` (step starts at 1; see fit).
                cur = st2.step
                do = jnp.logical_and(
                    cur % optim.densification_interval == 0,
                    jnp.logical_and(
                        cur > optim.densify_from_iter,
                        cur < optim.densify_until_iter,
                    ),
                )

                def dfn(s):
                    sub = jax.random.fold_in(
                        jax.random.PRNGKey(densify_seed), s.step
                    )
                    scene2, opt2 = densify_step(
                        s.scene, s.opt_state, sub, cap_max=optim.cap_max
                    )
                    return TrainState(
                        scene=scene2, opt_state=opt2, step=s.step,
                        active_sh_degree=s.active_sh_degree,
                    )

                st2 = jax.lax.cond(do, dfn, lambda s: s, st2)
            return st2, aux

        state, auxs = jax.lax.scan(body, state, (cams_k, targets_k))
        return state, auxs._replace(overflow=jnp.any(auxs.overflow))

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def create_train_state(
    scene: GaussianScene, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        scene=scene,
        opt_state=tx.init(scene),
        step=jnp.asarray(1, jnp.int32),
        active_sh_degree=jnp.asarray(0, jnp.int32),
    )


# --- scan-point sampling (reference `cycle_random_pairs`, `main.py:27-36`) ---


def scan_point_stream(
    rng: np.random.Generator, m: int, n: int, batch: int
) -> Iterator[np.ndarray]:
    """Yield (batch,) flat scan indices, reshuffling each epoch."""
    all_idx = np.arange(m * n)
    buf: list[int] = []
    while True:
        rng.shuffle(all_idx)
        buf.extend(all_idx.tolist())
        while len(buf) >= batch:
            out, buf = buf[:batch], buf[batch:]
            yield np.asarray(out, dtype=np.int32)


@dataclasses.dataclass
class FitResult:
    state: TrainState
    losses: np.ndarray
    equal_losses: np.ndarray
    iters_per_sec: float
    # True if any monitored step saturated a culling capacity that could not
    # be healed by re-tuning (should be False for a healthy run).
    overflow_detected: bool = False
    # Number of capacity re-tunes (overflow- or densification-triggered).
    retunes: int = 0


def layout_reference(data: NLOSData) -> Tuple[np.ndarray, float]:
    """(ref_cam, slack) for the frozen-layout cull: the scan-grid centroid
    and its aperture radius plus a parameter-drift allowance (positions move
    ~um/step under Adam; 2 cm covers thousands of steps between layout
    refreshes with orders of magnitude to spare — and staleness beyond the
    slack is detected, not silent; see `fused_rsort.RSortLayout`)."""
    grid = np.asarray(data.camera_grid_positions).T.reshape(-1, 3)
    ref = grid.mean(axis=0).astype(np.float32)
    slack = float(np.max(np.linalg.norm(grid - ref[None, :], axis=1))) + 0.02
    return ref, slack


def probe_scan_points(data: NLOSData) -> np.ndarray:
    """Representative scan points for capacity fitting: the four corners and
    the middle of the scan grid (corners concentrate the population into few
    angular tiles and drive the worst-case culling capacities)."""
    _, m, n = data.shape
    grid = np.asarray(data.camera_grid_positions).T  # (MN, 3)
    ids = [0, n - 1, (m - 1) * n, m * n - 1, (m * n) // 2]
    return grid[sorted(set(ids))]


def _cap_bucket(v: int) -> int:
    """Round a capacity up to the next quarter-power-of-2 step.

    Steps are multiples of 2^(k-2) within each octave [2^k, 2^(k+1)), i.e.
    x1.0 / x1.25 / x1.5 / x1.75 — so repeated re-fits of a slowly growing
    population land on the same value until it really outgrows the bucket.
    Small caps (<= 64) pass through exactly (their compiles are cheap and
    tests rely on tight values).
    """
    v = int(v)
    if v <= 64:
        return v
    step = 1 << max((v - 1).bit_length() - 2, 0)
    return -(-v // step) * step


def fit_culling_capacity(
    settings: RenderSettings,
    scene: GaussianScene,
    probe_cams: np.ndarray,
    box_points,
    c: float,
    delta_t: float,
    grow_only: bool = True,
    ref_cam=None,
    layout_slack: float = 0.0,
) -> Tuple[RenderSettings, bool]:
    """Fit the active backend's static culling capacities to the scene.

    Returns (settings, changed). With `grow_only` (the runtime re-tune mode)
    capacities only ever grow (element-wise max with the current spec) so a
    re-tune never shrinks a compiled step's caps; the initial fit
    (`prepare_training`) passes grow_only=False to size them tightly.
    Backends without static capacities return unchanged settings.
    """
    if settings.backend == "pallas_dsort":
        from nlos_gaussian_renderer_tpu.ops.fused_dsort import tune_dsort_spec

        cur = settings.rsort_spec
        fitted = tune_dsort_spec(
            scene, probe_cams, box_points, settings.num_sampling_points,
            settings.start, settings.end, c, delta_t, base=cur,
            scaling_modifier=settings.scaling_modifier,
        )
        if grow_only:
            new = cur._replace(
                d_max=max(cur.d_max, fitted.d_max),
                dup_rows=max(cur.dup_rows, fitted.dup_rows),
                w_max=max(cur.w_max, fitted.w_max),
            )
        else:
            new = fitted
        return settings._replace(rsort_spec=new), new != cur
    if settings.backend in ("pallas_rsort", "pallas_analytic"):
        from nlos_gaussian_renderer_tpu.ops.fused_rsort import tune_rsort_spec

        cur = settings.rsort_spec
        fitted = tune_rsort_spec(
            scene, probe_cams, box_points, settings.num_sampling_points,
            settings.start, settings.end, c, delta_t, base=cur,
            scaling_modifier=settings.scaling_modifier,
            ref_cam=ref_cam, slack=layout_slack,
        )
        if grow_only:
            # Quantize runtime growth to quarter-power-of-2 buckets: every
            # changed cap is a NEW compiled program, and a densifying run
            # grows the population ~5% per event — unbucketed caps would
            # recompile at nearly every densification (hundreds over a 50k
            # run). Buckets cap the overshoot at ~25% (on top of tune's
            # headroom) and make recompiles logarithmic in total growth.
            new = cur._replace(
                max_groups=max(cur.max_groups, _cap_bucket(fitted.max_groups)),
                w_max=max(cur.w_max, _cap_bucket(fitted.w_max)),
            )
        else:
            new = fitted
        return settings._replace(rsort_spec=new), new != cur
    if settings.backend == "pallas":
        from nlos_gaussian_renderer_tpu.ops.render import check_culling_capacity

        changed = False
        for cam in np.asarray(probe_cams).reshape(-1, 3):
            tries = 0
            diag = check_culling_capacity(
                scene, jnp.asarray(cam), box_points, c, delta_t, settings
            )
            # max_count is clamped at k_max, so double until it stops
            # saturating rather than trusting the reported count.
            while diag.get("overflowed") and tries < 8:
                spec = settings.tile_spec
                new_k = 2 * spec.k_max
                print(
                    f"culling capacity saturated ({diag}); raising k_max -> {new_k}"
                )
                settings = settings._replace(
                    tile_spec=spec._replace(k_max=new_k)
                )
                changed = True
                tries += 1
                diag = check_culling_capacity(
                    scene, jnp.asarray(cam), box_points, c, delta_t, settings
                )
        return settings, changed
    return settings, False


def prepare_training(
    cfg: Config,
    optim: OptimizationParams,
    data: NLOSData,
    init_points: Optional[np.ndarray] = None,
    init_rhos: Optional[np.ndarray] = None,
    seed: Optional[int] = None,
):
    """Create (scene, tx, settings, device arrays) from config + data.

    If init points are not given, uses uniform random-in-volume init with the
    reference's margin semantics (`init_rand_points`, `gaussian_utils.py:8-32`).
    Space-carving init lives in `utils/carving.py` and plugs in via
    init_points/init_rhos.
    """
    rng = np.random.default_rng(cfg.rng if seed is None else seed)
    pmin = data.volume_position - data.volume_size / 2
    pmax = data.volume_position + data.volume_size / 2
    if init_points is None:
        from nlos_gaussian_renderer_tpu.utils.init import init_rand_points

        init_points, init_rhos = init_rand_points(
            rng, cfg.init_gaussian_num, pmin, pmax, margin=cfg.init_sample_margin
        )
    scene = init_scene(
        init_points,
        init_rhos,
        pmin,
        pmax,
        max_sh_degree=cfg.sh_degree,
        capacity=cfg.capacity(optim),
    )
    tx = make_optimizer(optim)
    settings = RenderSettings.from_config(cfg)
    box_points = gmath.volume_box_points(
        jnp.asarray(data.volume_position), data.volume_size
    )
    # Fit the block-sparse culling capacities to the initial population up
    # front (static shapes; re-fitted by `fit` when densification grows the
    # population or a step reports overflow).
    probes = probe_scan_points(data)
    ref_cam, layout_slack = (
        layout_reference(data) if cfg.frozen_layout else (None, 0.0)
    )
    settings, _ = fit_culling_capacity(
        settings, scene, probes, box_points, data.c, data.deltaT,
        grow_only=False, ref_cam=ref_cam, layout_slack=layout_slack,
    )
    if settings.backend in ("pallas", "pallas_rsort", "pallas_analytic",
                            "pallas_dsort"):
        from nlos_gaussian_renderer_tpu.ops.render import check_culling_capacity

        diag = check_culling_capacity(
            scene, jnp.asarray(probes[-1]), box_points, data.c, data.deltaT,
            settings,
        )
        if diag.get("overflowed"):
            print(f"WARNING: culling capacity saturated — raise caps! {diag}")
        else:
            print(f"culling capacity ok: {diag}")
    return scene, tx, settings, box_points


def fit(
    cfg: Config,
    optim: OptimizationParams,
    data: NLOSData,
    num_iters: Optional[int] = None,
    init_points: Optional[np.ndarray] = None,
    init_rhos: Optional[np.ndarray] = None,
    log_every: Optional[int] = None,
    callback: Optional[Callable[[int, TrainState, StepAux], None]] = None,
    init_state: Optional[TrainState] = None,
    callback_every: Optional[int] = None,
) -> FitResult:
    """Run the training loop (reference `train`, `main.py:273-371`).

    The warmup loop (`warmup_learn_func`) performs identical updates to the
    main loop, so warmup+main is a single loop here. Pass `init_state` (e.g.
    a restored checkpoint) to resume training — a capability the reference
    never wired up (its restore is only reachable from `evaluation()`).

    Callback cadence: with `callback_every=k`, the callback fires only at
    iterations where (it + 1) % k == 0 (plus the final iteration) — which
    lets `fit` keep the scan-chunked fast path (K device steps per host
    dispatch) with callbacks installed. Without `callback_every`, a callback
    forces the per-step path and fires every iteration (legacy contract).

    Overflow prevention: every chunk (fast path) or log window (per-step
    path) runs against a retained pre-chunk state; if the render reports a
    saturated culling capacity, the caps are re-tuned and the chunk/window
    is re-run from that state — truncated gradients never land in the
    optimizer (the final parameters are bit-identical to a run whose caps
    were big enough from the start).
    """
    num_iters = num_iters if num_iters is not None else optim.iterations
    log_every = log_every if log_every is not None else cfg.print_interval
    rng = np.random.default_rng(cfg.rng)

    scene, tx, settings, box_points = prepare_training(
        cfg, optim, data, init_points, init_rhos
    )
    state = init_state if init_state is not None else create_train_state(scene, tx)
    # donate=False: pre-step buffers stay alive, so an overflow-flagged
    # chunk/window can be retried from its exact starting state (costs one
    # extra state's worth of HBM, never a copy).
    step_fn = make_train_step(
        settings, optim, tx, cfg.sh_degree, seed=cfg.rng, donate=False
    )
    step_chunk_fn = None

    l, m, n = data.shape
    nlos = jnp.asarray(data.nlos_data.reshape(l, m * n))  # (L, MN)
    cam_grid = jnp.asarray(data.camera_grid_positions.T)  # (MN, 3)
    vol_pos = jnp.asarray(data.volume_position)
    probe_cams = probe_scan_points(data)
    ref_cam, layout_slack = (
        layout_reference(data) if cfg.frozen_layout else (None, 0.0)
    )
    retunes = 0
    overflow_detected = False

    def retune(state):
        """Grow culling capacities to the current population; rebuild the
        step on change. Keeps silent truncation impossible during training:
        with --densify the population grows 5%/interval past whatever the
        initial capacity check saw (the `ray_aabb.cu:10-61` silent-256-cap
        failure mode, and this repo's own 40%-off-histogram war story)."""
        nonlocal settings, step_fn, step_chunk_fn, retunes
        new_settings, changed = fit_culling_capacity(
            settings, state.scene, probe_cams, box_points, data.c,
            data.deltaT, ref_cam=ref_cam, layout_slack=layout_slack,
        )
        if changed:
            settings = new_settings
            step_fn = make_train_step(
                settings, optim, tx, cfg.sh_degree, seed=cfg.rng, donate=False
            )
            if step_chunk_fn is not None:
                step_chunk_fn = make_scanned_train_step(
                    settings, optim, tx, cfg.sh_degree, seed=cfg.rng,
                    donate=False, ref_cam=ref_cam, layout_slack=layout_slack,
                    densify_seed=chunk_densify_seed,
                )
            retunes += 1
            if settings.backend in ("pallas_rsort", "pallas_analytic",
                                    "pallas_dsort"):
                caps = settings.rsort_spec
                print(
                    "culling capacities re-tuned: "
                    f"max_groups={caps.max_groups} w_max={caps.w_max}"
                )
            else:
                print(
                    f"culling capacity re-tuned: k_max={settings.tile_spec.k_max}"
                )
        return changed

    @jax.jit
    def gather_batch(idx):
        cams = cam_grid[idx]  # (B, 3)
        # Histogram window [start, end) for each scan point, * gt_times.
        targets = nlos[cfg.start : cfg.end, :].T[idx] * cfg.gt_times
        return cams, targets

    stream = scan_point_stream(rng, m, n, cfg.batch_size)
    losses, eqs = [], []
    # Densify keys derive from (base seed, post-update step counter) — a
    # pure function of the iteration, so the per-step path, the in-scan
    # chunked path, and every overflow replay all draw the identical key.
    densify_base = jax.random.PRNGKey(cfg.rng + 1)

    def densify_fires(cur: int) -> bool:
        """True when the per-step hook densifies at post-update counter
        `cur` (= 0-based loop index + 2; reference `main.py:243-247`)."""
        return (
            optim.mcmc_densification_flag
            and optim.densify_from_iter < cur < optim.densify_until_iter
            and cur % optim.densification_interval == 0
        )

    def force_grow_caps(state) -> bool:
        """Escalation when a re-tune fitted to the pre-chunk scene cannot
        cover mid-chunk densification growth: grow the block-sparse caps
        25% beyond the fit and rebuild. Returns False for backends without
        static caps."""
        nonlocal settings, step_fn, step_chunk_fn, retunes
        if settings.backend not in ("pallas_rsort", "pallas_analytic",
                                    "pallas_dsort"):
            return False
        caps = settings.rsort_spec
        settings = settings._replace(
            rsort_spec=caps._replace(
                max_groups=int(caps.max_groups * 1.25) + 1,
                w_max=int(caps.w_max * 1.25) + 1,
            )
        )
        step_fn = make_train_step(
            settings, optim, tx, cfg.sh_degree, seed=cfg.rng, donate=False
        )
        if step_chunk_fn is not None:
            step_chunk_fn = make_scanned_train_step(
                settings, optim, tx, cfg.sh_degree, seed=cfg.rng,
                donate=False, ref_cam=ref_cam, layout_slack=layout_slack,
                densify_seed=chunk_densify_seed,
            )
        retunes += 1
        print(
            "culling capacities force-grown past the fit: "
            f"max_groups={settings.rsort_spec.max_groups} "
            f"w_max={settings.rsort_spec.w_max}"
        )
        return True

    def run_gated(chunked, st, *args, what="", may_densify=False):
        """One step/chunk with the overflow gate: on a saturated culling
        capacity, re-tune and re-run from the (still live, non-donated)
        input state so no truncated gradient reaches the optimizer.

        `chunked` selects the CURRENT step builder by name (retune rebuilds
        both nonlocals; a captured function object would go stale).
        `may_densify`: the chunk densifies in-graph, so a fit against the
        pre-chunk scene may still under-cap the grown population — escalate
        with a forced cap growth instead of giving up."""
        nonlocal overflow_detected
        st2, aux = (step_chunk_fn if chunked else step_fn)(st, *args)
        for _ in range(4):
            if not bool(aux.overflow):
                break
            print(
                f"WARNING: culling capacity overflow in {what} — re-tuning "
                "caps and re-running from the pre-overflow state"
            )
            if not retune(st) and not (may_densify and force_grow_caps(st)):
                # Caps at the fitted maximum and still overflowing: keep the
                # (superset-capped) result and record the failure.
                overflow_detected = True
                break
            st2, aux = (step_chunk_fn if chunked else step_fn)(st, *args)
        return st2, aux

    # Scan-chunked fast path: run `chunk` steps per jitted dispatch
    # (per-step host dispatch costs ~1.5-2 ms — comparable to the device
    # step itself at 100k Gaussians). Chunks align with the logging AND
    # callback cadences so recorded losses / callback behavior are unchanged.
    import math as _math

    cadence = log_every
    if callback is not None:
        cadence = (
            _math.gcd(log_every, callback_every) if callback_every else 0
        )
    chunk = 1
    # Densified training rides the fast path too (VERDICT r3 #4): the
    # densify hook runs in-graph inside the scanned chunk (see
    # make_scanned_train_step), so no boundary alignment is needed. The one
    # exclusion is frozen_layout + densify: a mid-chunk relocation
    # teleports Gaussians past the layout slack, and the chunk-entry layout
    # can never be rebuilt mid-scan — the per-step path re-freezes after
    # each densify instead.
    densify_chunk_ok = not (optim.mcmc_densification_flag and cfg.frozen_layout)
    if cadence and densify_chunk_ok:
        for cand in (50, 25, 20, 10, 5, 4, 2):
            if cadence % cand == 0 and num_iters >= cand:
                chunk = cand
                break
    chunk_densify_seed = (
        cfg.rng + 1 if optim.mcmc_densification_flag and chunk > 1 else None
    )

    def fire_callback(it_end, st, aux_last):
        if callback is None:
            return
        if (
            callback_every is None
            or it_end % callback_every == 0
            or it_end == num_iters
        ):
            callback(it_end - 1, st, aux_last)

    if chunk > 1:
        step_chunk_fn = make_scanned_train_step(
            settings, optim, tx, cfg.sh_degree, seed=cfg.rng, donate=False,
            ref_cam=ref_cam, layout_slack=layout_slack,
            densify_seed=chunk_densify_seed,
        )
        t0 = time.time()
        it = 0
        while it < num_iters:
            k = chunk if it + chunk <= num_iters else 1
            # Does a densify event fire inside [it, it + k)? (post-update
            # counters it+2 .. it+k+1). In-graph for k > 1; host-side for
            # the k == 1 tail below. Either way the caps are re-fitted to
            # the grown population right after.
            densified = [
                j for j in range(it, it + k) if densify_fires(j + 2)
            ]
            if k > 1:
                idx = jnp.asarray(
                    np.stack([next(stream) for _ in range(k)])
                )  # (k, B)
                cams, targets = jax.vmap(gather_batch)(idx)
                state, auxs = run_gated(
                    True, state, cams, targets, box_points, data.c,
                    data.deltaT, vol_pos, what=f"chunk ending at iter {it + k}",
                    may_densify=bool(densified),
                )
                aux = StepAux(
                    loss=auxs.loss[-1], equal_loss=auxs.equal_loss[-1],
                    pred_hist=auxs.pred_hist[-1],
                    target_hist=auxs.target_hist[-1], overflow=auxs.overflow,
                )
                if densified:
                    retune(state)
            else:
                idx = jnp.asarray(next(stream))
                cams, targets = gather_batch(idx)
                state, aux = run_gated(
                    False, state, cams, targets, box_points, data.c,
                    data.deltaT, vol_pos, what=f"iter {it + 1}",
                )
                if densified:
                    from nlos_gaussian_renderer_tpu.models.densify import (
                        densify_step,
                    )

                    sub = jax.random.fold_in(densify_base, it + 2)
                    scene2, opt2 = densify_step(
                        state.scene, state.opt_state, sub,
                        cap_max=optim.cap_max,
                    )
                    state = TrainState(
                        scene=scene2, opt_state=opt2, step=state.step,
                        active_sh_degree=state.active_sh_degree,
                    )
                    retune(state)
            it += k
            if it % log_every == 0 or it == num_iters:
                losses.append(float(aux.loss))
                eqs.append(float(aux.equal_loss))
            fire_callback(it, state, aux)
        jax.block_until_ready(state.scene.means)
        dt = time.time() - t0
        return FitResult(
            state=state,
            losses=np.asarray(losses),
            equal_losses=np.asarray(eqs),
            iters_per_sec=num_iters / max(dt, 1e-9),
            overflow_detected=overflow_detected,
            retunes=retunes,
        )

    # Per-step path (per-iter callbacks and/or densification). Overflow is
    # accumulated on device (no per-iter sync) and inspected at log
    # boundaries; on overflow the whole window since the last boundary is
    # replayed from its retained starting state with re-tuned caps, so the
    # optimizer never keeps a truncated gradient.
    of_acc = jnp.asarray(False)
    window_start_state = state
    window_events: list = []  # ("step", idx) | ("densify", key) since boundary
    t0 = time.time()
    for it in range(num_iters):
        idx = jnp.asarray(next(stream))
        cams, targets = gather_batch(idx)
        state, aux = step_fn(
            state, cams, targets, box_points, data.c, data.deltaT, vol_pos
        )
        window_events.append(("step", idx))
        # MCMC densification hook (reference `main.py:243-247`).
        if optim.mcmc_densification_flag:
            cur = it + 2  # state.step after the update, avoids device sync
            if densify_fires(cur):
                from nlos_gaussian_renderer_tpu.models.densify import densify_step

                sub = jax.random.fold_in(densify_base, cur)
                scene2, opt2 = densify_step(
                    state.scene, state.opt_state, sub, cap_max=optim.cap_max
                )
                state = TrainState(
                    scene=scene2, opt_state=opt2, step=state.step,
                    active_sh_degree=state.active_sh_degree,
                )
                window_events.append(("densify", sub))
                # The population just grew: re-fit the culling capacities
                # before the next render can truncate.
                retune(state)
        of_acc = jnp.logical_or(of_acc, aux.overflow)
        if (it + 1) % log_every == 0 or it == num_iters - 1:
            for _ in range(4):
                if not bool(of_acc):
                    break
                print(
                    f"WARNING: culling capacity overflow by iter {it + 1} — "
                    "re-tuning caps and replaying the window"
                )
                if not retune(state):
                    overflow_detected = True
                    break
                # Replay every event since the last boundary from the
                # retained pre-window state with the re-tuned caps.
                st = window_start_state
                of_acc = jnp.asarray(False)
                for ev, payload in window_events:
                    if ev == "step":
                        cams_r, targets_r = gather_batch(payload)
                        st, aux = step_fn(
                            st, cams_r, targets_r, box_points, data.c,
                            data.deltaT, vol_pos,
                        )
                        of_acc = jnp.logical_or(of_acc, aux.overflow)
                    else:
                        from nlos_gaussian_renderer_tpu.models.densify import (
                            densify_step,
                        )

                        scene2, opt2 = densify_step(
                            st.scene, st.opt_state, payload,
                            cap_max=optim.cap_max,
                        )
                        st = TrainState(
                            scene=scene2, opt_state=opt2, step=st.step,
                            active_sh_degree=st.active_sh_degree,
                        )
                state = st
            losses.append(float(aux.loss))
            eqs.append(float(aux.equal_loss))
            of_acc = jnp.asarray(False)
            window_start_state = state
            window_events = []
        if callback is not None and callback_every is None:
            callback(it, state, aux)
        else:
            fire_callback(it + 1, state, aux)
    jax.block_until_ready(state.scene.means)
    dt = time.time() - t0
    return FitResult(
        state=state,
        losses=np.asarray(losses),
        equal_losses=np.asarray(eqs),
        iters_per_sec=num_iters / max(dt, 1e-9),
        overflow_detected=overflow_detected,
        retunes=retunes,
    )
