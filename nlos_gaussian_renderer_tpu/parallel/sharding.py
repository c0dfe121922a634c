"""shard_map training step: scan-point data parallelism x Gaussian sharding.

Parallel decomposition (SURVEY.md §2.3 TPU design):
  - The batch of confocal scan points is sharded over the 'scan' mesh axis;
    each device renders its scan points fully and gradients are pmean-reduced
    over 'scan' (pure data parallelism, one collective per step).
  - The Gaussian population (and its optimizer state) is sharded over the
    'gauss' mesh axis; per-sample field sums are psum-reduced over 'gauss'
    inside the renderer (exact, because every rendering mode's per-sample
    field is a sum of per-Gaussian terms — see `ops.render.field_response`).

All collectives are XLA psum/pmean over the ICI mesh. There is no parameter
server and no host communication in the step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nlos_gaussian_renderer_tpu.configs.default import OptimizationParams
from nlos_gaussian_renderer_tpu.models.scene import GaussianScene
from nlos_gaussian_renderer_tpu.ops.render import RenderSettings
from nlos_gaussian_renderer_tpu.train import StepAux, TrainState, batched_loss_fn


def _leaf_spec(leaf, capacity: int, gauss_axis: str) -> P:
    """Shard any array whose leading dim is the Gaussian capacity."""
    if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
        return P(gauss_axis, *([None] * (leaf.ndim - 1)))
    return P()


def state_specs(state: TrainState, gauss_axis: str = "gauss"):
    """PartitionSpec pytree for a TrainState (scene + opt state sharded over
    the Gaussian axis; scalars replicated)."""
    capacity = state.scene.capacity
    return jax.tree.map(lambda l: _leaf_spec(l, capacity, gauss_axis), state)


def shard_scene(state: TrainState, mesh: Mesh, gauss_axis: str = "gauss") -> TrainState:
    """Place a TrainState on the mesh with the canonical sharding."""
    specs = state_specs(state, gauss_axis)
    return jax.tree.map(
        lambda l, s: jax.device_put(l, NamedSharding(mesh, s)), state, specs
    )


def make_sharded_densify_step(
    mesh: Mesh,
    state_template: TrainState,
    cap_max: int,
    gauss_axis: str = "gauss",
) -> Callable:
    """Multi-chip MCMC densification: (scene, opt_state, key) -> (scene, opt).

    The donor multinomial must sample from the GLOBAL opacity distribution,
    and a dead slot's donor can live on another shard. Rather than hand-rolling
    the cross-shard donor exchange, the jitted `densify_step` graph is
    partitioned by GSPMD with the canonical Gaussian sharding pinned on inputs
    and outputs: XLA inserts the all-gathers for the categorical sampling and
    the donor-row fetches, and the result is bit-identical to the single-chip
    step (the relocation math is deterministic given the key). Densification
    runs once per `densification_interval` (500 iters), so the gathered
    (capacity,) opacity vector and donor rows are a negligible ICI cost.
    """
    from nlos_gaussian_renderer_tpu.models.densify import densify_step

    specs = state_specs(state_template, gauss_axis)

    def shardings(spec_tree):
        return jax.tree.map(
            lambda s: NamedSharding(mesh, s), spec_tree,
            is_leaf=lambda x: isinstance(x, P),
        )

    return jax.jit(
        lambda scene, opt_state, key: densify_step(
            scene, opt_state, key, cap_max=cap_max
        ),
        in_shardings=(
            shardings(specs.scene),
            shardings(specs.opt_state),
            NamedSharding(mesh, P()),
        ),
        out_shardings=(shardings(specs.scene), shardings(specs.opt_state)),
    )


def _make_local_step(
    settings: RenderSettings,
    optim: OptimizationParams,
    tx: optax.GradientTransformation,
    max_sh_degree: int,
    scan_axis: str,
    gauss_axis: str,
    sh_anneal_interval: int,
) -> Callable:
    """The per-device step body shared by the single- and scan-chunked
    sharded builders (runs inside shard_map; collectives over both axes)."""

    def local_step(state: TrainState, cams, targets, box_points, c, delta_t,
                   volume_position):
        def loss_fn(scene):
            return batched_loss_fn(
                scene,
                cams,
                targets,
                box_points,
                c,
                delta_t,
                volume_position,
                state.active_sh_degree,
                settings,
                optim,
                gauss_axis=gauss_axis,
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.scene)
        # Reduce gradients over the data-parallel axis. Gradients w.r.t. the
        # local Gaussian shard receive contributions from every scan shard.
        grads = jax.lax.pmean(grads, scan_axis)
        loss = jax.lax.pmean(aux.loss, scan_axis)
        eq = jax.lax.pmean(aux.equal_loss, scan_axis)
        overflow = (
            jax.lax.pmax(aux.overflow.astype(jnp.int32), scan_axis) > 0
        )

        updates, opt_state = tx.update(grads, state.opt_state, state.scene)
        scene = optax.apply_updates(state.scene, updates)
        step = state.step + 1
        bump = jnp.logical_and(
            step % sh_anneal_interval == 0, state.active_sh_degree < max_sh_degree
        )
        active = state.active_sh_degree + bump.astype(jnp.int32)
        new_state = TrainState(
            scene=scene, opt_state=opt_state, step=step, active_sh_degree=active
        )
        return new_state, StepAux(
            loss=loss, equal_loss=eq, pred_hist=aux.pred_hist,
            target_hist=aux.target_hist, overflow=overflow,
        )

    return local_step


def make_sharded_train_step(
    mesh: Mesh,
    settings: RenderSettings,
    optim: OptimizationParams,
    tx: optax.GradientTransformation,
    max_sh_degree: int,
    state_template: TrainState,
    scan_axis: str = "scan",
    gauss_axis: str = "gauss",
    sh_anneal_interval: int = 1000,
    donate: bool = True,
) -> Callable:
    """Build the multi-chip train step.

    Requirements: batch size divisible by the 'scan' axis size; scene capacity
    divisible by the 'gauss' axis size.

    Returns:
      step(state, cams (B,3), targets (B,num_r), box_points, c, delta_t,
           volume_position) -> (state, StepAux)
    """
    sspecs = state_specs(state_template, gauss_axis)
    local_step = _make_local_step(
        settings, optim, tx, max_sh_degree, scan_axis, gauss_axis,
        sh_anneal_interval,
    )
    aux_specs = StepAux(
        loss=P(),
        equal_loss=P(),
        pred_hist=P(scan_axis, None),
        target_hist=P(scan_axis, None),
        overflow=P(),
    )
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(sspecs, P(scan_axis, None), P(scan_axis, None), P(), P(), P(), P()),
        out_specs=(sspecs, aux_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_sharded_scanned_train_step(
    mesh: Mesh,
    settings: RenderSettings,
    optim: OptimizationParams,
    tx: optax.GradientTransformation,
    max_sh_degree: int,
    state_template: TrainState,
    scan_axis: str = "scan",
    gauss_axis: str = "gauss",
    sh_anneal_interval: int = 1000,
    donate: bool = True,
) -> Callable:
    """Multi-chip K-step train chunk: one dispatch runs K sequential sharded
    steps via lax.scan INSIDE the shard_map (VERDICT r2 #7).

    On real pods the per-step host dispatch cost is per-HOST, so amortizing
    it matters even more than single-chip: the scan keeps all K steps (and
    their psum/pmean collectives) inside one compiled program on the ICI
    mesh, with zero host round-trips between steps.

    Signature: step_k(state, cams (K, B, 3), targets (K, B, num_r),
                      box_points, c, delta_t, volume_position)
               -> (state, StepAux) stacked along K, overflow any-reduced —
               the same contract as `train.make_scanned_train_step`.
    """
    sspecs = state_specs(state_template, gauss_axis)
    local_step = _make_local_step(
        settings, optim, tx, max_sh_degree, scan_axis, gauss_axis,
        sh_anneal_interval,
    )

    def local_multi(state, cams_k, targets_k, box_points, c, delta_t,
                    volume_position):
        def body(st, xs):
            cams, tgts = xs
            st2, aux = local_step(
                st, cams, tgts, box_points, c, delta_t, volume_position
            )
            return st2, aux

        state, auxs = jax.lax.scan(body, state, (cams_k, targets_k))
        return state, auxs._replace(overflow=jnp.any(auxs.overflow))

    aux_specs = StepAux(
        loss=P(),
        equal_loss=P(),
        pred_hist=P(None, scan_axis, None),
        target_hist=P(None, scan_axis, None),
        overflow=P(),
    )
    sharded = jax.shard_map(
        local_multi,
        mesh=mesh,
        in_specs=(
            sspecs, P(None, scan_axis, None), P(None, scan_axis, None),
            P(), P(), P(), P(),
        ),
        out_specs=(sspecs, aux_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
