"""MCMC-GS densification on a fixed-capacity, alive-masked scene.

Reimplements the reference's density control (`gaussian_model.py:392-549`,
driven from `main.py:243-247`) — dead-Gaussian relocation and capped growth —
but with static shapes throughout: the scene never changes size; dead capacity
slots are revived instead of appending tensors, and optimizer-moment resets
are mask-writes instead of optimizer-state surgery. The whole densify step is
jittable and shard_map-compatible.

The relocation math is the binomial moment-matching rule of
"3D Gaussian Splatting as MCMC" (Kheradmand et al. 2024): splitting a Gaussian
with opacity o into N copies uses
    o_new = 1 - (1 - o)^(1/N)
    s_new = s * o / sum_{i=1..N} sum_{k=0..i-1} C(i-1,k) (-1)^k o_new^{k+1}/sqrt(k+1)
The reference *calls* this kernel (`compute_relocation_cuda`,
`gaussian_model.py:471-481`) but never ships or imports it — the whole MCMC
path is dead code there (SURVEY.md §2.2). Here it is implemented for real.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nlos_gaussian_renderer_tpu.models.scene import GaussianScene
from nlos_gaussian_renderer_tpu.ops import math as gmath

# Maximum split multiplicity in the relocation rule (the MCMC-3DGS binomial
# table size; counts are clamped to this).
MAX_SPLIT = 51


def _relocation_tables(max_split: int = MAX_SPLIT) -> np.ndarray:
    """Precompute S[n, k] = sum_{i=k+1..n} C(i-1, k) (-1)^k / sqrt(k+1),
    so denom(o_new, N) = sum_k S[N, k] * o_new^(k+1)."""
    from math import comb

    t = np.zeros((max_split + 1, max_split), dtype=np.float64)
    for i in range(1, max_split + 1):
        for k in range(i):
            t[i, k] = comb(i - 1, k) * ((-1.0) ** k) / np.sqrt(k + 1.0)
    return np.cumsum(t, axis=0).astype(np.float32)  # S[n] = sum_{i<=n} t[i]


_S_TABLE = _relocation_tables()


def compute_relocation(
    opacity_old: jax.Array, scale_old: jax.Array, n: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Vectorized relocation rule.

    Args:
      opacity_old: (M,) activated opacities of donor Gaussians.
      scale_old: (M, 3) activated scales.
      n: (M,) int split multiplicities (>= 1).
    Returns:
      (new_opacity (M,), new_scale (M, 3)).
    """
    n = jnp.clip(n, 1, MAX_SPLIT)
    o_new = 1.0 - jnp.power(
        jnp.clip(1.0 - opacity_old, 1e-10, 1.0), 1.0 / n.astype(jnp.float32)
    )
    s_rows = jnp.asarray(_S_TABLE)[n]  # (M, MAX_SPLIT)
    powers = jnp.power(
        o_new[:, None], jnp.arange(1, MAX_SPLIT + 1, dtype=jnp.float32)[None, :]
    )
    denom = jnp.sum(s_rows * powers, axis=-1)
    coeff = opacity_old / jnp.maximum(denom, 1e-12)
    return o_new, scale_old * coeff[:, None]


def _zero_param_rows(opt_state: Any, mask: jax.Array, capacity: int) -> Any:
    """Zero optimizer-moment rows for masked Gaussians.

    Replaces the reference's `replace_tensors_to_optimizer` Adam-state surgery
    (`gaussian_model.py:432-469`) with a pure mask-write over every opt-state
    leaf whose leading dimension is the Gaussian capacity.
    """

    def fix(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] == capacity
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        ):
            m = mask.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            return leaf * (1.0 - m.astype(leaf.dtype))
        return leaf

    return jax.tree.map(fix, opt_state)


def _copy_rows(scene: GaussianScene, donor_idx: jax.Array, write_mask: jax.Array,
               new_logit_op: jax.Array, new_log_scale: jax.Array) -> GaussianScene:
    """Overwrite masked rows with donor rows (+ relocated opacity/scale)."""
    m1 = write_mask[:, None]

    def take(x):
        return jnp.where(
            write_mask.reshape((-1,) + (1,) * (x.ndim - 1)).astype(bool),
            x[donor_idx],
            x,
        )

    return dataclasses.replace(
        scene,
        means=take(scene.means),
        quats=take(scene.quats),
        sh_dc=take(scene.sh_dc),
        sh_rest=take(scene.sh_rest),
        logit_opacities=jnp.where(
            m1.astype(bool), new_logit_op[donor_idx], scene.logit_opacities
        ),
        log_scales=jnp.where(
            m1.astype(bool), new_log_scale[donor_idx], scene.log_scales
        ),
    )


@partial(jax.jit, static_argnames=("cap_max", "dead_opacity", "growth_factor"))
def densify_step(
    scene: GaussianScene,
    opt_state: Any,
    rng_key: jax.Array,
    cap_max: int,
    dead_opacity: float = 0.005,
    growth_factor: float = 1.05,
) -> Tuple[GaussianScene, Any]:
    """One MCMC densification step: relocate dead Gaussians, then grow 5%.

    Mirrors the `learn_one_iter` densify hook (`main.py:243-247`):
      1. relocate_gs: alive Gaussians with opacity <= dead_opacity are re-seeded
         at donors sampled proportional to opacity (`gaussian_model.py:493-521`);
      2. add_new_gs: revive dead capacity slots up to
         min(cap_max, growth_factor * population) (`gaussian_model.py:523-549`).
    Both relocated targets' and donors' optimizer moments are reset (the
    reference resets only donors — resetting the rewritten rows as well avoids
    stale Adam moments on freshly-seeded Gaussians).
    """
    cap = scene.capacity
    k1, k2 = jax.random.split(rng_key)

    # --- 1. relocation of near-dead alive Gaussians ---
    op = scene.opacities[:, 0]  # alive-masked activation
    is_dead = (scene.alive > 0.5) & (op <= dead_opacity)
    donor_probs = jnp.where((scene.alive > 0.5) & ~is_dead, op, 0.0)
    has_donors = jnp.sum(donor_probs) > 0
    logits = jnp.log(jnp.maximum(donor_probs, 1e-30))
    donor_idx = jax.random.categorical(k1, logits, shape=(cap,))

    counts = jax.ops.segment_sum(
        is_dead.astype(jnp.int32), donor_idx, num_segments=cap
    )
    n_split = counts + 1  # the donor keeps one copy (reference ratio + 1)
    new_op, new_scale = compute_relocation(
        jax.nn.sigmoid(scene.logit_opacities[:, 0]), scene.scales, n_split
    )
    new_op = jnp.clip(new_op, dead_opacity, 1.0 - 1e-7)
    new_logit_op = gmath.inverse_sigmoid(new_op)[:, None]
    new_log_scale = jnp.log(jnp.maximum(new_scale, 1e-12))

    write = is_dead & has_donors
    scene = _copy_rows(scene, donor_idx, write.astype(jnp.float32), new_logit_op,
                       new_log_scale)
    # Donors also take the relocated opacity/scale (`gaussian_model.py:518-519`).
    donor_touched = (counts > 0) & has_donors
    scene = dataclasses.replace(
        scene,
        logit_opacities=jnp.where(
            donor_touched[:, None], new_logit_op, scene.logit_opacities
        ),
        log_scales=jnp.where(
            donor_touched[:, None], new_log_scale, scene.log_scales
        ),
    )
    touched = write | donor_touched

    # --- 2. capped growth into dead capacity slots ---
    n_alive = jnp.sum(scene.alive).astype(jnp.int32)
    target = jnp.minimum(
        jnp.asarray(cap_max, jnp.int32),
        (growth_factor * n_alive.astype(jnp.float32)).astype(jnp.int32),
    )
    num_new = jnp.maximum(target - n_alive, 0)

    dead_rank = jnp.cumsum(1.0 - scene.alive) * (1.0 - scene.alive)  # 1-based
    revive = (dead_rank > 0) & (dead_rank <= num_new.astype(jnp.float32))

    op2 = scene.opacities[:, 0]
    probs2 = jnp.where(scene.alive > 0.5, op2, 0.0)
    has_donors2 = jnp.sum(probs2) > 0
    donor_idx2 = jax.random.categorical(
        k2, jnp.log(jnp.maximum(probs2, 1e-30)), shape=(cap,)
    )
    counts2 = jax.ops.segment_sum(
        revive.astype(jnp.int32), donor_idx2, num_segments=cap
    )
    n_split2 = counts2 + 1
    new_op2, new_scale2 = compute_relocation(
        jax.nn.sigmoid(scene.logit_opacities[:, 0]), scene.scales, n_split2
    )
    new_op2 = jnp.clip(new_op2, dead_opacity, 1.0 - 1e-7)
    new_logit_op2 = gmath.inverse_sigmoid(new_op2)[:, None]
    new_log_scale2 = jnp.log(jnp.maximum(new_scale2, 1e-12))

    write2 = revive & has_donors2
    scene = _copy_rows(scene, donor_idx2, write2.astype(jnp.float32),
                       new_logit_op2, new_log_scale2)
    donor_touched2 = (counts2 > 0) & has_donors2
    scene = dataclasses.replace(
        scene,
        logit_opacities=jnp.where(
            donor_touched2[:, None], new_logit_op2, scene.logit_opacities
        ),
        log_scales=jnp.where(
            donor_touched2[:, None], new_log_scale2, scene.log_scales
        ),
        alive=jnp.where(write2, 1.0, scene.alive),
    )
    touched = touched | write2 | donor_touched2

    opt_state = _zero_param_rows(opt_state, touched.astype(jnp.float32), cap)
    return scene, opt_state
