"""Fixed-capacity Gaussian scene state.

TPU-native replacement for the reference's `GaussianModel` parameter store
(`gaussian_model/gaussian_model.py:33-60`). Key design difference: the scene is
an immutable pytree with a **fixed capacity** and an `alive` mask, so MCMC
densification / relocation (`gaussian_model.py:392-549`) never changes array
shapes — no optimizer-state surgery, no recompilation under jit.

Dead slots are rendered inert by folding the alive mask into the opacity
activation: `opacities == sigmoid(logit_opacities) * alive`, so every renderer
and regularizer sees exactly zero contribution from dead Gaussians.

Parameter semantics match the reference activations
(`gaussian_model.py:14-29`): scales = exp(log_scales), opacity = sigmoid,
rotation = normalized quaternion, SH albedo with K = (sh_degree+1)^2
coefficients per Gaussian (single channel).

Known reference defect NOT replicated: the Python path double-applies the
scale activation (exp(exp(log_s)), `gaussian_model.py:265` vs `:108-109`); we
follow the single-exp semantics of the CUDA kernel (`volume_renderer.cu:92-96`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from nlos_gaussian_renderer_tpu.ops import math as gmath


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianScene:
    """Learnable Gaussian mixture with fixed capacity N.

    Attributes:
      means: (N, 3) positions (world space).
      log_scales: (N, 3) log of per-axis standard deviations.
      quats: (N, 4) unnormalized quaternions (w, x, y, z).
      logit_opacities: (N, 1) pre-sigmoid opacities.
      sh_dc: (N, 1) DC spherical-harmonic albedo coefficient.
      sh_rest: (N, K-1) higher-order SH coefficients (K = (max_sh_degree+1)^2).
      alive: (N,) float mask; 1.0 = active Gaussian, 0.0 = dead capacity slot.
    """

    means: jax.Array
    log_scales: jax.Array
    quats: jax.Array
    logit_opacities: jax.Array
    sh_dc: jax.Array
    sh_rest: jax.Array
    alive: jax.Array

    # --- static helpers ---

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[-1]
        deg = int(round(k**0.5)) - 1
        assert (deg + 1) ** 2 == k, f"invalid SH coefficient count {k}"
        return deg

    # --- activations (reference `gaussian_model.py:14-29, 107-138`) ---

    @property
    def scales(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    @property
    def rotations(self) -> jax.Array:
        n = jnp.linalg.norm(self.quats, axis=-1, keepdims=True)
        return self.quats / jnp.maximum(n, 1e-12)

    @property
    def opacities(self) -> jax.Array:
        """(N, 1) activated opacities with the alive mask folded in."""
        return jax.nn.sigmoid(self.logit_opacities) * self.alive[:, None]

    @property
    def sh(self) -> jax.Array:
        """(N, K) full SH coefficient rows."""
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=-1)

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    def covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """(N, 3, 3) covariances (reference `get_covariance`, `gaussian_model.py:137-138`)."""
        return gmath.build_covariance(self.scales * scaling_modifier, self.rotations)

    def bboxes(
        self, scaling_modifier: float = 1.0, sigma_scale: float = 3.0
    ) -> jax.Array:
        """(N, 2, 3) world AABBs of the sigma_scale ellipsoids.

        Extent_i = sigma_scale * sqrt(Cov_ii) (reference `get_bboxes`,
        `gaussian_model.py:140-178`; CUDA `bbox_compute.cuh:23-71`).
        """
        cov = self.covariance(scaling_modifier)
        diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
        extents = sigma_scale * jnp.sqrt(jnp.clip(diag, min=1e-8))
        return jnp.stack([self.means - extents, self.means + extents], axis=1)

    def quadratic_form(self, scaling_modifier: float = 1.0) -> jax.Array:
        """(N, 10) MXU-ready quadratic-form rows (see `ops.math`)."""
        return gmath.gaussian_quadratic_form(
            self.means, self.scales * scaling_modifier, self.rotations
        )


def init_scene(
    points,
    rho,
    pmin,
    pmax,
    max_sh_degree: int,
    capacity: int | None = None,
    knn_scale_init: bool = True,
) -> GaussianScene:
    """Create a scene from initial points + albedos.

    Mirrors `GaussianModel.create_params` (`gaussian_model.py:184-221`):
      - SH DC coefficient = RHO2SH(rho), higher orders zero,
      - isotropic log-scale init from mean nearest-neighbor distance
        (replacing the simple-knn CUDA `distCUDA2`; falls back to the
        reference's box heuristic when knn_scale_init=False),
      - identity quaternions, opacity sigmoid^-1(0.1).

    Any capacity slots beyond len(points) are dead (alive = 0).
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    rho = jnp.asarray(rho, dtype=jnp.float32).reshape(-1, 1)
    n = points.shape[0]
    cap = capacity if capacity is not None else n
    assert cap >= n, f"capacity {cap} < initial points {n}"
    k = (max_sh_degree + 1) ** 2

    if knn_scale_init:
        if n > 4096:
            # Large populations: grid-accelerated native KNN (csrc/).
            import numpy as _np

            from nlos_gaussian_renderer_tpu import native

            dist2 = jnp.asarray(
                native.knn_mean_dist2(_np.asarray(points), k=3)
            )
        else:
            dist2 = _mean_knn_dist2(points)
        dist2 = jnp.clip(dist2, min=1e-7)  # (n,)
    else:
        # Box heuristic fallback (reference `gaussian_model.py:205-208`).
        pmin_x, pmax_x = float(pmin[0]), float(pmax[0])
        dist2 = jnp.full((n,), max((pmax_x - pmin_x) / max(n, 1), 1e-7))
    log_scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    quats = jnp.zeros((n, 4), dtype=jnp.float32).at[:, 0].set(1.0)
    logit_op = gmath.inverse_sigmoid(0.1 * jnp.ones((n, 1), dtype=jnp.float32))
    sh_dc = gmath.rho_to_sh(rho)
    sh_rest = jnp.zeros((n, k - 1), dtype=jnp.float32)

    def pad(x, fill=0.0):
        if cap == n:
            return x
        pad_shape = (cap - n,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(pad_shape, fill, dtype=x.dtype)], axis=0)

    return GaussianScene(
        means=pad(points),
        # Dead slots get tiny scales so they stay numerically tame if revived.
        log_scales=pad(log_scales, fill=-6.0),
        quats=pad(quats).at[n:, 0].set(1.0),
        logit_opacities=pad(logit_op, fill=gmath.inverse_sigmoid(0.1)),
        sh_dc=pad(sh_dc),
        sh_rest=pad(sh_rest),
        alive=pad(jnp.ones((n,), dtype=jnp.float32)),
    )


def _mean_knn_dist2(points: jax.Array, k: int = 3) -> jax.Array:
    """Mean squared distance to the k nearest neighbors of each point.

    TPU-native replacement for simple-knn's `distCUDA2`
    (used at reference `gaussian_model.py:203`): a dense pairwise distance
    matrix + top_k. O(N^2) but N is the init count (~2k), trivially fast on
    the MXU via the |a-b|^2 = |a|^2 + |b|^2 - 2ab expansion.
    """
    n = points.shape[0]
    sq = jnp.sum(points**2, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * points @ points.T
    d2 = jnp.maximum(d2, 0.0).at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)
    neg_top, _ = jax.lax.top_k(-d2, min(k, n - 1))
    return jnp.mean(-neg_top, axis=-1)


def scene_param_labels(scene: GaussianScene) -> GaussianScene:
    """Pytree of optimizer group labels, mirroring the reference's six Adam
    param groups (`gaussian_model.py:229-236`)."""
    return GaussianScene(
        means="mu",
        log_scales="scaling",
        quats="rotation",
        logit_opacities="opacity",
        sh_dc="f_dc",
        sh_rest="f_rest",
        alive="frozen",
    )
