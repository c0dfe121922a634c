"""TPU-native NLOS Gaussian transient renderer.

A brand-new JAX/XLA/Pallas engine for non-line-of-sight reconstruction with 3D
Gaussian primitives, with the capabilities of the CUDA/PyTorch reference
`yhy258/nlos-gaussian-renderer` (see SURVEY.md) but designed TPU-first:

- the Gaussian field evaluation is a quadratic-form-as-matmul (MXU),
- transmittance is exp(-cumsum) (parallel scan) instead of sequential marching,
- culling is cull->compact->fused block-sparse instead of per-ray index lists,
- densification runs on a fixed-capacity scene with an alive mask (static shapes),
- multi-chip scaling is shard_map over an ICI mesh (scan-point / Gaussian axes).
"""

__version__ = "0.1.0"

from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams
from nlos_gaussian_renderer_tpu.models.scene import GaussianScene, init_scene

__all__ = [
    "Config",
    "OptimizationParams",
    "GaussianScene",
    "init_scene",
    "__version__",
]
