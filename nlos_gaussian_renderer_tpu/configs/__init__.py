from nlos_gaussian_renderer_tpu.configs.default import Config, OptimizationParams

__all__ = ["Config", "OptimizationParams"]
