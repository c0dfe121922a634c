from nlos_gaussian_renderer_tpu.models.scene import GaussianScene

__all__ = ["GaussianScene"]
