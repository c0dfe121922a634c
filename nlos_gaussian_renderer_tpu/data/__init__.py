from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData, load_zaragoza256_data
from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset

__all__ = ["NLOSData", "load_zaragoza256_data", "make_synthetic_dataset"]
