from nlos_gaussian_renderer_tpu.data.stanford import load_stanford_data
from nlos_gaussian_renderer_tpu.data.synthetic import make_synthetic_dataset
from nlos_gaussian_renderer_tpu.data.zaragoza import NLOSData, load_zaragoza256_data

__all__ = [
    "NLOSData",
    "load_zaragoza256_data",
    "load_stanford_data",
    "make_synthetic_dataset",
]
