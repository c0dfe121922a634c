from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.schedule import expon_lr_schedule

__all__ = ["gmath", "expon_lr_schedule"]
