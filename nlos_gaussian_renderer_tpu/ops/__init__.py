"""Rendering/compute ops.

Only scene-independent modules load eagerly (models.scene imports ops.math,
so eagerly importing the renderer modules here would be circular); renderer
symbols resolve lazily via PEP 562.
"""

from nlos_gaussian_renderer_tpu.ops import math as gmath
from nlos_gaussian_renderer_tpu.ops.sampling import ShellGrid, shell_grid
from nlos_gaussian_renderer_tpu.ops.schedule import expon_lr_schedule

_LAZY = {
    "analytic_field": "analytic",
    "analytic_field_response": "analytic",
    "CompactTiles": "fused",
    "TileSpec": "fused",
    "cull_tiles": "fused",
    "fused_field": "fused",
    "fused_gaussian_field": "fused",
    "RenderSettings": "render",
    "field_response": "render",
    "mse_loss": "render",
    "render_histogram": "render",
    "render_histogram_batch": "render",
    "render_transient": "render",
    "view_albedo": "render",
}

__all__ = [
    "gmath",
    "ShellGrid",
    "shell_grid",
    "expon_lr_schedule",
    *_LAZY.keys(),
]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(
            f"nlos_gaussian_renderer_tpu.ops.{_LAZY[name]}"
        )
        return getattr(mod, name)
    raise AttributeError(name)
