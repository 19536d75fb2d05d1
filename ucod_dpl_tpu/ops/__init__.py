from .resize import (
    adaptive_avg_pool2d,
    avg_pool2d,
    interpolate_bicubic,
    interpolate_bilinear,
)

__all__ = [
    "interpolate_bilinear",
    "interpolate_bicubic",
    "adaptive_avg_pool2d",
    "avg_pool2d",
]
