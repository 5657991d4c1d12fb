"""TPU-native compute ops: resizing, pooling, correlation cost volumes."""
from cc_tpu.ops.image import (
    adaptive_avg_pool,
    resize_bilinear,
    upsample2x_bilinear,
    upsample_nearest,
)
from cc_tpu.ops.correlation import correlation

__all__ = [
    "adaptive_avg_pool",
    "resize_bilinear",
    "upsample2x_bilinear",
    "upsample_nearest",
    "correlation",
]
