"""vst.ops — pure-jax.lax image/flow primitives with exact reference parity.

Each function documents the reference call-site convention it reproduces.
"""

from vst.ops.sample import (
    grid_sample,
    bilinear_sample_pixel,
    warp,
    warp_masked,
)
from vst.ops.image import (
    reflect_pad,
    replicate_pad,
    resize_nearest,
    resize_bilinear,
    avg_pool2d,
    InputPadder,
)
from vst.ops.flowtools import gradient, fbc_mask, forward_interpolate
from vst.ops.losses import gram_matrix, tv_loss, normalize_imagenet

__all__ = [
    "grid_sample",
    "bilinear_sample_pixel",
    "warp",
    "warp_masked",
    "reflect_pad",
    "replicate_pad",
    "resize_nearest",
    "resize_bilinear",
    "avg_pool2d",
    "InputPadder",
    "gradient",
    "fbc_mask",
    "forward_interpolate",
    "gram_matrix",
    "tv_loss",
    "normalize_imagenet",
]
