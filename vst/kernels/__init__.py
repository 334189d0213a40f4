"""vst.kernels — TPU-optimized compute paths (exact or flag-gated).

- layout: space-to-depth conv algebra for layout-propagated networks
  (the FastStyleNet fast path: 198 fps/chip at Sintel res).
- s2d_conv: single-conv exact s2d fast path (2× over XLA's lowering of
  large-kernel small-channel convs).
- pallas_corr: Pallas correlation-window lookup (16× full-RAFT speedup;
  bf16 interpolation multiplies — flag-gated vs the exact XLA path).
- (pallas_conv9 was removed in round 2: the layout-propagated net made the
  fused 9×9 kernel redundant and it never lowered through Mosaic)
  (see module docstring for the blocker + plan).
"""

from vst.kernels.s2d_conv import s2d_conv2d
from vst.kernels.layout import (
    s2d,
    d2s,
    s2d_conv_general,
    instance_norm_s2d,
    nearest_up2_s2d,
)
from vst.kernels.pallas_corr import pallas_lookup_pyramid

__all__ = [
    "s2d_conv2d",
    "s2d",
    "d2s",
    "s2d_conv_general",
    "instance_norm_s2d",
    "nearest_up2_s2d",
    "pallas_lookup_pyramid",
]
