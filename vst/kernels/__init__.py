"""vst.kernels — TPU-optimized compute paths, all probe-verified winners.

- s2d_conv: single-conv exact space-to-depth fast path for large-kernel
  small-channel convs (the FastStyleNet 9×9 stem/head; 2× over XLA's
  direct lowering at Sintel res).
- layout: the subpixel decoder fold (up2_conv_subpixel) + the identity-conv
  layout passes feeding s2d_conv.
- pallas_corr: Pallas correlation-window lookup (16× over the XLA gather
  at RAFT's production shape; artifacts/pallas_probe.json).

Removed estates (kill-or-fix, VERDICT r3 item 2): pallas_conv9 (round 2)
and the whole Pallas conv/res-block family plus the layout-propagated
faststyle_fast/b1 forwards (round 4) — every kernel either failed the
server-side Mosaic compile or lost to XLA's natural lowering at its
production shape (artifacts/pallas_probe.json, BENCH_r03 paths_ms).
"""

from vst.kernels.s2d_conv import s2d_conv2d
from vst.kernels.layout import s2d, d2s, up2_conv_subpixel
from vst.kernels.pallas_corr import pallas_lookup_pyramid

__all__ = [
    "s2d_conv2d",
    "s2d",
    "d2s",
    "up2_conv_subpixel",
    "pallas_lookup_pyramid",
]
