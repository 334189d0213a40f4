"""vst.kernels — TPU-optimized compute paths (exact, drop-in).

- s2d_conv: space-to-depth decomposition of large-kernel small-channel
  stride-1 convs (the FastStyleNet 9×9 stem/head — the bench bottleneck).
- pallas_corr: Pallas correlation-volume lookup (RAFT hot op).
"""

from vst.kernels.s2d_conv import s2d_conv2d

__all__ = ["s2d_conv2d"]
