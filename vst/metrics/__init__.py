"""vst.metrics — FID, LPIPS, and the FC2 metric harness."""

from vst.metrics.fid import frechet_distance, fid_from_activations, InceptionV3
from vst.metrics.lpips import LPIPS, lpips_pairwise

__all__ = [
    "frechet_distance",
    "fid_from_activations",
    "InceptionV3",
    "LPIPS",
    "lpips_pairwise",
]
