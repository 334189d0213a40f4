"""vst.data — host-side data pipelines and dataset generation."""

from vst.data.synthetic import AffineMotionGenerator, synthetic_batch
from vst.data.styles import load_style_images
from vst.data.loader import (
    prefetch_to_mesh,
    NpyDirDataset,
    TupleNpyDataset,
    ChairsSDHomDataset,
    CombinedDataset,
)

__all__ = [
    "AffineMotionGenerator",
    "synthetic_batch",
    "load_style_images",
    "prefetch_to_mesh",
    "NpyDirDataset",
    "TupleNpyDataset",
    "ChairsSDHomDataset",
    "CombinedDataset",
]
