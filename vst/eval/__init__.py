"""vst.eval — benchmark harnesses (Sintel TCL/DT, FC2 FID/LPIPS/TCL)."""

from vst.eval.sintel import (
    SintelVideo,
    load_sintel_videos,
    make_tcl_program,
    evaluate_videos,
)

__all__ = [
    "SintelVideo",
    "load_sintel_videos",
    "make_tcl_program",
    "evaluate_videos",
]
