"""vst.flow — optical flow: RAFT estimator, correlation volumes, flow I/O."""

from vst.flow.raft import RAFT, raft_params_from_torch
from vst.flow.corr import CorrPyramid
from vst.flow.io import read_flo, write_flo

__all__ = ["RAFT", "raft_params_from_torch", "CorrPyramid", "read_flo", "write_flo"]
