"""Stage-3 probe: in ONE run, record BOTH net.run streams AND warp/warm
streams on each side, then check internal consistency:
  ref: warp_call0.x  ==  ref net.run call0 .out ?
  vst: warm_call0.prev == vst net.run call0(.post-warmup) .out ?
  cross: ref out0 == vst out0 ?"""

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import torch

torch.set_default_dtype(torch.float64)

from _pytest.monkeypatch import MonkeyPatch

sys.path.insert(0, "/root/repo/tests")
import test_pipeline_parity as T

T._IMG_DTYPE[0] = np.float64
mp = MonkeyPatch()


def _fix(args, kwargs):
    def cpu_if_cuda(x):
        if isinstance(x, str) and x.startswith("cuda"):
            return "cpu"
        if isinstance(x, torch.device) and x.type == "cuda":
            return torch.device("cpu")
        return x

    args = tuple(cpu_if_cuda(a) for a in args)
    if "device" in kwargs:
        kwargs["device"] = cpu_if_cuda(kwargs["device"])
    return args, kwargs


_ot = torch.Tensor.to
_om = torch.nn.Module.to
mp.setattr(torch.Tensor, "to",
           lambda self, *a, **k: _ot(self, *_fix(a, k)[0], **_fix(a, k)[1]))
mp.setattr(torch.nn.Module, "to",
           lambda self, *a, **k: _om(self, *_fix(a, k)[0], **_fix(a, k)[1]))
mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)

tmp_path = Path(tempfile.mkdtemp())
style_paths, raft_args = T._obst_fixture(tmp_path)

mod = T._fresh_import(
    "obst_eval_living", T.OB, T.OB + "/raft",
    patched_source_of=(T.OB + "/obst_eval.py", T._OBST_CFG_PATCHES))

REF_RUNS, REF_WARPS = [], []
_orun = mod.OBST.run
_owarp = mod.warp


def rrun(self, pre, img, sid, mask, wtcl):
    out = _orun(self, pre, img, sid, mask, wtcl)
    REF_RUNS.append(out.detach().numpy().copy())
    return out


def rwarp(x, f):
    out = _owarp(x, f)
    REF_WARPS.append(x.detach().numpy().copy())
    return out


mp.setattr(mod.OBST, "run", rrun)
mp.setattr(mod, "warp", rwarp)
ref_st, ref_lt, sd, flows = T._drive_ref_obst(
    mod, tmp_path, mp, raft_args, weight_tcl=2000)
print(f"ref runs {len(REF_RUNS)} warps {len(REF_WARPS)}", flush=True)
print("ref internal: warp0.x vs run0.out max|d| =",
      float(np.abs(REF_WARPS[0] - REF_RUNS[0]).max()), flush=True)

from vst.models.gatys import OBST as VstOBST

VST_RUNS, VST_WARMS = [], []
_vrun = VstOBST.run
_vwarm = VstOBST.warm_start


def vrun(self, pre, img, mask, pyr_shapes, weight_tcl=0.0):
    out = _vrun(self, pre, img, mask, pyr_shapes, weight_tcl=weight_tcl)
    VST_RUNS.append(np.asarray(out, np.float64).copy())
    return out


def vwarm(self, prev_styled, img, bf, mask):
    out = _vwarm(self, prev_styled, img, bf, mask)
    VST_WARMS.append(np.asarray(prev_styled, np.float64).copy())
    return out


mp.setattr(VstOBST, "run", vrun)
mp.setattr(VstOBST, "warm_start", vwarm)
res = T._drive_vst_obst(sd, flows, style_paths, tmp_path,
                        weight_tcl=2000, literal_mask_zero=True)
print(f"vst runs {len(VST_RUNS)} warms {len(VST_WARMS)}", flush=True)


def tohwc(a):
    return np.transpose(a, (0, 2, 3, 1))


vst_frame_runs = VST_RUNS[-6:]  # drop the warm-up program call
print("vst internal: warm0.prev vs run_frame0.out max|d| =",
      float(np.abs(VST_WARMS[0] - vst_frame_runs[0]).max()), flush=True)
print("cross: ref run0 vs vst frame-run0 max|d| =",
      float(np.abs(tohwc(REF_RUNS[0]) - vst_frame_runs[0]).max()), flush=True)
print("cross: ref warp0.x vs vst warm0.prev max|d| =",
      float(np.abs(tohwc(REF_WARPS[0]) - VST_WARMS[0]).max()), flush=True)
for i in range(6):
    print(f"cross run {i}: max|d| =",
          float(np.abs(tohwc(REF_RUNS[i]) - vst_frame_runs[i]).max()),
          flush=True)
