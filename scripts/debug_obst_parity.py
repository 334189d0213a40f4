"""Locate the first divergence between the living reference OBST harness
and the vst driver (tests/test_pipeline_parity.py living mode, which fails
on TCL-LT with identical values across gatys.py revisions).

Wraps net.run on BOTH sides and records (pre, img, mask, out) per call,
then compares the streams pairwise in caffe space. Run on CPU."""

import os
import sys
import tempfile
import types
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

# ---- no_cuda_to (fixture body, manual) ---------------------------------
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


_orig_t = torch.Tensor.to
_orig_m = torch.nn.Module.to
mp.setattr(torch.Tensor, "to",
           lambda self, *a, **k: _orig_t(self, *_fix(a, k)[0], **_fix(a, k)[1]))
mp.setattr(torch.nn.Module, "to",
           lambda self, *a, **k: _orig_m(self, *_fix(a, k)[0], **_fix(a, k)[1]))
mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)

tmp_path = Path(tempfile.mkdtemp())
style_paths, raft_args = T._obst_fixture(tmp_path)

# ---- reference side ----------------------------------------------------
mod = T._fresh_import(
    "obst_eval_living", T.OB, T.OB + "/raft",
    patched_source_of=(T.OB + "/obst_eval.py", T._OBST_CFG_PATCHES))

REF_CALLS = []
_orig_run = mod.OBST.run


def rec_run(self, pre, img, sid, mask, wtcl):
    out = _orig_run(self, pre, img, sid, mask, wtcl)
    REF_CALLS.append({
        "pre": pre.detach().cpu().numpy().copy(),
        "img": img.detach().cpu().numpy().copy(),
        "mask": mask.detach().cpu().numpy().copy(),
        "out": out.detach().cpu().numpy().copy(),
    })
    return out


mp.setattr(mod.OBST, "run", rec_run)
ref_st, ref_lt, sd, flows = T._drive_ref_obst(
    mod, tmp_path, mp, raft_args, weight_tcl=2000)
print(f"ref calls: {len(REF_CALLS)}; ref_lt={ref_lt}", flush=True)

# ---- vst side ----------------------------------------------------------
from vst.models.gatys import OBST as VstOBST

VST_CALLS = []
_vst_run = VstOBST.run


def vst_rec_run(self, pre, img, mask, pyr_shapes, weight_tcl=0.0):
    out = _vst_run(self, pre, img, mask, pyr_shapes, weight_tcl=weight_tcl)
    VST_CALLS.append({
        "pre": np.asarray(pre, np.float64).copy(),
        "img": np.asarray(img, np.float64).copy(),
        "mask": np.asarray(mask, np.float64).copy(),
        "out": np.asarray(out, np.float64).copy(),
    })
    return out


mp.setattr(VstOBST, "run", vst_rec_run)
res = T._drive_vst_obst(sd, flows, style_paths, tmp_path,
                        weight_tcl=2000, literal_mask_zero=True)
print(f"vst calls: {len(VST_CALLS)}; vst_lt={res['TCL-LT']}", flush=True)


def tohwc(a):  # torch NCHW -> NHWC
    return np.transpose(a, (0, 2, 3, 1))


# vst driver warms the program with an extra run (obst.run on frame0/ones)
# before the timed loop — drop non-frame calls by matching count from end
n = len(REF_CALLS)
vst_calls = VST_CALLS[-n:]
for i, (r, v) in enumerate(zip(REF_CALLS, vst_calls)):
    row = {}
    for k in ("pre", "img", "out"):
        rv = tohwc(r[k])
        vv = v[k]
        row[k] = float(np.abs(rv - vv).max())
    rm = tohwc(r["mask"]) if r["mask"].ndim == 4 else r["mask"]
    vm = v["mask"]
    row["mask"] = float(np.abs(np.squeeze(rm) - np.squeeze(vm)).max())
    print(f"frame {i}: " + "  ".join(f"{k} max|d|={row[k]:.3e}"
                                     for k in ("img", "pre", "mask", "out")),
          flush=True)
