"""Stage-2 probe: frame-1 warm start diverges (pre max|d|=160) with
identical net.run inputs/outputs at frame 0. Record the live-mask and
warp inputs/outputs on both sides to find which ingredient differs."""

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

mod = T._fresh_import(
    "obst_eval_living", T.OB, T.OB + "/raft",
    patched_source_of=(T.OB + "/obst_eval.py", T._OBST_CFG_PATCHES))

REF = {"fbc": [], "warp": []}
_fbc = mod.fbcCheckTorch
_warp = mod.warp


def rec_fbc(ff, bf, device="cuda"):
    out = _fbc(ff, bf, "cpu")
    REF["fbc"].append((ff.detach().numpy().copy(), bf.detach().numpy().copy(),
                       out.detach().numpy().copy()))
    return out


def rec_warp(x, f):
    out = _warp(x, f)
    REF["warp"].append((x.detach().numpy().copy(), f.detach().numpy().copy(),
                        out.detach().numpy().copy()))
    return out


mp.setattr(mod, "fbcCheckTorch", rec_fbc)
mp.setattr(mod, "warp", rec_warp)

# stop the ref run after 2 frames to keep this quick: patch OBST.run to
# raise after call 2 -- no; just run all 6, it's ~30s of LBFGS total
ref_st, ref_lt, sd, flows = T._drive_ref_obst(
    mod, tmp_path, mp, raft_args, weight_tcl=2000)
print(f"ref fbc calls {len(REF['fbc'])}, warp calls {len(REF['warp'])}",
      flush=True)

# ---- vst side ----------------------------------------------------------
import vst.ops.flowtools as vft
import vst.eval.drivers as vdrv
from vst.models.gatys import OBST as VstOBST

VST = {"fbc": [], "warm": []}
_vfbc = vft.fbc_mask


def vrec_fbc(ff, bf, use_occlusion=True):
    out = _vfbc(ff, bf, use_occlusion=use_occlusion)
    VST["fbc"].append((np.asarray(ff, np.float64), np.asarray(bf, np.float64),
                       np.asarray(out, np.float64)))
    return out


# the driver does `from vst.ops.flowtools import fbc_mask` at function-call
# time (import inside the function body) -> patching the module attr works
mp.setattr(vft, "fbc_mask", vrec_fbc)

_warm = VstOBST.warm_start


def vrec_warm(self, prev_styled, img, bf, mask):
    out = _warm(self, prev_styled, img, bf, mask)
    VST["warm"].append({
        "prev": np.asarray(prev_styled, np.float64),
        "img": np.asarray(img, np.float64),
        "bf": np.asarray(bf, np.float64),
        "mask": np.asarray(mask, np.float64),
        "out": np.asarray(out, np.float64)})
    return out


mp.setattr(VstOBST, "warm_start", vrec_warm)
res = T._drive_vst_obst(sd, flows, style_paths, tmp_path,
                        weight_tcl=2000, literal_mask_zero=True)
print(f"vst fbc calls {len(VST['fbc'])}, warm calls {len(VST['warm'])}",
      flush=True)


def tohwc(a):
    return np.transpose(a, (0, 2, 3, 1))


# fbc call streams should align 1:1 (ST mask per frame 1..5, LT mask at 5)
for i, ((rff, rbf, rm), (vff, vbf, vm)) in enumerate(zip(REF["fbc"],
                                                         VST["fbc"])):
    dff = float(np.abs(tohwc(rff) - vff).max())
    dbf = float(np.abs(tohwc(rbf) - vbf).max())
    rm4 = rm if rm.ndim == 4 else rm[:, None]
    dm = float(np.abs(np.squeeze(rm4) - np.squeeze(vm)).max())
    print(f"fbc {i}: ff|d|={dff:.3e} bf|d|={dbf:.3e} mask|d|={dm:.3e}",
          flush=True)

# ref warp call 0 = warm start frame 1; vst warm call 0 likewise
for i, (w, (rx, rf, ro)) in enumerate(zip(VST["warm"], REF["warp"])):
    dx = float(np.abs(tohwc(rx) - w["prev"]).max())
    df = float(np.abs(tohwc(rf) - w["bf"]).max())
    do = float(np.abs(tohwc(ro) - (np.asarray(w["out"]) * 0 +  # warp-only
                                   np.asarray(
        # recompute vst warp alone for comparison
        __import__("vst.ops.sample", fromlist=["warp"]).warp(
            w["prev"], w["bf"])))).max())
    print(f"warp {i}: x|d|={dx:.3e} f|d|={df:.3e} out|d|={do:.3e}", flush=True)
