"""PIPELINE-level parity against the LIVING reference benchmark harnesses.

Round-2 closed *net*-level parity (tests/test_reference_parity.py proves the
converters + forwards match). These tests close the remaining gap — they run
the reference's OWN eval pipelines end-to-end on torch-CPU and assert the vst
harnesses produce the same numbers on identical (converted) weights:

  * ``Solver.eval_sintel``      StarGANv2Adv/core/solver.py:268-356 — the
    living Sintel TCL-ST/TCL-LT harness (computeTCL + RAFT + fbcCheckTorch +
    warp + save_dict_as_json) vs ``vst.eval.sintel.evaluate_videos``.
    This measures the BASELINE north-star ("temporal warping error within 1%
    of the reference") directly against reference code for the first time.
  * ``calculate_metrics``       utils/metrics/eval.py:71-246 (the Adv vendored
    copy) — FC2 TCL path in reference mode vs ``vst.eval.fc2``.
  * ``LPIPS``                   utils/metrics/lpips.py:49-98 with the vendored
    ``lpips_weights.ckpt`` — function-level, seeded AlexNet backbone.
  * ``frechet_distance``        utils/metrics/fid.py:56-59 vs vst FID math.

The reference needs torchvision; this image has none, so the stub from
test_reference_parity is upgraded with FUNCTIONAL ToTensor / Normalize /
Compose / save_image / models.alexnet implementations (pure data plumbing —
every metric computation under test runs the reference's own code). CUDA
calls are neutralized by patching ``torch.Tensor.cuda`` to a no-op; the
harness itself selects cpu via ``torch.cuda.is_available()``.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_reference_parity import (  # noqa: E402
    REF,
    _import_ref,
    _install_stubs,
    _seed_torch_params,
)

ADV = "methods/GAN-based/StarGANv2Adv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


# ---------------------------------------------------------------------------
# functional torchvision stubs (data plumbing only)
# ---------------------------------------------------------------------------

def _install_functional_tv():
    """Upgrade the inert torchvision stub with working transforms/save_image/
    alexnet so the reference harness code can actually run."""
    _install_stubs()
    tv = sys.modules["torchvision"]
    tr = sys.modules["torchvision.transforms"]
    ut = sys.modules["torchvision.utils"]
    md = sys.modules["torchvision.models"]

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    def save_image(tensor, filename=None, nrow=1, padding=0, **kw):
        from PIL import Image

        x = tensor.detach().cpu().numpy()
        if x.ndim == 4:
            x = x[0]
        x = np.clip(x.transpose(1, 2, 0) * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(x).save(filename)

    def alexnet(pretrained=False, **kw):
        """torchvision alexnet.features architecture with DETERMINISTIC
        seeded weights (no pretrained blobs in this image; both sides of the
        parity test consume the same state dict)."""
        import torch.nn as nn

        feats = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
        )
        _seed_torch_params(feats, seed=99)
        return types.SimpleNamespace(features=feats)

    tr.ToTensor = ToTensor
    tr.Normalize = Normalize
    tr.Compose = Compose
    ut.save_image = save_image
    md.alexnet = alexnet
    return tv


def _adv_paths():
    return [os.path.join(REF, ADV, "raft"), os.path.join(REF, ADV)]


def _import_adv(module_name):
    return _import_ref(module_name, ADV, ADV + "/raft")


@pytest.fixture
def no_cuda(monkeypatch):
    """The reference pins `.cuda()` in a few spots (lpips mu/sigma, eval.py
    warp grid); neutralize on this CUDA-less image."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


def _seeded_sg2_nets(munch_mod):
    """Reference SG2 nets with the converter-tested seeds
    (test_reference_parity.py) at img_size=64."""
    model = _import_adv("core.model")
    G = _seed_torch_params(
        model.Generator(img_size=64, style_dim=64, w_hpf=0), seed=40)
    M = _seed_torch_params(
        model.MappingNetwork(latent_dim=16, style_dim=64, num_domains=4),
        seed=41)
    E = _seed_torch_params(
        model.StyleEncoder(img_size=64, style_dim=64, num_domains=4), seed=42)
    return munch_mod.Munch(generator=G, mapping_network=M, style_encoder=E)


def _vst_sg2_params(nets):
    from vst.models.stargan2 import (
        generator_params_from_torch,
        mapping_params_from_torch,
        style_encoder_params_from_torch,
    )

    return {
        "generator": generator_params_from_torch(
            nets.generator.state_dict(), img_size=64),
        "mapping": mapping_params_from_torch(
            nets.mapping_network.state_dict()),
        "style_enc": style_encoder_params_from_torch(
            nets.style_encoder.state_dict(), img_size=64),
    }


def _write_video(dirpath, n_frames, h, w, seed):
    """Smooth-ish moving texture so RAFT/TCL see structured motion."""
    from PIL import Image

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.RandomState(seed)
    base = rng.rand(h * 2, w * 2, 3)
    # blur for spatial coherence
    k = 9
    ker = np.ones(k) / k
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, ker, mode="same"), ax, base)
    base = (base - base.min()) / (np.ptp(base) + 1e-9)
    for i in range(n_frames):
        dy, dx = 3 * i, 5 * i
        crop = base[dy:dy + h, dx:dx + w]
        Image.fromarray((crop * 255).astype(np.uint8)).save(
            os.path.join(dirpath, f"frame_{i:04d}.png"))


# ---------------------------------------------------------------------------
# 1. Sintel TCL harness — Solver.eval_sintel vs vst.eval.sintel
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_sintel_eval_pipeline_parity_sg2(tmp_path, monkeypatch, no_cuda):
    _install_functional_tv()
    solver_mod = _import_adv("core.solver")
    munch = sys.modules["munch"]

    nets = _seeded_sg2_nets(munch)

    # reference RAFT with seeded weights (raft-chairs.pth is a missing blob;
    # identical weights flow through the parity-tested converter below)
    import argparse

    raft_args = argparse.Namespace(
        small=False, dropout=0.0, alternate_corr=False, mixed_precision=False)
    raft_mod = _import_adv("raft.raft")
    traft = _seed_torch_params(raft_mod.RAFT(raft_args), seed=30)

    # ---- drive the reference harness (its own code, torch-CPU) ----
    n_frames, H, W = 7, 128, 160
    sintel = tmp_path / "sintel"
    _write_video(str(sintel / "training" / "final" / "alley_x"),
                 n_frames, H, W, seed=7)
    os.makedirs(sintel / "test" / "final", exist_ok=True)

    # solver.py binds sintel_eval names into its own namespace — patch there
    monkeypatch.setattr(solver_mod, "initRaftModel", lambda args: traft)
    # computeTCL resolves fbcCheckTorch in the sintel_eval module globals;
    # its device="cuda" DEFAULT needs cpu rebinding (plumbing only)
    se_mod = sys.modules["sintel_eval"]
    orig_fbc = se_mod.fbcCheckTorch
    monkeypatch.setattr(se_mod, "fbcCheckTorch",
                        lambda ff, bf: orig_fbc(ff, bf, device="cpu"))
    monkeypatch.chdir(tmp_path)

    fake_self = types.SimpleNamespace(
        args=munch.Munch(latent_dim=16, resume_iter=0),
        nets_ema=nets,
        _load_checkpoint=lambda step: None,
    )
    torch.manual_seed(123)  # z_trg draws: one per (video, style)
    solver_mod.Solver.eval_sintel(fake_self, sintel_dir=str(sintel))

    out = tmp_path / "expr" / "sintel_eval"
    ref_st = json.load(open(out / "TCL-ST.json"))
    ref_lt = json.load(open(out / "TCL-LT.json"))

    # ---- same weights through the vst pipeline ----
    torch.manual_seed(123)
    zs = [torch.randn(1, 16).numpy() for _ in range(3)]

    from vst.flow.raft import RAFT, raft_params_from_torch
    from vst.models.stargan2 import Generator, MappingNetwork
    from vst.eval.sintel import evaluate_videos, load_sintel_videos

    raft = RAFT(small=False, iters=20)
    raft_params = {"params": raft_params_from_torch(traft.state_dict())}
    params = _vst_sg2_params(nets)
    G = Generator(img_size=64, style_dim=64, w_hpf=0)
    F = MappingNetwork(latent_dim=16, style_dim=64, num_domains=4)

    def stylize_fn(img, style):
        y, z = style
        s = F.apply({"params": params["mapping"]}, z, jnp.asarray([y]))
        return G.apply({"params": params["generator"]}, img, s)

    videos = load_sintel_videos(str(sintel))
    assert len(videos) == 1 and len(videos[0]) == n_frames
    styles = [(y, zs[y - 1]) for y in (1, 2, 3)]
    res = evaluate_videos(
        videos, stylize_fn, lambda a, b: raft.apply(raft_params, a, b),
        styles=styles, frame_transform=lambda f: f * 2.0 - 1.0,
        num_domains=4, dt_iters=1)

    # per-key + aggregate parity within 1% (the BASELINE north-star bound)
    for out_id, ref_d in (("TCL-ST", ref_st), ("TCL-LT", ref_lt)):
        got_d = res[out_id]
        for key, ref_v in ref_d.items():
            assert key in got_d, f"missing {key}"
            got_v = got_d[key]
            rel = abs(got_v - ref_v) / max(abs(ref_v), 1e-9)
            assert rel < 0.01, (key, got_v, ref_v, rel)


# ---------------------------------------------------------------------------
# 2. FC2 metric harness — metrics/eval.py calculate_metrics vs vst.eval.fc2
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fc2_calculate_metrics_pipeline_parity(tmp_path, monkeypatch, no_cuda):
    _install_functional_tv()
    eval_mod = _import_adv("metrics.eval")
    munch = sys.modules["munch"]

    nets = _seeded_sg2_nets(munch)
    nets.fan = None  # w_hpf=0 → never touched

    # tiny deterministic eval set: tasks style0<->style{1,2}
    rng = np.random.RandomState(11)
    N, Hs = 4, 64
    batches_t = []
    y_pairs = [([0, 0, 1, 2], [1, 2, 0, 0]), ([0, 2, 0, 1], [2, 0, 1, 0])]
    for bi, (y_org, y_trg) in enumerate(y_pairs):
        x_real = torch.from_numpy(
            (rng.rand(N, 3, Hs, Hs) * 2 - 1).astype(np.float32))
        x_real2 = torch.from_numpy(
            (rng.rand(N, 3, Hs, Hs) * 2 - 1).astype(np.float32))
        x_ref = torch.from_numpy(
            (rng.rand(N, 3, Hs, Hs) * 2 - 1).astype(np.float32))
        mask = torch.from_numpy(
            (rng.rand(N, 1, Hs, Hs) > 0.2).astype(np.float32))
        flow = torch.from_numpy(
            (rng.rand(N, 2, Hs, Hs) * 4 - 2).astype(np.float32))
        batches_t.append((x_real, x_real2, torch.tensor(y_org),
                          x_ref, torch.tensor(y_trg), mask, flow))

    style_dir = tmp_path / "styles"
    for d in range(3):
        os.makedirs(style_dir / f"style{d}", exist_ok=True)
    eval_dir = tmp_path / "eval_ref"
    os.makedirs(eval_dir, exist_ok=True)
    os.symlink(os.path.join(REF, ADV, "metrics"), tmp_path / "metrics")
    monkeypatch.chdir(tmp_path)

    # inception needs pretrained torchvision blobs → FID is patched to a
    # constant on the torch side (the Fréchet math itself is parity-tested
    # below); load_image is re-bound to cpu (plumbing only)
    monkeypatch.setattr(eval_mod, "calculate_fid_given_paths",
                        lambda paths, img_size, batch_size: 0.0)
    orig_load = eval_mod.load_image
    monkeypatch.setattr(eval_mod, "load_image",
                        lambda p: orig_load(p, device="cpu"))

    args = munch.Munch(
        style_dir=str(style_dir), eval_dir=str(eval_dir), latent_dim=16,
        num_outs_per_domain=2, w_hpf=0, img_size=Hs, val_batch_size=N)
    eval_mod.calculate_metrics(nets, args, step=0, mode="reference",
                               eval_loader=batches_t)
    ref_tcl = json.load(open(eval_dir / "TCL_00000_reference.json"))
    ref_lpips = json.load(open(eval_dir / "LPIPS_00000_reference.json"))

    # ---- vst side on identical weights + batches ----
    from vst.eval.fc2 import calculate_metrics as vst_metrics
    from vst.metrics.lpips import LPIPS
    from vst.models.stargan2 import Generator, StyleEncoder

    params = _vst_sg2_params(nets)
    G = Generator(img_size=64, style_dim=64, w_hpf=0)
    E = StyleEncoder(img_size=64, style_dim=64, num_domains=4)

    def style_fn(x, y, mode, rng_, x_ref):
        s = E.apply({"params": params["style_enc"]}, x_ref, y)
        return G.apply({"params": params["generator"]}, x, s)

    def nhwc(t):
        return np.ascontiguousarray(
            t.numpy().transpose(0, 2, 3, 1)).astype(np.float32)

    batches_v = [
        {"x_src": nhwc(b[0]), "x2_src": nhwc(b[1]), "y_src": b[2].numpy(),
         "x_ref": nhwc(b[3]), "y_ref": b[4].numpy(), "mask": nhwc(b[5]),
         "flow": nhwc(b[6])}
        for b in batches_t
    ]
    tv_md = sys.modules["torchvision.models"]
    alex_sd = {f"features.{k}": v
               for k, v in tv_md.alexnet().features.state_dict().items()}
    res = vst_metrics(
        style_fn, batches_v, num_domains=3, mode="reference",
        num_outs_per_domain=2, lpips=LPIPS(alexnet_sd=alex_sd))

    for key, ref_v in ref_tcl.items():
        got_v = res["TCL"][key]
        rel = abs(got_v - ref_v) / max(abs(ref_v), 1e-9)
        assert rel < 0.01, (key, got_v, ref_v)
    # reference mode → all num_outs fakes identical → pairwise LPIPS ≡ 0;
    # the comparison still proves both pipelines assemble the same chunks
    for key, ref_v in ref_lpips.items():
        got_v = res["LPIPS"][key]
        assert abs(got_v - ref_v) < 1e-4, (key, got_v, ref_v)


# ---------------------------------------------------------------------------
# 3. LPIPS function parity (vendored lpips_weights.ckpt, seeded backbone)
# ---------------------------------------------------------------------------

def test_lpips_function_parity(tmp_path, monkeypatch, no_cuda):
    _install_functional_tv()
    lpips_mod = _import_adv("metrics.lpips")

    os.symlink(os.path.join(REF, ADV, "metrics"), tmp_path / "metrics")
    monkeypatch.chdir(tmp_path)

    rng = np.random.RandomState(3)
    x = (rng.rand(2, 3, 64, 64) * 2 - 1).astype(np.float32)
    y = (rng.rand(2, 3, 64, 64) * 2 - 1).astype(np.float32)

    ref_lpips = lpips_mod.LPIPS().eval()
    with torch.no_grad():
        want = float(ref_lpips(torch.from_numpy(x), torch.from_numpy(y)))

    from vst.metrics.lpips import LPIPS

    tv_md = sys.modules["torchvision.models"]
    alex_sd = {f"features.{k}": v
               for k, v in tv_md.alexnet().features.state_dict().items()}
    vst_lpips = LPIPS(alexnet_sd=alex_sd)
    got = vst_lpips(x.transpose(0, 2, 3, 1), y.transpose(0, 2, 3, 1))
    assert abs(got - want) / max(abs(want), 1e-9) < 0.01, (got, want)


# ---------------------------------------------------------------------------
# 4. Fréchet-distance math parity
# ---------------------------------------------------------------------------

def test_frechet_distance_parity():
    _install_functional_tv()
    fid_mod = _import_adv("metrics.fid")

    from vst.metrics.fid import frechet_distance

    rng = np.random.RandomState(5)
    d = 16
    mu1, mu2 = rng.randn(d), rng.randn(d)
    a1, a2 = rng.randn(d, d), rng.randn(d, d)
    cov1 = a1 @ a1.T / d + np.eye(d) * 0.1
    cov2 = a2 @ a2.T / d + np.eye(d) * 0.1

    want = fid_mod.frechet_distance(mu1, cov1, mu2, cov2)
    got = frechet_distance(mu1, cov1, mu2, cov2)
    assert abs(got - want) / max(abs(want), 1e-9) < 1e-6, (got, want)


# ---------------------------------------------------------------------------
# 5. OBST + FastStyle harness clones (VERDICT r3 item 6)
# ---------------------------------------------------------------------------

OB = "methods/optimization-based"
LB = "methods/learning-based"


_IMG_DTYPE = [np.float32]  # OBST parity tests flip this to float64


def _install_tv_extras():
    """Stubs the OBST/FastStyle harnesses additionally need: Lambda, Resize,
    ToPILImage, Grayscale (+ skimage io/transform attrs). Resize implements
    F.interpolate(bilinear, align_corners=False) — no torchvision exists in
    this image, so both the reference harness and vst share identical resize
    math (the parity target is the harness logic, not PIL's resampler)."""
    from PIL import Image as PILImage

    _install_functional_tv()
    tr = sys.modules["torchvision.transforms"]

    class Lambda:
        def __init__(self, f):
            self.f = f

        def __call__(self, x):
            return self.f(x)

    class Resize:
        def __init__(self, size):
            self.size = tuple(size)

        def __call__(self, pic):
            import torch.nn.functional as F

            if isinstance(pic, PILImage.Image):
                if (pic.size[1], pic.size[0]) == self.size:
                    return pic
            arr = np.asarray(pic, dtype=_IMG_DTYPE[0])
            t = torch.from_numpy(arr.transpose(2, 0, 1))[None]
            out = F.interpolate(t, size=self.size, mode="bilinear",
                                align_corners=False)[0]
            return out.numpy().transpose(1, 2, 0)

    class ToPILImage:
        def __call__(self, t):
            x = t.detach().cpu().numpy()
            x = np.clip(x.transpose(1, 2, 0) * 255.0, 0, 255).astype(np.uint8)
            return PILImage.fromarray(x)

    class Grayscale:
        def __init__(self, num_output_channels=1):
            self.n = num_output_channels

        def __call__(self, pic):
            if isinstance(pic, PILImage.Image):
                g = pic.convert("L")
                return g.convert("RGB") if self.n == 3 else g
            x = pic.detach().cpu().numpy()
            g = (0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2])[None]
            if self.n == 3:
                g = np.repeat(g, 3, axis=0)
            return torch.from_numpy(g)

    class ToTensorD:
        """dtype-switchable ToTensor (the OBST parity tests run BOTH
        pipelines in float64 — see the f64 rationale on the tests)."""

        def __call__(self, pic):
            arr = np.asarray(pic, dtype=_IMG_DTYPE[0]) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    tr.ToTensor = ToTensorD
    tr.Lambda = Lambda
    tr.Resize = Resize
    tr.ToPILImage = ToPILImage
    tr.Grayscale = Grayscale

    def save_image(tensor, filename=None, nrow=1, padding=0, **kw):
        from PIL import Image as _I

        x = tensor.detach().cpu().numpy()
        if x.ndim == 4:
            x = x[0]
        x = np.clip(x.transpose(1, 2, 0) * 255.0, 0, 255).astype(np.uint8)
        if x.shape[-1] == 1:  # grayscale save path (fast_style_transfer:48)
            x = x[..., 0]
        _I.fromarray(x).save(filename)

    sys.modules["torchvision.utils"].save_image = save_image

    sk = sys.modules.get("skimage")
    if sk is not None and not hasattr(sk, "io"):
        io_mod = types.ModuleType("skimage.io")
        trn_mod = types.ModuleType("skimage.transform")

        def _unavailable(*a, **k):
            raise RuntimeError("skimage is stubbed in this test env")

        io_mod.imread = io_mod.imsave = _unavailable
        trn_mod.resize = _unavailable
        sk.io, sk.transform = io_mod, trn_mod
        sys.modules["skimage.io"] = io_mod
        sys.modules["skimage.transform"] = trn_mod


def _fresh_import(module_name, *rel_dirs, patched_source_of=None):
    """Import a per-method reference module with its directories FORCED to
    the front of sys.path and method-local module names purged from the
    cache. The methods vendor same-named modules that DIFFER (the
    optimization-based flowtools comments out the occlusion term;
    learning-based datasets.py ≠ raft/datasets.py), so the plain
    _import_ref cache/path behavior is not enough here. ``patched_source_of``
    = (src_rel_path, needle, replacement) execs a textually patched copy of
    the module instead (used to excise the living OBST harness's leftover
    mask_last-zeroing debug line, obst_eval.py:510)."""
    _install_tv_extras()
    for name in list(sys.modules):
        root = name.split(".")[0]
        if root in ("flowtools", "obst_eval", "obst_eval_living",
                    "obst_eval_golden", "metrics",
                    "sg2_core", "datasets", "network", "flowlib",
                    "fast_style_transfer", "fs_johnson", "fs_huang",
                    "fs_dumoulin", "fs_reconet", "fs_ruder", "fs_lib"):
            del sys.modules[name]
    for p in rel_dirs:
        ap = os.path.join(REF, p)
        if ap in sys.path:
            sys.path.remove(ap)
    for p in reversed(rel_dirs):
        sys.path.insert(0, os.path.join(REF, p))
    import importlib

    if patched_source_of is None:
        return importlib.import_module(module_name)
    src_path, patches = patched_source_of
    src = open(os.path.join(REF, src_path)).read()
    for needle, replacement in patches:
        assert src.count(needle) == 1, f"needle not unique in {src_path}"
        src = src.replace(needle, replacement)
    mod = types.ModuleType(module_name)
    mod.__file__ = os.path.join(REF, src_path)
    sys.modules[module_name] = mod
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


@pytest.fixture
def f64_pipelines(monkeypatch):
    """Drive BOTH pipelines in float64. Rationale: torch's LBFGS scales its
    first step by min(1, 1/‖g‖₁) — at OBST's image sizes that step is so
    small that the first curvature pair y = g₁−g₀ (‖y‖ ≈ 5e−6) sits BELOW
    the cross-framework f32 gradient noise (maxpool/relu boundary flips,
    ~1e−3 max): no f32 reimplementation can walk the reference trajectory,
    by construction. In f64 the noise (~1e−15) is far below the curvature
    signal and the trajectories coincide. Production stays f32 (f32 vs f64
    is torch-side-identical in the committed golden era too — the claim
    under test is harness-math parity, not float-noise parity)."""
    import jax

    prev = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", True)
    prev_t = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    _IMG_DTYPE[0] = np.float64
    yield
    _IMG_DTYPE[0] = np.float32
    torch.set_default_dtype(prev_t)
    jax.config.update("jax_enable_x64", prev)


@pytest.fixture
def no_cuda_to(monkeypatch):
    """The OBST/FastStyle harnesses pin '.to(cuda)' / device='cuda' deep in
    their bodies; reroute every cuda destination to cpu (plumbing only)."""
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

    orig_t = torch.Tensor.to

    def tensor_to(self, *a, **k):
        a, k = _fix(a, k)
        return orig_t(self, *a, **k)

    orig_m = torch.nn.Module.to

    def module_to(self, *a, **k):
        a, k = _fix(a, k)
        return orig_m(self, *a, **k)

    monkeypatch.setattr(torch.Tensor, "to", tensor_to)
    monkeypatch.setattr(torch.nn.Module, "to", module_to)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)


# ---- OBST --------------------------------------------------------------

# Cost knobs for the single-core test box (f64 VGG fwd+bwd is the cost):
# 2-level pyramid, ONE style (num_domains 4→2, a CONFIG constant patched
# identically into the reference source), and the FLOW INSTRUMENT replaced
# by a deterministic constant smooth field injected identically on both
# sides (computeRAFT is monkeypatched; RAFT's own forward parity is proven
# separately in test_reference_parity.py — the harness math under test is
# fbcCheck/warp/warm-start/LBFGS/TCL, which all consume the flows).
_OBST_HW = (64, 80)
_OBST_PYR = [(32, 40), (64, 80)]
_OBST_ITERS = [6, 5]  # → torch closure-call counts (20, 20)
_OBST_CFG_PATCHES = [
    ("  num_domains = 4\n  net.batch_size = 1",
     "  num_domains = 2\n  net.batch_size = 1"),
]


def _const_flows(h, w):
    """Smooth deterministic (ff, bf) fields, ~±2.5 px, fbc-nontrivial."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ff = np.stack([2.5 * np.sin(2 * np.pi * ys / h + 0.3),
                   1.5 * np.cos(2 * np.pi * xs / w)], axis=-1)
    bf = np.stack([-2.2 * np.sin(2 * np.pi * ys / h),
                   -1.8 * np.cos(2 * np.pi * xs / w + 0.5)], axis=-1)
    return ff.astype(np.float32), bf.astype(np.float32)
_MASK_ZERO_NEEDLE = (
    "        #pre = img\n        mask_last = torch.zeros((1,) + "
    "img.shape[2:]).to(device).unsqueeze(1)\n")


def _obst_fixture(tmp_path, seed_vgg=20, seed_raft=30, n_frames=6):
    """Shared OBST scene: seeded caffe-VGG weights as Models/vgg_conv.pth,
    3 style PNGs in Images/, one tiny Sintel video under the harness's
    hardcoded relative 'G:/Datasets/...' root (a valid dirname on linux)."""
    import argparse

    from PIL import Image

    H, W = _OBST_HW
    models_dir = tmp_path / "Models"
    os.makedirs(models_dir, exist_ok=True)
    img_dir = tmp_path / "Images"
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(77)
    style_paths = []
    for k in range(3):
        arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        p = img_dir / f"s{k + 1}.png"
        Image.fromarray(arr).save(p)
        style_paths.append(str(p))

    sintel = tmp_path / "G:" / "Datasets" / "MPI-Sintel-complete"
    _write_video(str(sintel / "training" / "final" / "alley_x"),
                 n_frames, H, W, seed=7)
    os.makedirs(sintel / "test" / "final", exist_ok=True)
    return style_paths, argparse.Namespace()


def _seeded_obst_vgg(mod, tmp_path, seed=20):
    vgg = _seed_torch_params(mod.VGG(), seed=seed)
    sd = dict(vgg.state_dict())
    save = dict(sd)
    for k in ("conv5_2", "conv5_3", "conv5_4"):  # ctor deletes these
        save[f"{k}.weight"] = torch.zeros(1)
        save[f"{k}.bias"] = torch.zeros(1)
    torch.save(save, tmp_path / "Models" / "vgg_conv.pth")
    return sd


def _drive_ref_obst(mod, tmp_path, monkeypatch, raft_args, weight_tcl,
                    seed_vgg=20, seed_raft=30):
    """Run the reference's own eval_sintel (torch-CPU) and return its JSONs."""
    # Restore device-copy semantics for .cpu(): on the reference rig
    # x_fake lives on CUDA and ``x_fake.data[0].cpu()`` COPIES — but on a
    # CPU-only box .cpu() is an identity ALIAS, and the harness's postpa
    # mutates its input in place (``x.mul_(1./255)`` + in-place Normalize,
    # obst_eval.py:312-315 via the per-frame save at :555-559), corrupting
    # the harness's own styled_past entries after each frame: every later
    # warm start and the TCL-LT term then consume a [0,1]+mean-space image
    # instead of the caffe-space styled frame (measured max|d| ≈ 233 —
    # scripts/debug_obst_parity3.py). This is a torch-CPU-only emulation
    # artifact, impossible on the CUDA rig that produced the committed
    # goldens; without this clone the "reference" being compared against
    # is a behavior the reference itself never exhibits.
    monkeypatch.setattr(torch.Tensor, "cpu",
                        lambda self, *a, **k: self.clone())
    sd = _seeded_obst_vgg(mod, tmp_path, seed=seed_vgg)
    H, W = _OBST_HW
    ff_np, bf_np = _const_flows(H, W)
    ff_t = torch.from_numpy(ff_np.transpose(2, 0, 1)).double()[None]
    bf_t = torch.from_numpy(bf_np.transpose(2, 0, 1)).double()[None]

    def const_raft(net, img1, img2, it=20):
        # deterministic flow instrument (identical on the vst side); the
        # harness calls computeRAFT(model, earlier, current) for ff and
        # (current, earlier) for bf — keyed on argument identity is not
        # possible, so both directions use their own fixed field depending
        # on call parity per frame (ff first, bf second — the harness
        # always calls in that order, obst_eval.py:495-497, :542-543)
        const_raft.calls += 1
        return ff_t if const_raft.calls % 2 == 1 else bf_t

    const_raft.calls = 0
    monkeypatch.setattr(mod, "computeRAFT",
                        lambda net, i1, i2, it=20: const_raft(net, i1, i2))
    monkeypatch.setattr(mod, "initRaftModel", lambda args: None)
    monkeypatch.chdir(tmp_path)

    net = mod.OBST()
    net.vgg.double()
    net.max_iters = list(_OBST_ITERS)
    orig_set_shapes = mod.OBST.set_shapes
    monkeypatch.setattr(
        mod.OBST, "set_shapes",
        lambda self, shapes: orig_set_shapes(self, _OBST_PYR))

    args = types.SimpleNamespace(weight_tcl=weight_tcl)
    mod.eval_sintel(net, args)

    out = tmp_path / "eval_sintel" / str(weight_tcl)
    return (json.load(open(out / "TCL-ST.json")),
            json.load(open(out / "TCL-LT.json")), sd, (ff_np, bf_np))


def _drive_vst_obst(sd, flows, style_paths, tmp_path, weight_tcl,
                    literal_mask_zero):
    import imageio.v2 as imageio

    from vst.eval.drivers import evaluate_sintel_obst
    from vst.eval.sintel import SintelVideo
    from vst.models.gatys import OBST
    from vst.perceptual.vgg import caffe_vgg_params_from_torch

    import jax.numpy as jnp

    vdir = (tmp_path / "G:" / "Datasets" / "MPI-Sintel-complete"
            / "training" / "final" / "alley_x")
    frames = np.stack([
        imageio.imread(os.path.join(vdir, f)).astype(np.float64) / 255.0
        for f in sorted(os.listdir(vdir))])
    styles = np.stack([
        imageio.imread(p).astype(np.float64) / 255.0 for p in style_paths])

    ff_np, bf_np = flows
    ff_j = jnp.asarray(ff_np, jnp.float64)[None]
    bf_j = jnp.asarray(bf_np, jnp.float64)[None]
    state = {"calls": 0}

    def const_raft(a, b):
        # same call-parity protocol as the reference stub: the vst driver
        # calls compute_raft(prev, img) then (img, prev) per frame
        state["calls"] += 1
        return None, (ff_j if state["calls"] % 2 == 1 else bf_j)

    obst = OBST(vgg_params=caffe_vgg_params_from_torch(sd),
                max_iters=tuple(_OBST_ITERS), compute_dtype=jnp.float64)
    return evaluate_sintel_obst(
        obst, [SintelVideo("alley_x", frames)],
        const_raft,
        styles[:1], _OBST_PYR, weight_tcl=weight_tcl,
        literal_mask_zero=literal_mask_zero)


def _assert_tcl_parity(res, ref_st, ref_lt, rel_tol=0.01,
                       expect_zero_st=False):
    for out_id, ref_d, got_d in (("TCL-ST", ref_st, res["TCL-ST"]),
                                 ("TCL-LT", ref_lt, res["TCL-LT"])):
        for key, ref_v in ref_d.items():
            if "_mean" in key:  # aggregates are derived from the per-keys
                continue
            assert key in got_d, f"missing {key}"
            got_v = got_d[key]
            if expect_zero_st and out_id == "TCL-ST":
                assert abs(ref_v) < 1e-12, (key, ref_v)
                assert abs(got_v) < 1e-12, (k, got_v)
                continue
            rel = abs(got_v - ref_v) / max(abs(ref_v), 1e-9)
            assert rel < rel_tol, (key, got_v, ref_v, rel)


@pytest.mark.slow
def test_obst_sintel_eval_pipeline_parity_living(tmp_path, monkeypatch,
                                                 no_cuda_to, f64_pipelines):
    """The LIVING obst_eval.eval_sintel (mask_last zeroed before net.run →
    in-closure TCL inert, TCL-ST ≡ 0) vs the vst driver in
    literal_mask_zero mode, on identical converted VGG/RAFT weights."""
    style_paths, raft_args = _obst_fixture(tmp_path)
    mod = _fresh_import(
        "obst_eval_living", OB, OB + "/raft",
        patched_source_of=(OB + "/obst_eval.py", _OBST_CFG_PATCHES))
    ref_st, ref_lt, sd, flows = _drive_ref_obst(
        mod, tmp_path, monkeypatch, raft_args, weight_tcl=2000)
    res = _drive_vst_obst(sd, flows, style_paths, tmp_path,
                          weight_tcl=2000, literal_mask_zero=True)
    _assert_tcl_parity(res, ref_st, ref_lt, expect_zero_st=True)


@pytest.mark.slow
def test_obst_sintel_eval_pipeline_parity_golden(tmp_path, monkeypatch,
                                                 no_cuda_to, f64_pipelines):
    """The committed-golden behavior: the reference source with the single
    leftover debug line (obst_eval.py:510 — unconditional mask_last zeroing,
    which contradicts the repo's own committed nonzero λ-contrast JSONs)
    excised, vs the vst driver's default mode. This adjudicates the
    λ-contrast question at λ_tcl=2000 on identical weights."""
    style_paths, raft_args = _obst_fixture(tmp_path)
    mod = _fresh_import(
        "obst_eval_golden", OB, OB + "/raft",
        patched_source_of=(OB + "/obst_eval.py", _OBST_CFG_PATCHES + [
            (_MASK_ZERO_NEEDLE, "        #pre = img\n")]))
    ref_st, ref_lt, sd, flows = _drive_ref_obst(
        mod, tmp_path, monkeypatch, raft_args, weight_tcl=2000)
    res = _drive_vst_obst(sd, flows, style_paths, tmp_path,
                          weight_tcl=2000, literal_mask_zero=False)
    _assert_tcl_parity(res, ref_st, ref_lt)


# ---- FastStyle ----------------------------------------------------------

@pytest.mark.slow
def test_faststyle_sintel_eval_pipeline_parity(tmp_path, monkeypatch,
                                               no_cuda_to):
    """FastStyle.evaluate_sintel (fast_style_transfer.py:398-560) driven on
    torch-CPU vs vst's evaluate_sintel_faststyle on converted weights —
    pins the [−1,1] eval normalization, the clamp(out/255) output path, and
    the RAFT/warp/mask TCL loop. Uses the Huang head (its infer_method
    passes s_id=style_id; Johnson's passes style_id into the
    style_strength slot — a reference slip documented in PARITY.md)."""
    import argparse

    H, W, n_frames = 128, 160, 6  # coarsest corr level ≥ 2 (see _OBST_HW)
    fs_huang = _fresh_import("fs_huang", LB, LB + "/raft")
    fst = sys.modules["fast_style_transfer"]

    # tiny sintel tree at the harness's three hardcoded video names
    sintel = tmp_path / "sintel"
    for i, vid in enumerate(("alley_2", "market_6", "temple_2")):
        _write_video(str(sintel / "training" / "final" / vid),
                     n_frames, H, W, seed=11 + i)
    os.makedirs(sintel / "test" / "final", exist_ok=True)

    # seeded multi-style net checkpoint where the harness expects it
    net_mod = sys.modules["network"]
    tnet = _seed_torch_params(net_mod.FastStyleNet(3, 3), seed=50)
    # Huang ctor appends method/ to train_dir; evaluate_sintel then
    # appends dset/method/ again → runs/huang/FC2/huang/<run>/
    ckpt_dir = (tmp_path / "G:" / "Code" / "LBST" / "runs" / "huang"
                / "FC2" / "huang" / "run0")
    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save(tnet.state_dict(), ckpt_dir / "epoch_3.pth")

    raft_args = argparse.Namespace(
        small=False, dropout=0.0, alternate_corr=False, mixed_precision=False)
    raft_mod = sys.modules["raft.raft"]
    traft = _seed_torch_params(raft_mod.RAFT(raft_args), seed=30)
    traft.eval()
    monkeypatch.setattr(fst, "initRaftModel", lambda args: traft)
    monkeypatch.chdir(tmp_path)

    huang = fs_huang.Huang()
    # the harness calls .numpy() on grad-requiring TCL tensors
    # (fast_style_transfer.py:523) — it only runs under an outer no_grad
    with torch.no_grad():
        huang.evaluate_sintel(types.SimpleNamespace(), n_styles=3, epochs=3,
                              n_epochs=3,
                              emphasis_parameter=[1e0, 1e1, 1e2],
                              sintel_dir=str(sintel) + "/")
    out = tmp_path / "G:" / "Code" / "LBST" / "eval_sintel" / "huang"
    ref_st = json.load(open(out / "TCL-ST.json"))
    ref_lt = json.load(open(out / "TCL-LT.json"))

    # ---- vst on converted weights ----
    import imageio.v2 as imageio

    from vst.eval.drivers import evaluate_sintel_faststyle
    from vst.eval.sintel import SintelVideo
    from vst.flow.raft import RAFT, raft_params_from_torch
    from vst.models.faststyle import faststyle_params_from_torch
    from vst.train.faststyle import FastStyleTrainer
    from vst.train.registry import select_method

    videos = []
    for vid in ("alley_2", "market_6", "temple_2"):
        vdir = sintel / "training" / "final" / vid
        frames = np.stack([
            imageio.imread(os.path.join(vdir, f)).astype(np.float32) / 255.0
            for f in sorted(os.listdir(vdir))])
        videos.append(SintelVideo(vid, frames))

    raft = RAFT(small=False, iters=20)
    raft_params = {"params": raft_params_from_torch(traft.state_dict())}
    cfg = select_method("huang", n_styles=3)
    trainer = FastStyleTrainer(cfg, np.zeros((3, 16, 16, 3), np.float32),
                               seed=0)
    params = faststyle_params_from_torch(tnet.state_dict())
    res = evaluate_sintel_faststyle(
        trainer, params, videos,
        lambda a, b: raft.apply(raft_params, a, b), dt_iters=1)

    _assert_tcl_parity(res, ref_st, ref_lt)
