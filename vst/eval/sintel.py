"""Sintel video eval harness: TCL-ST / TCL-LT / DT.

Parity with ``utils/sintel_eval.py:142-233`` (and its per-method clones):
per video × per style, stylize every frame (timed → DT), estimate RAFT flow
between the current and the previous (ST) / 5-back (LT) frame, build the
fb-consistency mask, backward-warp the re-stylized earlier frame and take
the RMS masked difference.

Faithful quirks reproduced (PARITY.md):
* frames are cropped to height 432 (``SingleSintelVideo.__getitem__``
  ``[:, :432, :]``) so dims are /8;
* ``computeTCL`` RE-STYLIZES the earlier frame inside the metric
  (``sintel_eval.py:109``) instead of caching the previous output;
* the StarGAN-family harness feeds [−1, 1]-normalized frames straight into
  RAFT, which then applies its own ``2·(x/255)−1`` — RAFT effectively sees a
  ~0.008-contrast image (instance-norm feature encoding partially rescues
  it). The committed reference numbers embed this, so ``raft_preprocess``
  defaults to identity on whatever range the caller's pipeline uses.

TPU-native structure: stylize + RAFT (fwd & bwd) + mask + warp + TCL compile
into ONE jitted program per (resolution, style) — no host round-trips inside
the per-frame loop; DT uses chained timing (dispatch-async-safe).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from vst.ops.flowtools import fbc_mask
from vst.ops.sample import warp
from vst.ops.image import InputPadder
from vst.core.metrics import save_json, aggregate_means


class SintelVideo:
    """One video's frames in memory: (N, H, W, 3) float32 [0, 1], H=432."""

    def __init__(self, name: str, frames: np.ndarray):
        self.name = name
        self.frames = frames

    def __len__(self):
        return self.frames.shape[0]


def load_sintel_videos(sintel_dir: str, crop_h: int = 432) -> List[SintelVideo]:
    """Load training/final + test/final videos, frame lists sorted
    (sintel_eval.py:156-167; frames cropped to 432 rows like
    SingleSintelVideo)."""
    import imageio.v2 as imageio

    videos = []
    for split in ("training", "test"):
        base = os.path.join(sintel_dir, split, "final")
        if not os.path.isdir(base):
            continue
        for vid in sorted(os.listdir(base)):
            vdir = os.path.join(base, vid)
            frames = []
            for fid in sorted(os.listdir(vdir)):
                img = imageio.imread(os.path.join(vdir, fid)).astype(np.float32) / 255.0
                frames.append(img[:crop_h])
            videos.append(SintelVideo(vid, np.stack(frames)))
    return videos


def make_tcl_program(
    stylize_fn: Callable,
    raft_apply: Callable,
    raft_iters: int = 20,
    raft_preprocess: Optional[Callable] = None,
):
    """Build the fused per-frame eval program.

    stylize_fn(img, style) → stylized frame (same spatial dims); both img and
    output in the caller's pipeline range. style is an arbitrary pytree
    (style id, style code, ...).
    raft_apply(img1, img2) → upsampled flow (B, H, W, 2); caller binds params
    and iteration count.
    raft_preprocess maps pipeline-range frames to whatever the method family
    feeds RAFT (identity default — see module docstring on the [−1,1] quirk).

    Returns jitted ``tcl(img, img_earlier, style) → (x_fake, tcl)`` and
    jitted ``stylize(img, style) → x_fake``.
    """
    prep = raft_preprocess or (lambda x: x)

    def compute_raft_multi(imgs_a, imgs_b):
        """K flow pairs — forward AND backward each — in ONE batched RAFT
        call (batch 2K). The update loop is latency- rather than FLOP-bound
        at small batch (artifacts/raft/raft_timing.json slope rows), so
        stacking pairs through one program divides the per-pair cost;
        per-direction results are identical to separate calls (every RAFT
        op is per-sample: convs, instance norm, GRU, corr lookup)."""
        padder = InputPadder(imgs_a[0].shape)
        padded = [padder.pad(prep(a), prep(b))
                  for a, b in zip(imgs_a, imgs_b)]
        a = jnp.concatenate([p[0] for p in padded]
                            + [p[1] for p in padded], axis=0)
        b = jnp.concatenate([p[1] for p in padded]
                            + [p[0] for p in padded], axis=0)
        _, flow_up = raft_apply(a, b)
        n = imgs_a[0].shape[0]
        k = len(imgs_a)
        # rows [0, K): forward flows a_i→b_i; rows [K, 2K): backward
        fwd = [padder.unpad(flow_up[i * n:(i + 1) * n]) for i in range(k)]
        bwd = [padder.unpad(flow_up[(k + i) * n:(k + i + 1) * n])
               for i in range(k)]
        return fwd, bwd

    def compute_raft_pair(img1, img2):
        """Forward AND backward flow in ONE batched RAFT call — doubles the
        tiny 1/8-res M-dim (RAFT's convs are latency-bound at batch 1 on
        TPU) and halves dispatches; bit-identical per-direction results."""
        fwd, bwd = compute_raft_multi([img1], [img2])
        return fwd[0], bwd[0]

    def tcl(img, img2, style):
        """computeTCL parity (sintel_eval.py:104-110): img = current frame,
        img2 = earlier frame."""
        x_fake = stylize_fn(img, style)
        ff, bf = compute_raft_pair(img2, img)
        mask = fbc_mask(ff, bf)
        warped = warp(stylize_fn(img2, style), bf)
        val = jnp.sqrt(jnp.mean((mask * (x_fake - warped)) ** 2))
        return x_fake, val

    def tcl_gt(img, img2, style, ff, bf):
        """Same metric with PRECOMPUTED flow (the reference's GT-flow infer
        path, fast_style_transfer.py:267-390) — used when flow comes from a
        dataset or an analytic motion oracle instead of RAFT."""
        x_fake = stylize_fn(img, style)
        mask = fbc_mask(ff, bf)
        warped = warp(stylize_fn(img2, style), bf)
        val = jnp.sqrt(jnp.mean((mask * (x_fake - warped)) ** 2))
        return x_fake, val

    def tcl2(img, img_st, img_lt, style):
        """ST and LT TCL for one frame in ONE fused program: the current
        frame is stylized once (both metrics share x_fake) and the two flow
        pairs ride one RAFT call at batch 4 via compute_raft_multi — same
        math as two ``tcl`` calls, ~2× fewer RAFT invocations per frame."""
        x_fake = stylize_fn(img, style)
        fwd, bwd = compute_raft_multi([img_st, img_lt], [img, img])
        vals = []
        for ff, bf, earlier in zip(fwd, bwd, (img_st, img_lt)):
            mask = fbc_mask(ff, bf)
            warped = warp(stylize_fn(earlier, style), bf)
            vals.append(jnp.sqrt(jnp.mean((mask * (x_fake - warped)) ** 2)))
        return x_fake, vals[0], vals[1]

    def stylize(img, style):
        return stylize_fn(img, style)

    return jax.jit(tcl), jax.jit(stylize), jax.jit(tcl_gt), jax.jit(tcl2)


def evaluate_videos(
    videos: Sequence[SintelVideo],
    stylize_fn: Callable,
    raft_apply: Callable,
    styles: Sequence,
    out_path: Optional[str] = None,
    lt_len: int = 5,
    frame_transform: Optional[Callable] = None,
    raft_preprocess: Optional[Callable] = None,
    save_frames: bool = False,
    dt_iters: int = 20,  # match bench.py's chain length (sync amortization)
    num_domains: Optional[int] = None,
    flow_fn: Optional[Callable] = None,
    save_transform: Optional[Callable] = None,
) -> Dict[str, Dict[str, float]]:
    """Run the full Sintel benchmark.

    ``styles``: list of style pytrees; style index d is reported as ``_s{d+1}``.
    ``frame_transform``: maps [0,1] frames into the method's pipeline range
    (e.g. ×2−1 for the GAN family). ``save_transform(style_index, frame)``
    postprocesses SAVED frames only (the reference's style-3 grayscale is a
    save_image-time effect, fast_style_transfer.py:466-469/:552 — TCL math
    never sees it). Returns {"TCL-ST": {...}, "TCL-LT": ...,
    "DT": ...} dicts with reference-style aggregation; writes JSONs when
    ``out_path`` given.
    """
    ft = frame_transform or (lambda x: x)
    tcl_prog, stylize_prog, tcl_gt_prog, tcl2_prog = make_tcl_program(
        stylize_fn, raft_apply, raft_preprocess=raft_preprocess
    )

    tcl_st: Dict[str, float] = {}
    tcl_lt: Dict[str, float] = {}
    dt: Dict[str, float] = {}

    # device-put style pytrees: python ints would be treated as fresh
    # compile-time constants per style, retracing the fused RAFT program
    # once per (video, style) — arrays make it ONE compilation total
    styles = [jax.tree_util.tree_map(jnp.asarray, s) for s in styles]

    from vst.core.trace import profile_trace

    with contextlib.ExitStack() as _stack:
        _stack.enter_context(profile_trace())  # VST_PROFILE_DIR gated
        # warm every (style, resolution) stylize program BEFORE any DT
        # timing: on the tunneled backend the first executions after a
        # remote compile run ~2× slow, which used to skew the first
        # style's DT mean (artifacts/johnson DT_mean_s1 ≈ 2× s2/s3)
        if videos and dt_iters > 0:
            seen_hw = set()
            for video in videos:
                hw = video.frames.shape[1:3]
                if hw in seen_hw:
                    continue
                seen_hw.add(hw)
                f0 = jnp.asarray(ft(video.frames[:1]))
                for style in styles:
                    for _ in range(2):
                        float(jnp.sum(stylize_prog(f0, style)))
        for video in videos:
            frames = jnp.asarray(ft(video.frames))
            n = len(video)
            for d, style in enumerate(styles):
                results_for = _eval_one(
                    video, frames, n, d, style, stylize_prog, tcl_prog,
                    lt_len, dt_iters, save_frames, out_path,
                    tcl_gt_prog=tcl_gt_prog, flow_fn=flow_fn,
                    save_transform=save_transform, tcl2_prog=tcl2_prog)
                key = f"{video.name}_s{d + 1}"
                tcl_st[f"TCL-ST_{key}"], tcl_lt[f"TCL-LT_{key}"], dt[f"DT_{key}"] = results_for
    nd = (num_domains or len(styles) + 1) - 1
    results = {}
    for out_id, data in (("TCL-ST", tcl_st), ("TCL-LT", tcl_lt), ("DT", dt)):
        agg = aggregate_means(
            {k: v for k, v in data.items()}, num_styles=nd
        )
        # reference naming: "<ID>_mean" instead of bare "_mean"
        agg[f"{out_id}_mean"] = agg.pop("_mean")
        for d in range(1, nd + 1):
            if f"_mean_s{d}" in agg:
                agg[f"{out_id}_mean_s{d}"] = agg.pop(f"_mean_s{d}")
        results[out_id] = agg
        if out_path:
            save_json(agg, os.path.join(out_path, out_id + ".json"), aggregate=False)
    return results


def _eval_one(video, frames, n, d, style, stylize_prog, tcl_prog,
              lt_len, dt_iters, save_frames, out_path,
              tcl_gt_prog=None, flow_fn=None, save_transform=None,
              tcl2_prog=None):
    """One (video, style) pass: DT chained timing + per-frame ST/LT TCL.
    Phases carry profiler annotations (vst.core.trace) so a
    VST_PROFILE_DIR trace shows DT vs TCL device time separately."""
    from vst.core.trace import annotate

    key = f"{video.name}_s{d + 1}"
    st_vals, lt_vals = [], []

    # DT: chained timing on the stylize program alone (the reference
    # times only the generator call, sintel_eval.py:210-214)
    with annotate(f"DT/{key}"):
        x = frames[0:1]
        _ = stylize_prog(x, style)
        float(jnp.sum(_))
        dt_ms = float("inf")  # best-of-2 windows: tunnel runs jitter ±10%
        for _w in range(2):
            t0 = time.perf_counter()
            for _i in range(dt_iters):
                x = stylize_prog(x, style)
            float(jnp.sum(x))
            dt_ms = min(dt_ms,
                        (time.perf_counter() - t0) / dt_iters * 1000.0)

    def tcl_pair(img, j, i):
        """TCL between current i and earlier j — RAFT flow, or the caller's
        flow oracle (GT .flo / analytic affine motion) when flow_fn given."""
        if flow_fn is None:
            _, v = tcl_prog(img, frames[j:j + 1], style)
        else:
            ff, bf = flow_fn(video, i, j)
            _, v = tcl_gt_prog(img, frames[j:j + 1], style,
                               jnp.asarray(ff)[None], jnp.asarray(bf)[None])
        return v

    with annotate(f"TCL/{key}"):
        for i in range(n):
            img = frames[i:i + 1]
            if (i >= lt_len and flow_fn is None and tcl2_prog is not None):
                # both metrics in one program (RAFT at batch 4, shared
                # stylize of the current frame)
                _, st_v, lt_v = tcl2_prog(
                    img, frames[i - 1:i], frames[i - lt_len:i - lt_len + 1],
                    style)
                st_vals.append(float(st_v))
                lt_vals.append(float(lt_v))
            else:
                if i > 0:
                    st_vals.append(float(tcl_pair(img, i - 1, i)))
                if i >= lt_len:
                    lt_vals.append(float(tcl_pair(img, i - lt_len, i)))
            if save_frames and out_path:
                x_fake = np.asarray(stylize_prog(img, style))[0]
                if save_transform is not None:
                    x_fake = save_transform(d, x_fake)
                _save_frame(x_fake, os.path.join(out_path, key, f"frame_{i:04d}.png"))

    st = float(np.mean(st_vals)) if st_vals else 0.0
    lt = float(np.mean(lt_vals)) if lt_vals else 0.0
    return st, lt, dt_ms


def _save_frame(x: np.ndarray, path: str) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.clip(x, 0.0, 1.0)
    imageio.imwrite(path, (img * 255).astype(np.uint8))


def evaluate_videos_sharded(
    videos: Sequence[SintelVideo],
    stylize_fn: Callable,
    raft_apply: Callable,
    styles: Sequence,
    mesh,
    lt_len: int = 5,
    frame_transform: Optional[Callable] = None,
    raft_preprocess: Optional[Callable] = None,
) -> Dict[str, Dict[str, float]]:
    """Multi-chip TCL eval: frames of each (video, style) pass are BATCHED
    and sharded across the mesh's data axis — the TPU-native replacement for
    the reference's one-frame-at-a-time loop (SURVEY §2.7: shard videos/
    frames over ICI). Per-frame TCL values match evaluate_videos (same math,
    batched); DT is reported from the batched throughput.
    """
    import time as _time

    from vst.parallel.mesh import batch_sharding

    ft = frame_transform or (lambda x: x)
    prep = raft_preprocess or (lambda x: x)
    n_dev = int(np.prod(mesh.devices.shape))
    sharding = batch_sharding(mesh)

    def tcl_batch(imgs, prevs, style):
        x_fake = stylize_fn(imgs, style)
        padder = InputPadder(imgs.shape)
        i1, i2 = padder.pad(prep(prevs), prep(imgs))
        _, ff = raft_apply(i1, i2)
        _, bf_ = raft_apply(i2, i1)
        ff = padder.unpad(ff)
        bf = padder.unpad(bf_)
        mask = fbc_mask(ff, bf)
        warped = warp(stylize_fn(prevs, style), bf)
        per = jnp.sqrt(jnp.mean((mask * (x_fake - warped)) ** 2,
                                axis=(1, 2, 3)))
        return per

    tcl_batch = jax.jit(tcl_batch)

    tcl_st: Dict[str, float] = {}
    tcl_lt: Dict[str, float] = {}
    dt: Dict[str, float] = {}
    styles = [jax.tree_util.tree_map(jnp.asarray, s) for s in styles]

    for video in videos:
        frames = np.asarray(ft(video.frames))
        n = len(video)
        for d, style in enumerate(styles):
            key = f"{video.name}_s{d + 1}"

            def run_pairs(cur_idx, prev_idx):
                vals = []
                t0 = _time.perf_counter()
                for i in range(0, len(cur_idx), n_dev):
                    ci = cur_idx[i:i + n_dev]
                    pi = prev_idx[i:i + n_dev]
                    if len(ci) < n_dev:  # pad the tail to the device count
                        pad = n_dev - len(ci)
                        ci = list(ci) + [ci[-1]] * pad
                        pi = list(pi) + [pi[-1]] * pad
                        real = n_dev - pad
                    else:
                        real = n_dev
                    imgs = jax.device_put(frames[list(ci)], sharding)
                    prevs = jax.device_put(frames[list(pi)], sharding)
                    per = np.asarray(tcl_batch(imgs, prevs, style))
                    vals.extend(per[:real].tolist())
                elapsed = _time.perf_counter() - t0
                return vals, elapsed

            st_vals, t_st = run_pairs(list(range(1, n)), list(range(0, n - 1)))
            lt_vals, _ = run_pairs(list(range(lt_len, n)),
                                   list(range(0, n - lt_len)))
            tcl_st[f"TCL-ST_{key}"] = float(np.mean(st_vals)) if st_vals else 0.0
            tcl_lt[f"TCL-LT_{key}"] = float(np.mean(lt_vals)) if lt_vals else 0.0
            dt[f"DT_{key}"] = t_st / max(len(st_vals), 1) * 1000.0

    nd = len(styles)
    results = {}
    for out_id, data in (("TCL-ST", tcl_st), ("TCL-LT", tcl_lt), ("DT", dt)):
        agg = aggregate_means(dict(data), num_styles=nd)
        agg[f"{out_id}_mean"] = agg.pop("_mean")
        for d in range(1, nd + 1):
            if f"_mean_s{d}" in agg:
                agg[f"{out_id}_mean_s{d}"] = agg.pop(f"_mean_s{d}")
        results[out_id] = agg
    return results
