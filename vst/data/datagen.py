"""Dataset generation — the pseudo-paired styled corpus + flow precompute.

TPU-native rebuild of the reference's generation pipelines:

* ``generate_styled_dataset`` — the Gatys batch styler
  (``datasets/generation/datagen.py:150-321``): for each style image,
  LBFGS-stylize every content crop (batched on the accelerator) over the
  OBST pyramid; writes ``styled-files/style{k}/<img>.jpg`` with the content
  itself saved as ``style0``; style index 3 is post-processed to grayscale
  (:131-148, :313-316). A ``_2.jpg`` second-frame variant (``dataload.py:
  41-66``) goes to the ``temp_dir`` layout consumed by DatasetFC2.
* ``precompute_lt_flow`` — the Sintel5/FC5 long-term flow data
  (``dataset-generation/flyingchairs2-generation.py:150-220``), using OUR
  JAX RAFT instead of the reference's TensorFlow-1 SelFlow graph
  (SURVEY §2.6): per frame t ≥ 5, backward flow frame_t → frame_{t−5} and
  fb-consistency mask, packed (1, H, W, 3) like the reference's .npy files.
* ``pack_fc2_npy`` — the FC2 training tuples (img1 ⊕ img2 ⊕ mask ⊕ flow
  channelwise, ``methods/learning-based/datasets.py:52-54``) from the
  affine-motion synthesizer.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def to_grayscale3(img: np.ndarray) -> np.ndarray:
    """PIL 'L' conversion replicated (ITU-R 601-2: 0.299/0.587/0.114),
    repeated to 3 channels — the style-3 postprocess (datagen.py:131-148)."""
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return np.repeat(g[..., None], 3, axis=-1)


def generate_styled_dataset(
    content_images: Iterable,  # (name, (H, W, 3) float32 [0,1]) pairs
    style_images: np.ndarray,  # (S, h, w, 3) [0,1]
    out_dir: str,
    obst=None,
    pyr_shapes: Sequence = ((64, 64), (128, 128), (256, 256)),
    weight_tcl: float = 0.0,
    batch_size: int = 32,
    grayscale_styles: Sequence[int] = (3,),
    skip_existing: bool = True,
):
    """Writes ``out_dir/style{k}`` dirs; style0 = content, style k ≥ 1 =
    Gatys-stylized. Batched LBFGS on-device (the reference batches 32,
    datagen.py:222)."""
    import imageio.v2 as imageio

    from vst.models.gatys import OBST
    from vst.perceptual.vgg import obst_prep, obst_postp
    from vst.ops.image import resize_bilinear

    obst = obst or OBST()
    S = style_images.shape[0]
    for k in range(S + 1):
        os.makedirs(os.path.join(out_dir, f"style{k}"), exist_ok=True)

    items = list(content_images)

    def save(path, img01):
        img01 = np.nan_to_num(img01, nan=0.5)  # LBFGS can NaN single pixels
        imageio.imwrite(path, (np.clip(img01, 0, 1) * 255).astype(np.uint8))

    # style0 = the content crops themselves (datagen.py:259-266)
    for name, img in items:
        p = os.path.join(out_dir, "style0", name + ".jpg")
        if not (skip_existing and os.path.exists(p)):
            img_r = np.asarray(
                resize_bilinear(jnp.asarray(img)[None], pyr_shapes[-1])
            )[0]
            save(p, img_r)

    for sid in range(S):
        obst.set_style(style_images[sid], pyr_shapes)
        for i in range(0, len(items), batch_size):
            chunk = items[i:i + batch_size]
            todo = [
                (name, img) for name, img in chunk
                if not (skip_existing and os.path.exists(
                    os.path.join(out_dir, f"style{sid + 1}", name + ".jpg")))
            ]
            if not todo:
                continue
            batch = jnp.stack([
                resize_bilinear(jnp.asarray(img)[None], pyr_shapes[-1])[0]
                for _, img in todo
            ])
            x = obst_prep(batch)
            styled = obst.run(x, x, jnp.zeros(x.shape[:3] + (1,)), pyr_shapes,
                              weight_tcl=weight_tcl)
            rgb = np.asarray(obst_postp(styled))
            for (name, _), img01 in zip(todo, rgb):
                if (sid + 1) in grayscale_styles:
                    img01 = to_grayscale3(img01)
                save(os.path.join(out_dir, f"style{sid + 1}", name + ".jpg"),
                     img01)


def precompute_lt_flow(
    frames: np.ndarray,  # (N, H, W, 3) float32 [0,1]
    raft_apply: Callable,
    out_dir: Optional[str] = None,
    offset: int = 5,
):
    """Long-term (t → t−offset) backward flow + mask per frame, replacing the
    TF-SelFlow precompute. Returns the list of (1, H, W, 3) arrays (flow_u,
    flow_v, mask) and optionally writes ``frame_{t:04d}.npy``."""
    from vst.ops.flowtools import fbc_mask
    from vst.ops.image import InputPadder

    def flow(i1, i2):
        padder = InputPadder(i1.shape)
        a, b = padder.pad(jnp.asarray(i1), jnp.asarray(i2))
        _, up = raft_apply(a, b)
        return padder.unpad(up)

    out = []
    for t in range(offset, frames.shape[0]):
        cur = frames[t][None]
        past = frames[t - offset][None]
        bf = flow(cur, past)
        ff = flow(past, cur)
        mask = fbc_mask(ff, bf)
        packed = np.concatenate(
            [np.asarray(bf)[0], np.asarray(mask)[0]], axis=-1
        )[None].astype(np.float32)
        out.append(packed)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(out_dir, f"frame_{t:04d}.npy"), packed)
    return out


def procedural_stylize(img: np.ndarray, sid: int) -> np.ndarray:
    """Deterministic per-domain appearance transforms — the stand-in for the
    Gatys batch styler when no pretrained VGG weights are available (this
    environment has no network egress; the reference styles its corpus with
    ``Models/vgg_conv.pth``, a missing large blob). Each domain is a fixed,
    visually distinct, locally-computable mapping so the translation task the
    GAN families train on is well-posed and convergence is verifiable by eye:

    * style1 — warm channel mix + gamma lift;
    * style2 — cool channel mix + 6-level posterization;
    * style3 — grayscale, exactly the reference's style-3 postprocess
      (datagen.py:131-148).

    Being pixelwise-deterministic, the same transform applied to both frames
    of a pair preserves the analytic flow/mask, so temporal losses stay
    exact. img: (H, W, 3) float [0, 1].
    """
    if sid == 0:
        return img
    if sid == 3:
        return to_grayscale3(img)
    if sid == 1:
        m = np.array([[0.85, 0.25, 0.05], [0.10, 0.75, 0.10], [0.05, 0.15, 0.55]],
                     np.float32)
        out = np.einsum("...c,cd->...d", img, m.T)
        return np.clip(out ** 0.8, 0.0, 1.0)
    if sid == 2:
        m = np.array([[0.55, 0.15, 0.05], [0.10, 0.75, 0.25], [0.05, 0.25, 0.85]],
                     np.float32)
        out = np.clip(np.einsum("...c,cd->...d", img, m.T), 0.0, 1.0)
        return np.round(out * 5.0) / 5.0
    # further domains: rotate through the style-1/2 mixes with extra gamma
    return np.clip(procedural_stylize(img, 1 + sid % 2) ** 1.1, 0.0, 1.0)


def generate_fc2_corpus(
    out_root: str,
    n_samples: int,
    hw=(256, 256),
    style_dir: Optional[str] = None,
    iters: Sequence[int] = (30, 25, 20),
    batch_size: int = 16,
    seed: int = 0,
    grayscale_styles: Sequence[int] = (3,),
    skip_existing: bool = True,
    styler: str = "gatys",
):
    """Materialize the COMPLETE pseudo-paired FC2 corpus layout consumed by
    DatasetFC2 / CycleGANFC2Dataset (the reference's ``styled-files/`` +
    ``styled-files3/`` + ``DATAFiles/`` trio, ``core/data_loader.py:232-250``):

    * ``DATAFiles/<name>.npy``      — (1, H, W, 9) img1 ⊕ img2 ⊕ mask ⊕ bw-flow
    * ``styled-files/style{k}/<name>.jpg``        — frame-1 per domain
    * ``styled-files3/style{k}/<name>_2.jpg``     — frame-2 per domain

    Content = structured synthetic scenes with affine motion (analytic flow),
    style0 = raw content, style k ≥ 1 = Gatys/OBST-stylized (both frames,
    batched LBFGS on-device), style 3 grayscale-postprocessed like the
    reference (datagen.py:131-148)."""
    import imageio.v2 as imageio

    from vst.data.styles import load_style_images
    from vst.data.synthetic import AffineMotionGenerator, _scene
    from vst.models.gatys import OBST
    from vst.perceptual.vgg import obst_prep, obst_postp

    data_dir = os.path.join(out_root, "DATAFiles")
    sdir = os.path.join(out_root, "styled-files")
    tdir = os.path.join(out_root, "styled-files3")
    styles = load_style_images(style_dir, size=256)
    n_styles = styles.shape[0]
    os.makedirs(data_dir, exist_ok=True)
    for k in range(n_styles + 1):
        os.makedirs(os.path.join(sdir, f"style{k}"), exist_ok=True)
        os.makedirs(os.path.join(tdir, f"style{k}"), exist_ok=True)

    def save(path, img01):
        img01 = np.nan_to_num(img01, nan=0.5)  # LBFGS can NaN single pixels
        imageio.imwrite(path, (np.clip(img01, 0, 1) * 255).astype(np.uint8))

    # -- content frames + analytic flow/mask --------------------------------
    rng = np.random.RandomState(seed)
    gen = AffineMotionGenerator(crop_hw=hw, seed=seed + 1)
    big = (hw[0] + 96, hw[1] + 96)
    names, f1s, f2s = [], [], []
    for i in range(n_samples):
        name = f"{i:07d}"
        names.append(name)
        frames, flows, masks = gen.generate(_scene(rng, big), n_frames=2)
        f1s.append(frames[0])
        f2s.append(frames[1])
        npy = os.path.join(data_dir, name + ".npy")
        if not (skip_existing and os.path.exists(npy)):
            packed = np.concatenate(
                [frames[0], frames[1], masks[0], flows[0]], axis=-1
            )[None].astype(np.float32)
            np.save(npy, packed)
        p1 = os.path.join(sdir, "style0", name + ".jpg")
        p2 = os.path.join(tdir, "style0", name + "_2.jpg")
        if not (skip_existing and os.path.exists(p1)):
            save(p1, frames[0])
        if not (skip_existing and os.path.exists(p2)):
            save(p2, frames[1])

    # -- procedural domains (no-VGG-weights fallback) -----------------------
    if styler == "procedural":
        for sid in range(1, n_styles + 1):
            n_done = 0
            for name, f1, f2 in zip(names, f1s, f2s):
                p1 = os.path.join(sdir, f"style{sid}", name + ".jpg")
                p2 = os.path.join(tdir, f"style{sid}", name + "_2.jpg")
                if not (skip_existing and os.path.exists(p1)):
                    save(p1, procedural_stylize(f1, sid))
                    n_done += 1
                if not (skip_existing and os.path.exists(p2)):
                    save(p2, procedural_stylize(f2, sid))
            print(f"corpus: style{sid} done procedurally ({n_done} images)",
                  flush=True)
        return

    # -- Gatys-styled domains (both frames, batched LBFGS) ------------------
    pyr = ((hw[0] // 4, hw[1] // 4), (hw[0] // 2, hw[1] // 2), tuple(hw))
    obst = OBST(max_iters=tuple(iters))
    for sid in range(n_styles):
        obst.set_style(styles[sid], pyr)
        # flat list of (out_path, content) spanning both frames
        jobs = []
        for name, f1, f2 in zip(names, f1s, f2s):
            jobs.append((os.path.join(sdir, f"style{sid + 1}", name + ".jpg"), f1))
            jobs.append((os.path.join(tdir, f"style{sid + 1}", name + "_2.jpg"), f2))
        jobs = [(p, img) for p, img in jobs
                if not (skip_existing and os.path.exists(p))]
        for i in range(0, len(jobs), batch_size):
            chunk = jobs[i:i + batch_size]
            batch = jnp.stack([jnp.asarray(img) for _, img in chunk])
            if batch.shape[0] < batch_size:  # pad tail — avoid a recompile
                pad = batch_size - batch.shape[0]
                batch = jnp.concatenate([batch, batch[:1].repeat(pad, 0)], 0)
            x = obst_prep(batch)
            styled = obst.run(x, x, jnp.zeros(x.shape[:3] + (1,)), pyr,
                              weight_tcl=0.0)
            rgb = np.asarray(obst_postp(styled))
            for (path, _), img01 in zip(chunk, rgb):
                if (sid + 1) in grayscale_styles:
                    img01 = to_grayscale3(img01)
                save(path, img01)
        print(f"corpus: style{sid + 1} done ({len(jobs)} images)", flush=True)


def pack_fc2_npy(out_dir: str, n_samples: int, hw=(256, 256), seed: int = 0):
    """Materialize FC2-style training .npy files ((1, H, W, 9) channelwise)
    from the affine-motion synthesizer — the test/CI stand-in for the real
    FlyingChairs2 corpus."""
    from vst.data.synthetic import synthetic_batch

    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_samples):
        b = synthetic_batch(1, hw=hw, n_frames=2, seed=seed + i)
        packed = np.concatenate(
            [b["imgs"][0, 0], b["imgs"][0, 1], b["masks"][0, 0], b["flows"][0, 0]],
            axis=-1,
        )[None].astype(np.float32)
        np.save(os.path.join(out_dir, f"{i:07d}.npy"), packed)
