"""FC2 pseudo-paired multi-domain dataset (SG2-family loader).

Parity with ``StarGANv2Adv/core/data_loader.py:217-348`` (DatasetFC2 /
get_loaderFC2 / FC2Fetcher):

* directory layout: ``style_dir/style{0..D−1}/<img>.jpg`` (Gatys-styled FC2
  crops, content saved as style0), ``temp_dir/style{d}/<img>_2.jpg`` (styled
  next frame), ``data_dir/<img>.npy`` ((1, H, W, 9) = img1 ⊕ img2 ⊕ mask ⊕
  backward flow) — the datagen in vst.data.datagen produces this layout;
* 4 domain-pair entries per image: (0,0), (0,d), (d,0), (d,d) per non-content
  style d (:281-288);
* seeded shuffle (1234) then a 97%/3% train/eval split (:292-311; AdvCon
  uses 99.9% — ``split`` arg);
* batches normalized ×2−1 ([−1,1]) like the reference transform;
* the fetcher adds two latent draws per batch (:321-348).

A synthetic in-memory variant (``synthetic_fc2_batches``) provides the same
batch dict without any files for tests/CI.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


BATCH_KEYS = ("x_src", "x2_src", "y_src", "x_ref", "y_ref", "mask", "flow")


class DatasetFC2:
    def __init__(self, data_dir: str, style_dir: str, temp_dir: str,
                 num_dom: int = 2, base_len: Optional[int] = 22208):
        self.data_dir = data_dir
        self.style_dir = style_dir
        self.temp_dir = temp_dir
        self.styles: List[str] = []
        self.dataset: List[Tuple[str, int, int]] = []

        style_list = sorted(os.listdir(style_dir))[:num_dom]
        for sty in style_list:
            n = len(os.listdir(os.path.join(style_dir, sty)))
            if base_len is not None:
                assert n == base_len, f"{sty}: {n} != {base_len}"
            self.styles.append(sty)

        for img in sorted(os.listdir(os.path.join(style_dir, style_list[0]))):
            self.dataset.append((img, 0, 0))
            for i, _ in enumerate(style_list[1:]):
                self.dataset.append((img, 0, i + 1))
                self.dataset.append((img, i + 1, 0))
                self.dataset.append((img, i + 1, i + 1))

        rng = random.Random(1234)
        rng.shuffle(self.dataset)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import imageio.v2 as imageio

        file, src_lbl, ref_lbl = self.dataset[index]

        def load(path):
            img = imageio.imread(path).astype(np.float32) / 255.0
            return img * 2.0 - 1.0  # Normalize(0.5, 0.5)

        stem = os.path.splitext(file)[0]
        src = load(os.path.join(self.style_dir, self.styles[src_lbl], file))
        src2 = load(os.path.join(self.temp_dir, self.styles[src_lbl], stem + "_2.jpg"))
        ref = load(os.path.join(self.style_dir, self.styles[ref_lbl], file))

        np_data = np.load(os.path.join(self.data_dir, stem + ".npy"))[0]
        mask = np_data[:, :, 6:7].astype(np.float32)
        flow = np_data[:, :, 7:9].astype(np.float32)
        return {
            "x_src": src, "x2_src": src2, "y_src": np.int32(src_lbl),
            "x_ref": ref, "y_ref": np.int32(ref_lbl),
            "mask": mask, "flow": flow,
        }


def train_eval_split(n: int, split: float = 0.97, seed: int = 0):
    """random_split parity: shuffled index partition (the reference uses
    torch's RNG; we use a seeded numpy permutation — same statistics)."""
    perm = np.random.RandomState(seed).permutation(n)
    k = int(split * n)
    return perm[:k], perm[k:]


class FC2Loader:
    """Batching iterator over DatasetFC2 indices with epoch shuffling."""

    def __init__(self, dataset: DatasetFC2, indices, batch_size: int,
                 seed: int = 0):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.indices) // self.batch_size

    def epoch(self, shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        order = self.indices.copy()
        if shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, len(order) - bs + 1, bs):
            samples = [self.dataset[int(j)] for j in order[i:i + bs]]
            yield {k: np.stack([s[k] for s in samples]) for k in BATCH_KEYS}


class FC2Fetcher:
    """Infinite fetcher adding z_trg/z_trg2 latents (data_loader.py:321-348)."""

    def __init__(self, loader: FC2Loader, latent_dim: int = 16, seed: int = 0):
        self.loader = loader
        self.latent_dim = latent_dim
        self._rng = np.random.RandomState(seed)
        self._it = iter(loader.epoch())

    def __next__(self) -> Dict[str, np.ndarray]:
        try:
            batch = next(self._it)
        except StopIteration:
            self._it = iter(self.loader.epoch())
            batch = next(self._it)
        n = batch["x_src"].shape[0]
        batch = dict(batch)
        batch["z_trg"] = self._rng.randn(n, self.latent_dim).astype(np.float32)
        batch["z_trg2"] = self._rng.randn(n, self.latent_dim).astype(np.float32)
        return batch


def synthetic_fc2_batches(
    n_batches: int, batch_size: int, hw=(64, 64), num_dom: int = 4,
    seed: int = 0,
):
    """In-memory stand-in producing the same batch dict: per sample, an
    affine-motion frame pair 'styled' per domain by deterministic color
    remaps, with analytic mask/flow."""
    from vst.data.synthetic import synthetic_batch

    rng = np.random.RandomState(seed)

    def stylize_np(img, d):
        if d == 0:
            return img
        m = np.asarray([[0.9, 0.2, 0.0], [0.1, 0.7, 0.3], [0.2, 0.1, 0.8]],
                       np.float32)
        out = img
        for _ in range(d):
            out = np.einsum("...c,cd->...d", out, m)
        return np.clip(out, 0, 1)

    out = []
    for b in range(n_batches):
        base = synthetic_batch(batch_size, hw=hw, n_frames=2, seed=seed + b)
        y_src = rng.randint(0, num_dom, batch_size)
        y_ref = rng.randint(0, num_dom, batch_size)
        x_src = np.stack([stylize_np(base["imgs"][i, 0], y_src[i])
                          for i in range(batch_size)])
        x2_src = np.stack([stylize_np(base["imgs"][i, 1], y_src[i])
                           for i in range(batch_size)])
        x_ref = np.stack([stylize_np(base["imgs"][i, 0], y_ref[i])
                          for i in range(batch_size)])
        out.append({
            "x_src": x_src * 2 - 1,
            "x2_src": x2_src * 2 - 1,
            "y_src": y_src.astype(np.int32),
            "x_ref": x_ref * 2 - 1,
            "y_ref": y_ref.astype(np.int32),
            "mask": base["masks"][:, 0],
            "flow": base["flows"][:, 0],
        })
    return out


class CycleGANFC2Dataset:
    """CycleGAN-family FC2 loader — parity with
    ``CycleGAN/fc2_dataset.py:19-66`` (one model per style sid): samples
    (img1, img2, simg1, simg2) where img1 comes from ``styled-files/style0``,
    img2 is the ``_2``-suffixed next frame from ``styled-files3/style0``, and
    simg1/simg2 are the same files from ``style{sid}``; seed-1234 shuffle.
    Images returned in [−1,1]."""

    def __init__(self, dset_dir: str, sid: int = 1,
                 with_flow: bool = False):
        self.data_dir1 = os.path.join(dset_dir, "styled-files", "style0")
        self.data_dir2 = os.path.join(dset_dir, "styled-files3", "style0")
        self.style_dir1 = os.path.join(dset_dir, "styled-files", f"style{sid}")
        self.style_dir2 = os.path.join(dset_dir, "styled-files3", f"style{sid}")
        # +Con/MoGAN/ConGAN variants also need the GT mask/flow npy
        # (CycleGANCon/fc2_dataset.py:32-46)
        self.npy_dir = os.path.join(dset_dir, "DATAFiles") if with_flow else None

        names = sorted(os.listdir(self.data_dir1))
        assert len(names) == len(os.listdir(self.data_dir2))
        self.dataset = [
            (n, os.path.splitext(n)[0] + "_2" + os.path.splitext(n)[1])
            for n in names
        ]
        rng = random.Random(1234)
        rng.shuffle(self.dataset)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int):
        import imageio.v2 as imageio

        def load(path):
            return imageio.imread(path).astype(np.float32) / 255.0 * 2 - 1

        n1, n2 = self.dataset[index]
        out = {
            "real_A": load(os.path.join(self.data_dir1, n1)),
            "real_A2": load(os.path.join(self.data_dir2, n2)),
            "real_B": load(os.path.join(self.style_dir1, n1)),
            "real_B2": load(os.path.join(self.style_dir2, n2)),
        }
        if self.npy_dir:
            stem = os.path.splitext(n1)[0]
            np_data = np.load(os.path.join(self.npy_dir, stem + ".npy"))[0]
            out["mask"] = np_data[:, :, 6:7].astype(np.float32)
            out["flow"] = np_data[:, :, 7:9].astype(np.float32)
        return out

    def epoch(self, batch_size: int, shuffle: bool = True, seed: int = 0):
        order = np.arange(len(self.dataset))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            samples = [self[int(j)] for j in order[i:i + batch_size]]
            yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}
