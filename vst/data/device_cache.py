"""Device-resident dataset cache — the TPU-native answer to the reference's
``.to('cuda')``-inside-``__getitem__`` pipeline (``datasets.py:75-77``).

The reference streams every batch host→GPU per step. On this TPU the
host↔device link is a tunneled relay (~MB/s), so per-step transfer of a
256² batch costs seconds — 50× the step compute. But the whole FC2-style
corpus fits in HBM once quantized: images are stored uint8 (they came from
.jpg anyway), masks uint8, flows float16 (FC2 flow magnitudes ≪ 2048), so
2 000 packed 256² samples ≈ 1.2 GB of a 16 GB v5e. Upload ONCE, then every
training batch is a pure on-device gather + dequantize — zero bytes on the
host link in the hot loop.

SURVEY §7 ("host/device pipeline … where most of the fps/chip headroom is").
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


class DeviceFC2Cache:
    """Uploads a DATAFiles-style directory ((1, H, W, 9) float .npy per
    sample: img1 ⊕ img2 ⊕ mask ⊕ backward flow) to the default device once.

    ``sample(batch_size)`` returns the dict layout the FastStyle
    trainers consume (imgs (B, 2, H, W, 3), masks (B, 1, H, W, 1),
    flows (B, 1, H, W, 2)) — already f32, already on device.
    """

    def __init__(self, data_dir: str, limit: Optional[int] = None,
                 seed: int = 0, device=None):
        files = sorted(f for f in os.listdir(data_dir)
                       if f.endswith(".npy"))[:limit]
        imgs, masks, flows = [], [], []
        for f in files:
            d = np.load(os.path.join(data_dir, f))[0]
            imgs.append(np.round(
                np.clip(d[:, :, 0:6], 0.0, 1.0) * 255.0).astype(np.uint8))
            masks.append(np.round(
                np.clip(d[:, :, 6:7], 0.0, 1.0)).astype(np.uint8))
            flows.append(d[:, :, 7:9].astype(np.float16))
        dev = device or jax.devices()[0]
        self.n = len(files)
        # one transfer per tensor (not per sample)
        self.imgs = jax.device_put(np.stack(imgs), dev)     # (N, H, W, 6) u8
        self.masks = jax.device_put(np.stack(masks), dev)   # (N, H, W, 1) u8
        self.flows = jax.device_put(np.stack(flows), dev)   # (N, H, W, 2) f16
        self._rng = np.random.RandomState(seed)
        # tables enter as jit ARGUMENTS, never closure constants — a closed-
        # over device array becomes an HLO literal and the compiler chokes
        # serializing GBs into the module
        self._sample = jax.jit(DeviceFC2Cache._gather)

    @staticmethod
    def _gather(tbl_imgs, tbl_masks, tbl_flows,
                idx: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        imgs = jnp.take(tbl_imgs, idx, axis=0).astype(jnp.float32) / 255.0
        B, H, W, _ = imgs.shape
        imgs = imgs.reshape(B, H, W, 2, 3).transpose(0, 3, 1, 2, 4)
        masks = jnp.take(tbl_masks, idx, axis=0).astype(jnp.float32)[:, None]
        flows = jnp.take(tbl_flows, idx, axis=0).astype(jnp.float32)[:, None]
        return {"imgs": imgs, "masks": masks, "flows": flows}

    def sample(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        idx = jnp.asarray(
            self._rng.randint(0, self.n, size=(batch_size,)), jnp.int32)
        return self._sample(self.imgs, self.masks, self.flows, idx)


class DeviceStyledCache:
    """Device-resident pseudo-paired styled corpus (the styled-files /
    styled-files3 / DATAFiles trio, ``core/data_loader.py:232-250``) for the
    GAN trainers: per domain, frame-1 and frame-2 images as uint8 plus the
    shared mask/flow, uploaded once; ``sample`` draws the 4-tuple
    (x_src, x2_src, x_ref, labels, mask, flow) fully on device in the
    [−1, 1] range the GAN nets expect."""

    def __init__(self, root: str, num_dom: int = 4,
                 limit: Optional[int] = None, seed: int = 0, device=None):
        import imageio.v2 as imageio

        sdir = os.path.join(root, "styled-files")
        tdir = os.path.join(root, "styled-files3")
        ddir = os.path.join(root, "DATAFiles")
        styles = sorted(os.listdir(sdir))[:num_dom]
        names = sorted(os.listdir(os.path.join(sdir, styles[0])))[:limit]
        dev = device or jax.devices()[0]

        per_dom1, per_dom2 = [], []
        for sty in styles:
            f1s, f2s = [], []
            for n in names:
                stem = os.path.splitext(n)[0]
                f1s.append(imageio.imread(os.path.join(sdir, sty, n)))
                f2s.append(imageio.imread(
                    os.path.join(tdir, sty, stem + "_2.jpg")))
            per_dom1.append(np.stack(f1s))
            per_dom2.append(np.stack(f2s))
        masks, flows = [], []
        for n in names:
            stem = os.path.splitext(n)[0]
            d = np.load(os.path.join(ddir, stem + ".npy"))[0]
            masks.append(np.round(
                np.clip(d[:, :, 6:7], 0.0, 1.0)).astype(np.uint8))
            flows.append(d[:, :, 7:9].astype(np.float16))

        self.num_dom = len(styles)
        self.n = len(names)
        self.img1 = jax.device_put(np.stack(per_dom1), dev)  # (D, N, H, W, 3) u8
        self.img2 = jax.device_put(np.stack(per_dom2), dev)
        self.masks = jax.device_put(np.stack(masks), dev)    # (N, H, W, 1) u8
        self.flows = jax.device_put(np.stack(flows), dev)    # (N, H, W, 2) f16
        self._rng = np.random.RandomState(seed)
        self._sample_fn = jax.jit(DeviceStyledCache._gather)

    @staticmethod
    def _gather(img1, img2, tbl_masks, tbl_flows, idx, src_lbl, ref_lbl):
        def img(tbl, dom, i):
            x = tbl[dom, i].astype(jnp.float32) / 255.0
            return x * 2.0 - 1.0  # Normalize(0.5, 0.5)

        take = jax.vmap(img, in_axes=(None, 0, 0))
        return {
            "x_src": take(img1, src_lbl, idx),
            "x2_src": take(img2, src_lbl, idx),
            "x_ref": take(img1, ref_lbl, idx),
            "y_src": src_lbl,
            "y_ref": ref_lbl,
            "mask": jnp.take(tbl_masks, idx, 0).astype(jnp.float32),
            "flow": jnp.take(tbl_flows, idx, 0).astype(jnp.float32),
        }

    def _sample(self, idx, src_lbl, ref_lbl):
        return self._sample_fn(self.img1, self.img2, self.masks, self.flows,
                               idx, src_lbl, ref_lbl)

    def sample(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        """Domain-pair sampling statistics of DatasetFC2
        (data_loader.py:281-288): src/ref drawn over (0, k) pairs."""
        idx = self._rng.randint(0, self.n, size=(batch_size,))
        # DatasetFC2 expands each image into 1 + 3(D-1) entries — (0,0) once,
        # then (0,k), (k,0), (k,k) for every k>=1 (data_loader.py:281-288) —
        # and samples entries uniformly, so for D>2 the (0,0) kind has weight
        # 1/(3D-2), not 1/4. Draw an entry index and decode it.
        e = self._rng.randint(0, 3 * self.num_dom - 2, size=(batch_size,))
        k = (e - 1) // 3 + 1
        r = (e - 1) % 3
        src = np.where(e == 0, 0, np.where(r == 0, 0, k))
        ref = np.where(e == 0, 0, np.where(r == 1, 0, k))
        return self._sample(jnp.asarray(idx, jnp.int32),
                            jnp.asarray(src, jnp.int32),
                            jnp.asarray(ref, jnp.int32))

    def sample_multidomain(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        """Uniform multi-domain batch for StarGAN v1 (the reference trains
        it on styled-files as c_dim=4 plain domains, StarGAN/main.py:30):
        x drawn uniformly over domains with its true label, target label
        uniform."""
        idx = self._rng.randint(0, self.n, size=(batch_size,))
        src = self._rng.randint(0, self.num_dom, size=(batch_size,))
        trg = self._rng.randint(0, self.num_dom, size=(batch_size,))
        return self._sample(jnp.asarray(idx, jnp.int32),
                            jnp.asarray(src, jnp.int32),
                            jnp.asarray(trg, jnp.int32))

    def sample_cyclegan(self, batch_size: int, sid: int = 1
                        ) -> Dict[str, jnp.ndarray]:
        """Unpaired CycleGAN batch (one model per style,
        CycleGAN/fc2_dataset.py:19-101): A side = content (style0) pairs
        with their GT mask/flow, B side = style ``sid`` drawn at an
        INDEPENDENT index."""
        ia = self._rng.randint(0, self.n, size=(batch_size,))
        ib = self._rng.randint(0, self.n, size=(batch_size,))
        zeros = np.zeros(batch_size, np.int32)
        sids = np.full(batch_size, sid, np.int32)
        a = self._sample(jnp.asarray(ia, jnp.int32), jnp.asarray(zeros),
                         jnp.asarray(zeros))
        b = self._sample(jnp.asarray(ib, jnp.int32), jnp.asarray(sids),
                         jnp.asarray(sids))
        return {
            "real_A": a["x_src"], "real_A2": a["x2_src"],
            "real_B": b["x_src"], "real_B2": b["x2_src"],
            "mask": a["mask"], "flow": a["flow"],
        }
