"""Host→device input pipeline.

The reference moves tensors to the GPU inside ``__getitem__``
(``methods/learning-based/datasets.py:75-77``), forcing num_workers=0 — the
single biggest throughput sin in the original (SURVEY.md §7 hard part #5).
Here the host thread prepares numpy batches ahead of time and
``jax.device_put``s them with the batch axis sharded over the mesh, double
buffered so the device never waits on input.
"""

from __future__ import annotations

import collections
import threading
import queue as queue_mod
from typing import Callable, Iterator, Optional

import jax

from vst.parallel.mesh import batch_sharding


def prefetch_to_mesh(
    batch_iter: Iterator,
    mesh,
    depth: int = 2,
):
    """Wrap a host batch iterator with background prefetch + sharded
    device_put. Yields device-resident pytrees with the leading axis sharded
    over the mesh's data axis."""
    sharding = batch_sharding(mesh)
    q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for batch in batch_iter:
                dev = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), batch
                )
                q.put(dev)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _END:
            break
        yield item


class NpyDirDataset:
    """FC2/HW2/CO2-style directory of per-sample ``.npy`` files.

    FC2 packing (``datasets.py:52-54``): (1, H, W, 9) channelwise =
    img1(3) ⊕ img2(3) ⊕ mask(1) ⊕ backward flow(2). Emits dict batches in the
    vst layout: imgs (B, 2, H, W, 3), masks (B, 1, H, W, 1),
    flows (B, 1, H, W, 2).
    """

    def __init__(self, data_dir: str, batch_size: int, seed: int = 0,
                 expected_size: Optional[int] = None):
        import os
        import numpy as np

        self.data_dir = data_dir
        self.files = sorted(os.listdir(data_dir))
        if expected_size is not None:
            assert len(self.files) == expected_size, (
                f"dataset size {len(self.files)} != expected {expected_size}"
            )
        self.batch_size = batch_size
        self.length = (len(self.files) // batch_size) * batch_size
        self._rng = __import__("numpy").random.RandomState(seed)

    def __len__(self):
        return self.length // self.batch_size

    def epoch(self, shuffle: bool = True):
        import os
        import numpy as np

        order = np.arange(self.length)
        if shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size

        # native threaded reader (vst/native/loader.cc) when files share a
        # shape — ~1.4× over sequential np.load at FC2 sizes, exact fallback
        sample = np.load(os.path.join(self.data_dir, self.files[0]),
                         mmap_mode="r")
        shape = sample.shape
        del sample
        from vst.data.native_loader import load_npy_batch

        for i in range(0, self.length, bs):
            paths = [os.path.join(self.data_dir, self.files[j])
                     for j in order[i: i + bs]]
            data = load_npy_batch(paths, shape)  # (bs, 1, H, W, 9)
            x = data[:, 0]
            yield {
                "imgs": np.stack([x[..., 0:3], x[..., 3:6]], axis=1),
                "masks": x[..., 6:7][:, None],
                "flows": x[..., 7:9][:, None],
            }


class TupleNpyDataset:
    """HW2/CO2-style directory of pickled-tuple ``.npy`` files.

    Format parity with ``methods/learning-based/datasets.py:100-137``
    (Hollywood2Dataset / COCODataset): each file holds a pickled
    (frames, flows, masks) tuple of per-frame arrays, concatenated
    channelwise by the loader. Emits the same dict layout as NpyDirDataset:
    imgs (B, n, H, W, 3), masks (B, n−1, H, W, 1), flows (B, n−1, H, W, 2).
    """

    def __init__(self, data_dir: str, batch_size: int, seed: int = 0,
                 expected_size: Optional[int] = None):
        import os

        self.data_dir = data_dir
        self.files = sorted(os.listdir(data_dir))
        if expected_size is not None:
            assert len(self.files) == expected_size, (
                f"dataset size {len(self.files)} != expected {expected_size}"
            )
        self.batch_size = batch_size
        self.length = (len(self.files) // batch_size) * batch_size
        import numpy as np

        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return self.length // self.batch_size

    def epoch(self, shuffle: bool = True):
        import os
        import numpy as np

        order = np.arange(self.length)
        if shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, self.length, bs):
            imgs, masks, flows = [], [], []
            for j in order[i:i + bs]:
                frames, fls, mks = np.load(
                    os.path.join(self.data_dir, self.files[j]),
                    allow_pickle=True,
                )
                imgs.append(np.stack(list(frames)))
                flows.append(np.stack(list(fls)))
                m = np.stack(list(mks))
                if m.ndim == 3:
                    m = m[..., None]
                masks.append(m)
            yield {
                "imgs": np.stack(imgs).astype(np.float32),
                "masks": np.stack(masks).astype(np.float32),
                "flows": np.stack(flows).astype(np.float32),
            }


def pack_tuple_npy(out_dir: str, n_samples: int, hw=(64, 64),
                   n_frames: int = 3, seed: int = 0):
    """Materialize HW2/CO2-format pickled tuples from the affine-motion
    synthesizer (what coco-generation.py:345-347 writes)."""
    import os
    import numpy as np

    from vst.data.synthetic import synthetic_batch

    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_samples):
        b = synthetic_batch(1, hw=hw, n_frames=n_frames, seed=seed + i)
        frames = [b["imgs"][0, t] for t in range(n_frames)]
        flows = [b["flows"][0, t] for t in range(n_frames - 1)]
        masks = [b["masks"][0, t] for t in range(n_frames - 1)]
        np.save(os.path.join(out_dir, f"{i:07d}.npy"),
                np.asarray([frames, flows, masks], dtype=object),
                allow_pickle=True)


class ChairsSDHomDataset:
    """ChairsSDHom-format directory of per-sample ``.npy`` files.

    Parity with ``methods/learning-based/datasets.py:239-269``: each file is
    a (384, 512, 9) array packed channelwise as img1(3) ⊕ img2(3) ⊕ flow(2)
    ⊕ mask(1) — note flow BEFORE mask, the opposite of the FC2 packing —
    and is center-cropped from the native 384×512 down to ``crop_hw``
    (256×256 in the reference). Emits the standard vst dict layout:
    imgs (B, 2, h, w, 3), masks (B, 1, h, w, 1), flows (B, 1, h, w, 2).
    """

    def __init__(self, data_dir: str, batch_size: int, seed: int = 0,
                 crop_hw=(256, 256), expected_size: Optional[int] = None):
        import os
        import numpy as np

        self.data_dir = data_dir
        self.files = sorted(os.listdir(data_dir))
        if expected_size is not None:
            assert len(self.files) == expected_size, (
                f"dataset size {len(self.files)} != expected {expected_size}"
            )
        self.batch_size = batch_size
        self.crop_hw = tuple(crop_hw)
        self.length = (len(self.files) // batch_size) * batch_size
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return self.length // self.batch_size

    def _crop(self, x):
        h, w = self.crop_hw[0] // 2, self.crop_hw[1] // 2
        ih, iw = x.shape[0] // 2, x.shape[1] // 2
        return x[ih - h: ih + h, iw - w: iw + w]

    def epoch(self, shuffle: bool = True):
        import os
        import numpy as np

        order = np.arange(self.length)
        if shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, self.length, bs):
            rows = []
            for j in order[i: i + bs]:
                x = np.load(os.path.join(self.data_dir, self.files[j]),
                            allow_pickle=True)
                rows.append(self._crop(np.asarray(x, dtype=np.float32)))
            x = np.stack(rows)  # (bs, h, w, 9)
            yield {
                "imgs": np.stack([x[..., 0:3], x[..., 3:6]], axis=1),
                "masks": x[..., 8:9][:, None],
                "flows": x[..., 6:8][:, None],
            }


class CombinedDataset:
    """Concatenation of several epoch-iterable datasets.

    Parity with ``methods/learning-based/datasets.py:217-237``
    (``CombinedDataset`` = FC2 + CO2 + HW2 back to back): iterates each
    member's epoch in order; len is the sum of member batch counts. Members
    just need ``__len__`` and ``epoch(shuffle)`` with a shared batch dict
    layout (NpyDirDataset / TupleNpyDataset / ChairsSDHomDataset all
    qualify — the reference indexes across member boundaries, which at
    batch granularity is exactly sequential iteration).
    """

    def __init__(self, *datasets):
        assert datasets, "CombinedDataset needs at least one member"
        self.datasets = datasets

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def epoch(self, shuffle: bool = True):
        for d in self.datasets:
            yield from d.epoch(shuffle)
