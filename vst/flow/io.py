"""Flow file I/O — parity with ``utils/flowlib.py``.

``.flo`` (Middlebury) format: 4-byte magic float 202021.25 ("PIEH"), int32
width, int32 height, then H·W·2 float32 (u, v) interleaved
(``flowlib.py:33-55``).
"""

from __future__ import annotations

import numpy as np

_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Returns (H, W, 2) float32 flow."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != np.float32(_MAGIC):
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    """flow: (H, W, 2) float32."""
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.asarray([_MAGIC], np.float32).tofile(f)
        np.asarray([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flow(path: str) -> np.ndarray:
    """Multi-format dispatch like ``flowlib.read`` (:13-21): .flo native;
    .png (KITTI 16-bit) and .pfm left to the caller's tooling."""
    if path.endswith(".flo"):
        return read_flo(path)
    raise ValueError(f"unsupported flow format: {path}")
