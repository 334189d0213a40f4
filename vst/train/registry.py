"""Method registry — parity with ``fs_tests.select_method``
(``methods/learning-based/fs_tests.py:51-72``): method name → trainer config
with the thesis's standard emphasis parameters, extended to cover every
family in the framework.
"""

from __future__ import annotations

from typing import Tuple

from vst.train.faststyle import FastStyleConfig

# fs_tests.py standard parameters (:54, :59, :62, :67, :70)
FASTSTYLE_METHODS = {
    "johnson": (1e0, 1e1, 1e-4),
    "dumoulin": (1e0, 1e1),
    "huang": (1e0, 1e1, 1e2, 1e-4),
    "reconet": (1e0, 1e1, 1e2, 1e2, 1e-4),
    "ruder": (1e0, 1e1, 1e2),
}

GAN_VARIANTS = ("cyclegan", "cyclegan_con", "mogan", "congan")
STARGAN_VARIANTS = ("stargan", "stargan2", "stargan2_advcon")

ALL_METHODS = tuple(FASTSTYLE_METHODS) + GAN_VARIANTS + STARGAN_VARIANTS + ("obst",)


def select_method(name: str, n_styles: int = 1, batch_size: int = 16,
                  n_frames: int = 2) -> FastStyleConfig:
    """Feed-forward family config lookup."""
    if name not in FASTSTYLE_METHODS:
        raise KeyError(f"{name} is not a feed-forward method; "
                       f"known: {sorted(FASTSTYLE_METHODS)}")
    return FastStyleConfig(
        method=name,
        emphasis=FASTSTYLE_METHODS[name],
        n_styles=n_styles,
        batch_size=batch_size,
        n_frames=n_frames,
    )


def run_id(method: str, sid, epochs: int, batch_size: int, lr: float,
           emphasis) -> str:
    """Reference run-id encoding (``fast_style_transfer.py:186-216``):
    ``sid{d}_ep{E}_bs{B}_lr{log10}`` + per-loss ``_{letter}{log10(w)}``.
    Kept as a compatibility shim — vst configs are explicit dataclasses, but
    checkpoints exported for reference-trained runs follow this naming."""
    import numpy as np

    letters = {
        "johnson": ["a", "b", "d"],
        "dumoulin": ["a", "b"],
        "huang": ["a", "b", "c", "d"],
        "reconet": ["a", "b", "cf", "co", "d"],
        "ruder": ["a", "b", "c"],
    }[method]
    if isinstance(sid, (list, tuple)):
        rid = "msid%d_ep%d_bs%d_lr%d" % (len(sid), epochs, batch_size,
                                         np.log10(lr))
    else:
        rid = "sid%d_ep%d_bs%d_lr%d" % (sid, epochs, batch_size, np.log10(lr))
    for letter, w in zip(letters, emphasis):
        rid += "_%s%d" % (letter, np.log10(w))
    return rid + "/"
