"""Single checkpointing facility for the whole framework.

Replaces the reference's four ad-hoc mechanisms (torch.save state dicts,
CycleGAN save_networks, StarGAN iter tags, StarGAN-v2 CheckpointIO —
SURVEY.md §5 checkpoint/resume) with one orbax-backed step-tagged store of
arbitrary pytrees (params / EMA params / optimizer states).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Step-tagged pytree checkpoints: ``<dir>/<step>/<name>``.

    Usage::

        ckpt = Checkpointer("/path/to/run")
        ckpt.save(1000, nets=params, optim=opt_state, nets_ema=ema)
        state = ckpt.restore(1000, nets=params_like, optim=opt_state_like)
    """

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int, name: str) -> str:
        return os.path.join(self.directory, f"{step:06d}", name)

    def save(self, step: int, **trees: Any) -> None:
        for name, tree in trees.items():
            path = self._path(step, name)
            self._ckptr.save(path, jax.device_get(tree), force=True)

    def restore(self, step: int, **likes: Any) -> dict:
        out = {}
        for name, like in likes.items():
            path = self._path(step, name)
            if like is None:
                out[name] = self._ckptr.restore(path)
            else:
                out[name] = self._ckptr.restore(path, item=like)
        return out

    def latest_step(self) -> Optional[int]:
        steps = []
        for d in os.listdir(self.directory):
            if d.isdigit():
                steps.append(int(d))
        return max(steps) if steps else None
