"""Device mesh + sharding for data-parallel training/eval over ICI.

The reference is single-process single-GPU (SURVEY.md §2.7: DataParallel is
wrapped then immediately unwrapped; every SLURM script pins 1 GPU). The
TPU-native scaling story is: one ``jax.sharding.Mesh`` whose primary axis is
``data`` (batch / frame / video sharding over ICI), with a secondary
``model`` axis reserved for future tensor sharding (unused by default —
these models are ≤50M params). Gradients reduce automatically via GSPMD when
the loss mean spans the sharded batch axis inside ``jax.jit``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh (params, opt state)."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
