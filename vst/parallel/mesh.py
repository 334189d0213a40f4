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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host entry point (SURVEY §2.7 "TPU-native plan": jax.distributed
    + ICI collectives intra-pod, DCN for multi-host input).

    Single-process default is a no-op returning process count 1 — mesh
    creation works unchanged on one host. On a multi-host pod slice, call
    this once per process before any jax API, either with explicit
    coordinator/process arguments or with none at all (TPU pods
    auto-discover via the metadata server)::

        from vst.parallel import initialize_distributed, create_mesh
        initialize_distributed()              # all hosts, auto-discovery
        mesh = create_mesh()                  # global mesh over every chip

    After initialization ``jax.devices()`` spans all hosts, so
    ``create_mesh`` builds a global mesh and GSPMD inserts cross-host
    collectives over DCN/ICI automatically; per-host input pipelines should
    feed ``jax.make_array_from_process_local_data`` with the mesh's
    batch sharding.
    """
    explicit = coordinator_address is not None or num_processes is not None
    if not explicit and jax.process_count() == 1:
        # single-host (or already initialized): nothing to do
        return jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


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
