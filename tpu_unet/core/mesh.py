"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL DDP / nn.DataParallel layer
(reference: train.py:254-266,346-348, unet.py:94-96).  One SPMD path serves
both: a 1-D ``data`` mesh over all chips, batches sharded on the ``data``
axis, gradients all-reduced by XLA over ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading (batch) dim sharded across the data axis, rest replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a pytree of host arrays on the mesh, batch-dim sharded.

    Single-process: a plain device_put suffices.  Multi-host: each process
    holds only its local slice, so the global array is assembled with
    ``make_array_from_process_local_data`` (the per-host data sharding that
    replaces DistributedSampler, reference: train.py:424-428).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_slice(global_batch: int, process_index=None, process_count=None):
    """Deterministic per-host shard of a global batch.

    Replaces the reference's DistributedSampler + ``batch_size // ngpus``
    split (train.py:424-428): host ``i`` owns rows
    ``[i * global_batch // n, (i + 1) * global_batch // n)``.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per = global_batch // process_count
    start = process_index * per
    return slice(start, start + per)
