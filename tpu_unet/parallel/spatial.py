"""Spatial partitioning — sharding the image H axis across the mesh.

The reference has no tensor/sequence parallelism (it is a conv CNN;
SURVEY.md §2.9/§5.7); the idiomatic TPU analogue for images that exceed
one chip's HBM — or for scaling small-batch inference past data
parallelism — is partitioning the spatial H axis over a mesh axis.  Under
GSPMD this is purely declarative: annotate the NHWC batch as
P('data', 'space') and XLA inserts the halo exchanges 3×3 convolutions
need at partition boundaries (the conv-world cousin of ring attention's
neighbor exchange), riding ICI.

BatchNorm stats, losses and metrics remain global-batch exact: reductions
over N·H·W see the full array regardless of which axes are sharded.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def create_2d_mesh(data: int, space: int, devices=None) -> Mesh:
    """(data × space) mesh; ``data`` shards batch, ``space`` shards H."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(devices, (DATA_AXIS, SPACE_AXIS))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC: batch over 'data', H over 'space', W/C replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def label_sharding(mesh: Mesh) -> NamedSharding:
    """NHW int labels: same batch/H layout."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def shard_batch_spatial(batch: dict, mesh: Mesh):
    sh = spatial_batch_sharding(mesh)
    lh = label_sharding(mesh)
    out = {}
    for k, v in batch.items():
        s = sh if np.ndim(v) == 4 else lh
        out[k] = jax.device_put(np.asarray(v), s)
    return out
