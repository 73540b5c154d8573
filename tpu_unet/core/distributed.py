"""Multi-host (multi-process) initialization.

TPU-native counterpart of the reference's
``dist.init_process_group(backend="nccl")`` + torchrun env plumbing
(reference: train.py:254-266; SURVEY.md §2.9): one call per host process,
made BEFORE any other JAX API, after which ``jax.devices()`` spans every
chip in the cluster and the usual GSPMD mesh path (core/mesh.py) scales
across hosts — XLA routes the gradient all-reduces over ICI within a slice
and DCN across slices, with nothing NCCL-like to manage.

On real TPU pods ``jax.distributed.initialize()`` auto-detects the cluster
from the TPU metadata server, so ``initialize()`` with no arguments is the
whole story there. For CPU/GPU clusters (and for the two-process CPU test,
tests/test_distributed.py) the coordinator address / process count /
process id must be given explicitly or via the environment:

    TPU_UNET_COORDINATOR   host:port of process 0
    TPU_UNET_NUM_PROCESSES total process count
    TPU_UNET_PROCESS_ID    this process's rank
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Initialize the JAX distributed runtime if this looks like (or is
    declared to be) a multi-process run. Returns True when the distributed
    runtime was (already) initialized, False for plain single-process runs.

    Safe to call unconditionally at entry-point start (cli train does);
    repeated calls are no-ops.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = (coordinator_address
                           or os.environ.get("TPU_UNET_COORDINATOR"))
    if num_processes is None and os.environ.get("TPU_UNET_NUM_PROCESSES"):
        num_processes = int(os.environ["TPU_UNET_NUM_PROCESSES"])
    if process_id is None and os.environ.get("TPU_UNET_PROCESS_ID"):
        process_id = int(os.environ["TPU_UNET_PROCESS_ID"])

    # explicit coordinator → explicit cluster; TPU pods are auto-detected
    # by jax.distributed.initialize itself (metadata server), which we only
    # attempt when the platform is TPU to avoid hanging single-host runs.
    explicit = coordinator_address is not None
    auto_tpu = (not explicit
                and os.environ.get("JAX_PLATFORMS", "").startswith("tpu")
                and os.environ.get("TPU_SKIP_MDS_QUERY") is None
                and (os.environ.get("TPU_WORKER_HOSTNAMES")
                     or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")))
    if not explicit and not auto_tpu:
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def is_main() -> bool:
    """Rank-0 guard (replaces the reference's ``local_rank == 0``)."""
    import jax

    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync point (replaces ``dist.barrier()``,
    reference: train.py:275,503)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)
