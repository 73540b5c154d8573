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


def auto_detect_pod(environ=None) -> tuple[bool, str]:
    """Decide whether this process is part of a multi-host TPU pod and
    should call ``jax.distributed.initialize()`` with no arguments.

    Returns ``(should_init, reason)``.  Pure env inspection — unit-testable
    (tests/test_distributed.py covers the matrix).

    A real multi-host TPU-VM launch leaves ``JAX_PLATFORMS`` unset, so the
    pod signal is the TPU env itself: ``TPU_WORKER_HOSTNAMES`` is injected
    on every multi-worker pod VM, ``MEGASCALE_COORDINATOR_ADDRESS`` on
    multislice.  ``JAX_PLATFORMS`` set to a non-TPU backend (tests, CPU
    debugging) explicitly opts out, as does ``TPU_SKIP_MDS_QUERY``.
    """
    env = os.environ if environ is None else environ
    pod_signal = (env.get("TPU_WORKER_HOSTNAMES")
                  or env.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not pod_signal:
        return False, "no multi-host TPU env (single-host run)"
    platforms = env.get("JAX_PLATFORMS", "")
    if platforms and not any(p.strip().startswith("tpu")
                             for p in platforms.split(",")):
        return False, (f"multi-host TPU env present but "
                       f"JAX_PLATFORMS={platforms!r} excludes tpu")
    if env.get("TPU_SKIP_MDS_QUERY") is not None:
        return False, "TPU_SKIP_MDS_QUERY set — metadata query disabled"
    return True, "multi-host TPU env detected (pod auto-detect)"


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

    # explicit coordinator → explicit cluster; otherwise TPU pods are
    # auto-detected (the decision and its rationale are always printed so
    # a multi-host launch can never *silently* run single-host).
    explicit = coordinator_address is not None
    if not explicit:
        auto, reason = auto_detect_pod()
        print(f"[tpu_unet.distributed] {reason}"
              + ("" if auto else " — running single-process"), flush=True)
        if not auto:
            return False
    else:
        print(f"[tpu_unet.distributed] initializing with explicit "
              f"coordinator {coordinator_address}", flush=True)

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
