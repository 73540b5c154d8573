"""Multi-host initialization test (VERDICT r1 Missing #3).

Spawns two OS processes, each contributing 4 virtual CPU devices to an
8-device cluster via jax.distributed — the local-coordinator analogue of
the reference's torchrun + NCCL setup (train.py:254-266). The worker
(tests/_dist_worker.py) asserts device topology, runs the Loader's
per-host interleave, assembles a global batch through shard_batch's
make_array_from_process_local_data branch, and takes one SPMD train step.
"""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_worker.py"),
             coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK process={i}" in out, out
    # both processes must have computed the identical global loss
    losses = {out.strip().splitlines()[-1].split("loss=")[1] for out in outs}
    assert len(losses) == 1, losses


def test_initialize_declines_single_process(monkeypatch):
    """Without a coordinator/env, initialize() is a harmless no-op."""
    from tpu_unet.core import distributed

    for var in ("TPU_UNET_COORDINATOR", "TPU_UNET_NUM_PROCESSES",
                "TPU_UNET_PROCESS_ID", "JAX_PLATFORMS"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(distributed, "_initialized", False)
    assert distributed.initialize() is False
    assert distributed.is_main() is True
