"""Worker process for the two-process multi-host CPU test.

Run as:  python tests/_dist_worker.py <coordinator> <num_procs> <proc_id>

Exercises the real multi-host code paths without a cluster:
jax.distributed.initialize (via core.distributed.initialize), the Loader's
per-host interleave, shard_batch's make_array_from_process_local_data
branch, and a full SPMD train step whose gradients all-reduce across the
two processes.
"""
import os
import sys

coordinator, num_procs, proc_id = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

# each process provides 4 virtual CPU devices → an 8-device global mesh
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

from tpu_unet.core.distributed import barrier, initialize, is_main  # noqa: E402

assert initialize(coordinator, num_procs, proc_id), "initialize() declined"

import time  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

_T0 = time.time()


def _mark(label):
    print(f"[{time.time() - _T0:7.1f}s] {label}", flush=True)


_mark("distributed initialized")

assert jax.process_count() == num_procs, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 4 * num_procs, jax.device_count()
assert is_main() == (proc_id == 0)

from tpu_unet.core.mesh import create_mesh, replicate, shard_batch  # noqa: E402
from tpu_unet.data.loader import Loader  # noqa: E402


class SyntheticDataset:
    """Deterministic (image, label) from the index alone."""

    size = 16

    def __len__(self):
        return self.size

    def __getitem__(self, i, epoch=None):
        img = np.full((16, 16, 3), i, np.uint8)
        lbl = np.full((16, 16), i % 4, np.int32)
        return img, lbl


GLOBAL_BATCH = 8
loader = Loader(SyntheticDataset(), GLOBAL_BATCH, shuffle=False,
                num_workers=2, process_index=jax.process_index(),
                process_count=jax.process_count())
batch = next(iter(loader))
assert batch["image"].shape == (GLOBAL_BATCH // num_procs, 16, 16, 3), \
    batch["image"].shape

mesh = create_mesh()
global_batch = shard_batch(batch, mesh)  # multi-process branch
assert global_batch["image"].shape == (GLOBAL_BATCH, 16, 16, 3)

# the assembled global array must contain every sample of the first global
# batch exactly once — i.e. the per-host interleave partitions, not drops
import jax.numpy as jnp  # noqa: E402


@jax.jit
def per_sample_ids(imgs):
    return jnp.sort(imgs[:, 0, 0, 0].astype(jnp.int32))


ids = np.asarray(per_sample_ids(global_batch["image"]))
np.testing.assert_array_equal(ids, np.arange(GLOBAL_BATCH))
_mark("global batch assembled + verified")

# full SPMD train step across both processes
from tpu_unet.models.registry import build_model, init_model  # noqa: E402
from tpu_unet.train.step import (StepConfig, create_train_state,  # noqa: E402
                                 make_optimizer, make_train_step)

model = build_model("ultralight", 4)
variables = init_model(model, (16, 16), train=True)
cfg = StepConfig(num_classes=4, cls_weights=(1.0, 1.0, 1.0, 1.0))
state = replicate(create_train_state(model, variables, make_optimizer("adam")),
                  mesh)
step = make_train_step(model, cfg)
_mark("train state ready")
state, metrics = step(state, global_batch, 1e-4, jax.random.PRNGKey(0))
_mark("train step done")
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
barrier("end-of-test")
print(f"WORKER_OK process={proc_id} loss={loss:.6f}")
