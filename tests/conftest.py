"""Test configuration: force CPU with 8 virtual devices so the mesh /
data-parallel paths are exercised without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize registers an `axon` TPU backend whenever
PALLAS_AXON_POOL_IPS is set; tests must run on local CPU, so we both clear
that and pin jax_platforms before any backend initializes.

TPU_UNET_TPU_TESTS=1 opts OUT of the CPU pin so the TPU-gated tests
(tests/test_tpu_identity.py) run on the real chip:

    TPU_UNET_TPU_TESTS=1 python -m pytest tests/test_tpu_identity.py -q

Everything else in the suite is CPU-designed; run it without the flag
(the gated tests then self-skip on backend != tpu/axon).
"""
import os

_ON_TPU = os.environ.get("TPU_UNET_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
