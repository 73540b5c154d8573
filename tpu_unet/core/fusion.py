"""Runtime switch for the fused Pallas decoder stage.

Default: on when running on a real TPU backend, off on CPU (tests compare
against torch through the XLA composition; the Pallas kernel has its own
exactness tests in interpret mode).  Override with
``TPU_UNET_FUSED_DECODER=0/1`` or :func:`set_fused_decoder`.
"""
from __future__ import annotations

import os

import jax

_OVERRIDE: bool | None = None


def set_fused_decoder(on: bool | None) -> None:
    """Force the fused decoder on/off (``None`` restores auto)."""
    global _OVERRIDE
    _OVERRIDE = on


def use_fused_decoder() -> bool:
    if _OVERRIDE is not None:
        return _OVERRIDE
    env = os.environ.get("TPU_UNET_FUSED_DECODER")
    if env is not None:
        return env.lower() not in ("0", "false", "off")
    return jax.default_backend() in ("tpu", "axon")
