"""Model export — the TPU-idiomatic counterpart of ONNX export.

The reference exports opset-12 ONNX + onnx-simplifier (unet.py:260-296).
The portable serialized-artifact story for a JAX model is jax.export:
StableHLO bytes that any PJRT runtime (TPU/GPU/CPU) can load and run
without Python model code.
"""
from __future__ import annotations

import numpy as np


def export_stablehlo(wrapper, path: str):
    """Serialize the wrapper's forward+softmax graph to a StableHLO
    artifact at ``path`` (input: (1, H, W, 3) float32)."""
    import jax
    from jax import export as jax_export

    h, w = wrapper.input_shape
    spec = jax.ShapeDtypeStruct((1, h, w, 3), np.float32)

    def fn(x):
        return wrapper._forward_probs(wrapper.variables, x)

    exported = jax_export.export(jax.jit(fn))(spec)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    print(f"StableHLO export saved to {path} ({len(data)} bytes)")
    return path


def load_stablehlo(path: str):
    """Deserialize and return a callable (the Unet_ONNX counterpart,
    reference: unet.py:346-554)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
