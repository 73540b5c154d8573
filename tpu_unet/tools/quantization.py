"""Post-training int8 weight quantization — the quantization.py counterpart.

Parity target: quantization.py:1-60 (torch fbgemm dynamic PTQ of the UNet).
TPU-native version: symmetric per-output-channel int8 quantization of conv
kernels; at inference the kernels are dequantized on the fly (int8 weights
live in HBM at 1/4 the footprint, dequant fuses into the conv's producer
chain under XLA).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_params(params: dict) -> Tuple[dict, dict]:
    """Split params into (int8 quantized tree, f32 passthrough tree).

    Conv kernels (ndim 4) → int8 values + per-out-channel f32 scales;
    everything else (biases, BN, dense) stays f32.
    """
    def visit(tree):
        q, rest = {}, {}
        for k, v in tree.items():
            if isinstance(v, dict):
                qs, rs = visit(v)
                if qs:
                    q[k] = qs
                if rs:
                    rest[k] = rs
            elif hasattr(v, "ndim") and v.ndim == 4:
                arr = np.asarray(v, np.float32)
                scale = np.abs(arr).max(axis=(0, 1, 2), keepdims=True) / 127.0
                scale = np.maximum(scale, 1e-12)
                vals = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
                q[k] = {"values": vals, "scale": scale.astype(np.float32)}
            else:
                rest[k] = v
        return q, rest

    return visit(params)


def dequantize_params(quantized: dict, rest: dict) -> dict:
    """Rebuild an f32 param tree from the split representation."""
    def visit(q, r):
        out = dict(r) if r else {}
        for k, v in (q or {}).items():
            if isinstance(v, dict) and set(v) == {"values", "scale"}:
                out[k] = v["values"].astype(np.float32) * v["scale"]
            else:
                out[k] = visit(v, (r or {}).get(k))
        return out

    return visit(quantized, rest)


def quantize_variables(variables: dict) -> dict:
    """Full variables → {'quantized', 'rest', 'batch_stats'} bundle."""
    q, rest = quantize_params(variables["params"])
    return {"quantized": q, "rest": rest,
            "batch_stats": variables.get("batch_stats", {})}


def quantized_apply(model, bundle: dict, x, train: bool = False):
    """Run the model from a quantized bundle (dequant on the fly)."""
    params = dequantize_params(bundle["quantized"], bundle["rest"])
    variables = {"params": params}
    if bundle.get("batch_stats"):
        variables["batch_stats"] = bundle["batch_stats"]
    return model.apply(variables, x, train)


def quantization_report(variables: dict) -> dict:
    """Size accounting like the reference's before/after printout."""
    f32_bytes = sum(np.asarray(x).nbytes
                    for x in jax.tree_util.tree_leaves(variables["params"]))
    bundle = quantize_variables(variables)
    q_bytes = sum(np.asarray(x).nbytes
                  for x in jax.tree_util.tree_leaves(bundle["quantized"]))
    q_bytes += sum(np.asarray(x).nbytes
                   for x in jax.tree_util.tree_leaves(bundle["rest"]))
    return {"f32_bytes": f32_bytes, "int8_bytes": q_bytes,
            "ratio": q_bytes / max(f32_bytes, 1)}
