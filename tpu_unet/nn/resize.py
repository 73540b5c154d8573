"""Exact-semantics image resizing for NHWC tensors.

The reference stack mixes three resize conventions that all have to be
matched bit-for-bit for mask parity (SURVEY.md §7 "Hard parts"):

- ``nn.UpsamplingBilinear2d`` / ``F.interpolate(..., align_corners=True)``
  inside every model (reference: nets/unet.py:13, nets/UltraLightweightUnet.py:97):
  source position  ``pos = i * (in - 1) / (out - 1)``.
- ``cv2.resize(..., INTER_LINEAR)`` on probability maps (reference:
  unet.py:144): half-pixel convention ``pos = (i + 0.5) * in / out - 0.5``.
- PIL BICUBIC letterbox (reference: utils/utils.py:30) — see
  :mod:`tpu_unet.infer.letterbox`.

All paths here are separable 1-D interpolations implemented as two gathers
plus a lerp per axis — static index arrays, static shapes, fully fusable by
XLA.  Interpolation runs in float32.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lerp_coeffs(in_size: int, out_size: int, align_corners: bool):
    """Host-precomputed (i0, i1, w) for 1-D linear interpolation."""
    if out_size == in_size:
        i = np.arange(out_size)
        return i, i, np.zeros(out_size, np.float32)
    if align_corners:
        if out_size == 1:
            pos = np.zeros(1, np.float64)
        else:
            pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        pos = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
        pos = np.clip(pos, 0.0, in_size - 1)
    i0 = np.floor(pos).astype(np.int32)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (pos - i0).astype(np.float32)
    return i0, i1, w


def _interp_axis(x, out_size: int, axis: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w = _lerp_coeffs(in_size, out_size, align_corners)
    lo = jnp.take(x, jnp.asarray(i0), axis=axis)
    hi = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    wj = jnp.asarray(w).reshape(shape)
    return lo + (hi - lo) * wj


def resize_bilinear(x, size, align_corners: bool = True):
    """Bilinear-resize NHWC (or HWC) ``x`` to spatial ``size=(H, W)``.

    ``align_corners=True`` matches torch ``F.interpolate(mode='bilinear',
    align_corners=True)`` / ``nn.UpsamplingBilinear2d``; ``False`` matches
    the half-pixel convention of cv2 INTER_LINEAR.
    """
    oh, ow = int(size[0]), int(size[1])
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    y = _interp_axis(y, oh, h_axis, align_corners)
    y = _interp_axis(y, ow, w_axis, align_corners)
    return y.astype(orig_dtype)


@functools.lru_cache(maxsize=None)
def _nearest_idx(in_size: int, out_size: int):
    # torch F.interpolate(mode='nearest'): src = floor(dst * in / out)
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int32), 0, in_size - 1)


def resize_nearest(x, size):
    """Nearest-neighbor resize matching torch's default
    ``F.interpolate(mode='nearest')`` (used by OptimizedBalancedSeg,
    reference: nets/SegNets.py:658-670)."""
    oh, ow = int(size[0]), int(size[1])
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    if x.shape[h_axis] != oh:
        x = jnp.take(x, jnp.asarray(_nearest_idx(x.shape[h_axis], oh)), axis=h_axis)
    if x.shape[w_axis] != ow:
        x = jnp.take(x, jnp.asarray(_nearest_idx(x.shape[w_axis], ow)), axis=w_axis)
    return x


def upsample2x(x, align_corners: bool = True):
    """×2 bilinear upsample of NHWC ``x`` (decoder hot path)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)
