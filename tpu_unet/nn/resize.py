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


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool):
    """(out, in) row-stochastic interpolation matrix — 2 nonzeros per row."""
    i0, i1, w = _lerp_coeffs(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - w)
    np.add.at(m, (rows, i1), w)
    return m


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int):
    idx = _nearest_idx(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


# einsum specs per (ndim, spatial axis): contraction with the (out, in)
# resize matrix.  Interpolation-as-matmul is the TPU idiom: gathers along
# spatial axes of NHWC lower to catastrophically slow dynamic-gathers
# (measured 30-60 ms per decoder upsample at 512px vs ~0.5 ms as an MXU
# contraction), while a (O,H)x(H,·) matmul rides the systolic array.
_EINSUM = {
    (4, 1): "oh,bhwc->bowc",
    (4, 2): "ow,bhwc->bhoc",
    (3, 0): "oh,hwc->owc",
    (3, 1): "ow,hwc->hoc",
}


def _apply_matrix(x, m_np, axis: int):
    spec = _EINSUM[(x.ndim, axis)]
    m = jnp.asarray(m_np, x.dtype)
    # 2-nonzero rows: accumulation in the input dtype is exact enough even
    # for bf16 (and avoids f32 intermediates on the MXU fast path)
    return jnp.einsum(spec, m, x, preferred_element_type=x.dtype)


def _interp_axis(x, out_size: int, axis: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    # Note: a repeat+shift+select formulation of the exact ×2 case was
    # measured *slower* than the einsum contraction on v5e (159 vs 187
    # img/s e2e at 512px) — the matmul stays.
    return _apply_matrix(x, _interp_matrix(in_size, out_size, align_corners),
                         axis)


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
    # float dtypes interpolate natively (bf16 stays bf16 — MXU fast path);
    # integer inputs go through f32
    y = x if jnp.issubdtype(x.dtype, jnp.floating) else x.astype(jnp.float32)
    y = _interp_axis(y, oh, h_axis, align_corners)
    y = _interp_axis(y, ow, w_axis, align_corners)
    return y if y.dtype == orig_dtype else y.astype(orig_dtype)


@functools.lru_cache(maxsize=None)
def _nearest_idx(in_size: int, out_size: int):
    # torch F.interpolate(mode='nearest'): src = floor(dst * in / out)
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int32), 0, in_size - 1)


def resize_nearest(x, size):
    """Nearest-neighbor resize matching torch's default
    ``F.interpolate(mode='nearest')`` (used by OptimizedBalancedSeg,
    reference: nets/SegNets.py:658-670).  Implemented as a 0/1 selection
    matmul for the same gather-avoidance reason as the bilinear path."""
    oh, ow = int(size[0]), int(size[1])
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    orig_dtype = x.dtype
    y = x if jnp.issubdtype(x.dtype, jnp.floating) else x.astype(jnp.float32)
    if y.shape[h_axis] != oh:
        y = _apply_matrix(y, _nearest_matrix(y.shape[h_axis], oh), h_axis)
    if y.shape[w_axis] != ow:
        y = _apply_matrix(y, _nearest_matrix(y.shape[w_axis], ow), w_axis)
    return y if y.dtype == orig_dtype else y.astype(orig_dtype)


def upsample2x(x, align_corners: bool = True):
    """×2 bilinear upsample of NHWC ``x`` (decoder hot path)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)
