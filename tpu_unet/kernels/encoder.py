"""Fused VGG encoder block — 2-3 stacked 3×3 convs (+ReLU) and the
trailing 2×2 maxpool in one Pallas pass per row-tile.

Plays cuDNN's role for the encoder stages the fused stem
(kernels/stem.py) doesn't cover (reference: nets/vgg.py:26-31 —
features[4:9] / [9:16] / [16:23] / [23:-1]).  Round-3 HLO profiling of
the 512px bench forward (batch 8) motivated it: XLA runs conv2_1 at
43% MXU (K=64 half-fills the contraction), conv2_2 at 71%, and inserts
a {3,0,2,1}→{3,2,1,0} relayout copy after every conv whose consumer is
a Pallas decoder kernel (~1.3 ms/step total); the stage-2 pool is
another separate HBM pass.

Design (per grid step = one batch element × T output rows):

- the conv chain runs entirely in VMEM: conv_i consumes conv_{i-1}'s
  rows with a shrinking halo (window = T + 2·n_convs input rows), so
  intermediate activations never touch HBM
- each 3×3 conv uses the decoder's proven kxsum pattern: per kx, 3
  ky-shifted MXU matmuls (f32 accumulation), then static column shifts
  of the f32 partials (kernels/decoder_fuse.py conv3)
- convs with Cin < 128 (conv2_1's K=64) instead build a kx-im2col
  buffer — 3 column-shifted views concatenated to 3·Cin lanes (zero
  padded to a 128 multiple) — and contract K=3·Cin per ky: 3 matmuls
  at 75% K-occupancy instead of 9 at 50%
- the 2×2 maxpool folds row pairs with a free outer-dim split and
  column pairs with a sublane-split reshape (verified exact on Mosaic),
  so pooled output leaves the same VMEM pass
- input arrives host-padded by (4, T-4) rows (same block+halo scheme as
  the decoder: blocks i and i+1 cover the T+2n window); out-of-image
  rows are zeroed in-kernel via a precomputed validity column
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import _mm, _shift_cols_zero

_LEAD = 4  # host pad rows above the image (≥ max halo of 3)


def _inshift() -> bool:
    """INPUT-side kx shifts (A/B: TPU_UNET_ENC_INSHIFT, default on):
    two bf16 copies of the input window shared across ky instead of two
    f32 copies of the (R, W, F) partials — at C == F ~45% less VPU copy
    traffic, one f32 accumulator live instead of two."""
    import os
    return os.environ.get("TPU_UNET_ENC_INSHIFT",
                          "1").lower() not in ("0", "false", "off")


def _conv3_kxsum(src, R, k, bias, dt):
    """(R+2, W, C) → (R, W, F) = relu(3×3 conv + bias); k (3, 3, C, F)."""
    if _inshift():
        sm1 = _shift_cols_zero(src, -1)
        sp1 = _shift_cols_zero(src, 1)
        acc = _mm(sm1[0:R], k[0, 0])
        acc += _mm(src[0:R], k[0, 1])
        acc += _mm(sp1[0:R], k[0, 2])
        for ky in (1, 2):
            acc += _mm(sm1[ky:ky + R], k[ky, 0])
            acc += _mm(src[ky:ky + R], k[ky, 1])
            acc += _mm(sp1[ky:ky + R], k[ky, 2])
        return jax.nn.relu(acc.astype(dt) + bias[...][None, :])

    def kxsum(kx):
        t = _mm(src[0:R], k[0, kx])
        for ky in (1, 2):
            t += _mm(src[ky:ky + R], k[ky, kx])
        return t

    acc = _shift_cols_zero(kxsum(0), -1)
    acc += kxsum(1)
    acc += _shift_cols_zero(kxsum(2), 1)
    return jax.nn.relu(acc.astype(dt) + bias[...][None, :])


def _conv3_im2col(src, R, kmat, bias, dt, C, Cpad, vmask):
    """Same conv for Cin < 128: kx folded into the contraction.

    src (R+2, W, C); kmat (3, Cpad, F) host-packed with rows
    [kx0 | kx1 | kx2 | 0-fill]; output (R, W, F).  ``vmask``
    ((R+2), Cpad) zeroes out-of-image rows on the 128-multiple im2col
    buffer — Mosaic rejects sublane broadcasts onto sub-128-lane arrays,
    so the raw 64-lane input can't be masked directly (same workaround
    as the stem's vcc, kernels/stem.py)."""
    W = src.shape[1]
    views = [_shift_cols_zero(src, -1), src, _shift_cols_zero(src, 1)]
    if Cpad > 3 * C:
        views.append(jnp.zeros((src.shape[0], W, Cpad - 3 * C), src.dtype))
    cc = jnp.concatenate(views, axis=-1)            # (R+2, W, Cpad)
    # where-select, not multiply: prepadded producer buffers have
    # UNINITIALIZED lead/tail blocks (NaN * 0 == NaN)
    cc = jnp.where(vmask[:, None, :] != 0.0, cc, jnp.zeros_like(cc))
    acc = _mm(cc[0:R], kmat[0])
    for ky in (1, 2):
        acc += _mm(cc[ky:ky + R], kmat[ky])
    return jax.nn.relu(acc.astype(dt) + bias[...][None, :])


def _pack_im2col(k):
    """(3, 3, C, F) → (3, Cpad, F): per-ky [kx0; kx1; kx2] + zero fill."""
    C, F = k.shape[2], k.shape[3]
    Cpad = -(-3 * C // 128) * 128
    rows = [jnp.concatenate([k[ky, 0], k[ky, 1], k[ky, 2],
                             jnp.zeros((Cpad - 3 * C, F), k.dtype)], axis=0)
            for ky in range(3)]
    return jnp.stack(rows)


def _make_block_kernel(T, W, chans, dt, pool, im2col_first, n_in,
                       in_off):
    n = len(chans) - 1          # number of convs

    def kernel(valid, *refs):
        # refs: interior masks (n-1), per-conv weight args..., input
        # blocks (n_in), out_ref[, pool_ref].
        # Validity columns are indexed by q with x-row = q - n; the
        # interior masks arrive PRE-SHIFTED by (ci+1) rows so every
        # in-kernel slice starts at the 8-aligned offset r0 (Mosaic
        # rejects dynamic sublane slices at unaligned offsets).
        vf = refs[:n - 1]
        wrefs = refs[n - 1:n - 1 + 2 * n]
        x_refs = refs[n - 1 + 2 * n:n - 1 + 2 * n + n_in]
        out_ref = refs[n - 1 + 2 * n + n_in]
        i = pl.program_id(1)
        r0 = i * T

        win = T + 2 * n
        xs = jnp.concatenate([r[0] for r in x_refs], axis=0)[
            in_off:in_off + win]
        if not im2col_first:
            # C >= 128: mask the raw window rows (where-select — a
            # prepadded producer's lead/tail blocks are uninitialized)
            v = valid[pl.ds(r0, win)][:, None, :]
            xs = jnp.where(v != 0.0, xs, jnp.zeros_like(xs))
        a = xs
        for ci in range(n):
            kref, bref = wrefs[2 * ci], wrefs[2 * ci + 1]
            R = T + 2 * (n - ci - 1)
            if ci == 0 and im2col_first:
                a = _conv3_im2col(a, R, kref[...], bref, dt,
                                  chans[0], kref.shape[1],
                                  valid[pl.ds(r0, win)])
            else:
                a = _conv3_kxsum(a, R, kref[...], bref, dt)
            if ci < n - 1:
                # out-of-image rows must be exactly zero for the next
                # conv's halo (relu(bias) would leak otherwise)
                f = chans[ci + 1]
                a = a * vf[ci][pl.ds(r0, R)][:, None, :f]
        out_ref[0] = a
        if pool:
            m = jnp.max(a.reshape(T // 2, 2, W, chans[-1]), axis=1)
            mp = jnp.max(m.reshape(T // 2, W // 2, 2, chans[-1]), axis=2)
            refs[n - 1 + 2 * n + n_in + 1][0] = mp.astype(dt)

    return kernel


def fused_vgg_block_impl(x, ks, bs, pool: bool = True, block_rows=None,
                         prepad_in: bool = False,
                         prepad_skip: bool = False,
                         prepad_pool: bool = False):
    """(B, H, W, C) → (skip (B, H, W, F)[, pooled (B, H/2, W/2, F)]).

    ``ks``/``bs``: the block's conv kernels (3, 3, Ci, Fi) and biases, in
    order.  Returns None for shapes the kernel can't tile.

    P8 chaining (kills the host pad copies between kernels): with
    ``prepad_in`` the input is an (B, H+16, W, C) buffer whose valid rows
    are [8, 8+H) and whose first/last two 8-row blocks may be
    UNINITIALIZED (a producer wrote it block-down); with ``prepad_skip``
    / ``prepad_pool`` the outputs are written the same way for the next
    consumer.  Prepadded I/O forces T=8 (the 8-row lead must be a whole
    number of blocks on every spec).
    """
    if prepad_in:
        B, Hp, W, C = x.shape
        H = Hp - 16
    else:
        B, H, W, C = x.shape
    n = len(ks)
    dt = x.dtype
    chans = [C] + [int(k.shape[-1]) for k in ks]
    F = chans[-1]
    if n not in (2, 3) or any(k.shape[:2] != (3, 3) for k in ks):
        return None
    # lanes (channels) must tile; W is the sublane dim and is free except
    # that pooling halves it
    if F % 128 or any(c % 128 and c >= 128 for c in chans) \
            or (pool and W % 2):
        return None

    # row tile: VMEM cap gates auto-selection only (an explicit
    # block_rows is trusted — tests drive small shapes in f32).
    # Prepadded I/O requires T=8 (lead 8 = one whole block).
    itemsize = 2 if dt == jnp.bfloat16 else 4
    any_prepad = prepad_in or prepad_skip or prepad_pool
    tiles = (block_rows,) if block_rows else ((8,) if any_prepad
                                              else (16, 8))
    for T in tiles:
        if T and H % T == 0 and T >= 2 * n and not (pool and T % 2):
            if any_prepad and T != 8:
                continue
            c_total = sum(chans) + 2 * chans[1]
            if block_rows or (T + 2 * n) * W * c_total * itemsize <= (8 << 20):
                break
    else:
        return None

    im2col_first = C < 128
    interpret = jax.default_backend() == "cpu"

    # validity columns, indexed so that x-row = q - n (see kernel): one
    # replicated to the input lane count, one to the widest conv output
    # (interior masks lane-slice it to each conv's F)
    rows = np.arange(H + T + 2 * n) - n
    vcol = ((rows >= 0) & (rows < H)).astype(np.float32).reshape(-1, 1)
    # im2col path masks the 128-multiple im2col buffer, not the raw input
    mask_lanes = -(-3 * C // 128) * 128 if C < 128 else C
    valid = np.repeat(vcol, mask_lanes, axis=1)
    fmax = max(chans[1:])
    # interior masks pre-shifted by ci+1 so kernel slices start at r0
    valid_fs = [np.repeat(vcol[ci + 1:ci + 1 + H + T], fmax, axis=1)
                for ci in range(n - 1)]

    if prepad_in:
        xp = x            # already carries an 8-row lead + 8-row tail
        n_in, in_off = 3, 8 - n
    else:
        xp = jnp.pad(x, ((0, 0), (_LEAD, T - _LEAD), (0, 0), (0, 0)))
        n_in, in_off = 2, _LEAD - n

    weight_args = []
    for ci, (k, b) in enumerate(zip(ks, bs)):
        if ci == 0 and im2col_first:
            weight_args.append(_pack_im2col(k.astype(dt)))
        else:
            weight_args.append(k.astype(dt))
        weight_args.append(b.astype(dt))

    grid = (B, H // T)
    if prepad_in:
        data_specs = [
            pl.BlockSpec((1, T, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, C), lambda b, i: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, C), lambda b, i: (b, i + 2, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        data_specs = [
            pl.BlockSpec((1, T, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, C), lambda b, i: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if prepad_skip:
        out_shape = [jax.ShapeDtypeStruct((B, H + 16, W, F), dt)]
        out_specs = [pl.BlockSpec((1, T, W, F),
                                  lambda b, i: (b, i + 1, 0, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shape = [jax.ShapeDtypeStruct((B, H, W, F), dt)]
        out_specs = [pl.BlockSpec((1, T, W, F), lambda b, i: (b, i, 0, 0),
                                  memory_space=pltpu.VMEM)]
    if pool:
        if prepad_pool:
            out_shape.append(
                jax.ShapeDtypeStruct((B, H // 2 + 16, W // 2, F), dt))
            out_specs.append(pl.BlockSpec(
                (1, T // 2, W // 2, F), lambda b, i: (b, i + 2, 0, 0),
                memory_space=pltpu.VMEM))
        else:
            out_shape.append(
                jax.ShapeDtypeStruct((B, H // 2, W // 2, F), dt))
            out_specs.append(pl.BlockSpec(
                (1, T // 2, W // 2, F), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM))

    kernel = _make_block_kernel(T, W, chans, dt, pool, im2col_first,
                                n_in, in_off)
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (n + 2 * n)
        + data_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(valid).astype(dt),
      *[jnp.asarray(v).astype(dt) for v in valid_fs],
      *weight_args, *([xp] * n_in))
    return out if pool else (out[0], None)


def reference_vgg_block(x, ks, bs, pool: bool = True):
    """XLA reference composition (and the exactness oracle)."""
    def conv(v, k, b):
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn) + b.astype(v.dtype)

    y = x
    for k, b in zip(ks, bs):
        y = jax.nn.relu(conv(y, k, b))
    if not pool:
        return y, None
    pooled = jax.lax.reduce_window(
        y, jnp.array(-jnp.inf, y.dtype), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return y, pooled
