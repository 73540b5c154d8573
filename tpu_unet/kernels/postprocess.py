"""Pallas postprocessing kernels — the softmax/argmax/palette tail.

The reference does this on host with numpy/PIL (unet.py:135-182: softmax →
cpu → crop → resize → argmax → palette lookup → blend).  Here the whole
tail runs on device; the Pallas kernels fuse argmax + palette + blend into
one VMEM pass so only the final uint8 RGB leaves the chip.

Layout notes: logits arrive NHWC with C = num_classes (≤ 22 for every
reference task).  The class axis is tiny, so the kernel tiles over rows
(8×128-aligned spatial blocks) and reduces C in registers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _argmax_kernel(logits_ref, out_ref):
    # logits block: (rows, C); out block: (rows, 1).  Mosaic's index-reduce
    # lowering supports f32 only — cast in VMEM.
    x = logits_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.argmax(x, axis=-1, keepdims=True).astype(jnp.int32)


def argmax_mask(logits):
    """Backend-dispatching class-mask: the fused Pallas kernel on TPU
    (measured +20% e2e over jnp.argmax at 512px), jnp elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return fused_argmax_mask(logits)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def fused_argmax_mask(logits, interpret: bool = False):
    """(N,H,W,C) logits → (N,H,W) int32 argmax mask as one Pallas pass.

    softmax is order-preserving, so the mask equals the reference's
    softmax-then-argmax (unet.py:135-148) without the exp work.
    """
    n, h, w, c = logits.shape
    flat = logits.reshape(n * h * w, c)
    rows = n * h * w
    # Block sizing: the (block, C) input and (block, 1) output tiles are
    # lane-padded to 128, so VMEM ≈ block·128·4B per buffer.  Measured on
    # v5e at 512px/batch 8: block 1024 → 155 img/s, 4096 → 153, 16384 →
    # scoped-vmem OOM; grid-step overhead is not the bottleneck.
    block = 1024
    grid = (pl.cdiv(rows, block),)
    pad = (-rows) % block
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _argmax_kernel,
        out_shape=jax.ShapeDtypeStruct((flat.shape[0], 1), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)
    return out[:rows, 0].reshape(n, h, w)


def _final_argmax_kernel(feat_ref, w_ref, b_ref, out_ref):
    """(block, F) features × (F, C) final-conv weight + bias → per-pixel
    argmax class, without materializing the logit map."""
    x = feat_ref[...].astype(jnp.float32)
    logits = jnp.dot(x, w_ref[...].astype(jnp.float32),
                     preferred_element_type=jnp.float32) + b_ref[...]
    out_ref[...] = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)


def fused_final_argmax(features, kernel, bias, interpret: bool = False):
    """Fused final 1×1 conv + argmax: (N,H,W,F) features + HWIO (1,1,F,C)
    kernel → (N,H,W) int32 mask.  The C-channel logit tensor (the largest
    intermediate of the inference tail) never touches HBM.
    """
    n, h, w, f = features.shape
    kern = kernel.reshape(kernel.shape[-2], kernel.shape[-1])  # (F, C)
    c = kern.shape[-1]
    rows = n * h * w
    flat = features.reshape(rows, f)
    block = 2048
    pad = (-rows) % block
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _final_argmax_kernel,
        out_shape=jax.ShapeDtypeStruct((flat.shape[0], 1), jnp.int32),
        grid=(pl.cdiv(flat.shape[0], block),),
        in_specs=[
            pl.BlockSpec((block, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, kern, bias.reshape(1, c))
    return out[:rows, 0].reshape(n, h, w)


def _make_final_argmax_hist_kernel(block: int, per_img: int):
    def kernel(feat_ref, w_ref, b_ref, mask_ref, hist_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            hist_ref[...] = jnp.zeros_like(hist_ref)

        x = feat_ref[...].astype(jnp.float32)
        logits = jnp.dot(x, w_ref[...].astype(jnp.float32),
                         preferred_element_type=jnp.float32) + b_ref[...]
        cls = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        mask_ref[...] = cls
        c = hist_ref.shape[-1]
        onehot = (cls == jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
                  ).astype(jnp.float32)
        counts = jnp.sum(onehot, axis=0, keepdims=True)
        img = i * block // per_img
        hist_ref[pl.ds(img, 1), :] += counts

    return kernel


def fused_final_argmax_hist(features, kernel, bias, num_classes: int,
                            interpret: bool = False):
    """The whole inference tail in one Pallas pass: final 1×1 conv →
    per-pixel argmax → mask write + per-image class-histogram accumulation.
    Neither the logit map nor a histogram intermediate touches HBM.

    Requires the per-image pixel count to be a multiple of the row block
    (true for the 2^k image sizes this stack uses); falls back to the
    separate ops otherwise.
    """
    n, h, w, f = features.shape
    kern = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    c = kern.shape[-1]
    rows = n * h * w
    block = 1024
    per_img = h * w
    if per_img % block or rows % block:
        masks = fused_final_argmax(features, kernel, bias, interpret)
        classes = jnp.arange(c, dtype=jnp.int32)
        hist = (masks[..., None] == classes).sum(axis=(1, 2))
        return masks, hist.astype(jnp.float32)
    flat = features.reshape(rows, f)
    masks, hist = pl.pallas_call(
        _make_final_argmax_hist_kernel(block, per_img),
        out_shape=(jax.ShapeDtypeStruct((rows, 1), jnp.int32),
                   jax.ShapeDtypeStruct((n, c), jnp.float32)),
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(flat, kern, bias.reshape(1, c))
    return masks[:, 0].reshape(n, h, w), hist


def _make_paired_argmax_hist_kernel(block: int, per_img: int, c: int):
    def kernel(feat_ref, w_ref, b_ref, mask_ref, hist_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            hist_ref[...] = jnp.zeros_like(hist_ref)

        # matmul in the feature dtype (bf16 on TPU): the f32 up-convert
        # of the (block, 2F) tile cost more than the matmul it fed
        logits = jnp.dot(feat_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32) \
            + b_ref[...].astype(jnp.float32)
        # logits (block, 2C) = [even-pixel logits | odd-pixel logits];
        # masked argmaxes avoid lane-offset slices
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        neg = jnp.float32(-3.4e38)
        cls_e = jnp.argmax(jnp.where(lane < c, logits, neg),
                           axis=-1, keepdims=True).astype(jnp.int32)
        cls_o = jnp.argmax(jnp.where(lane >= c, logits, neg),
                           axis=-1, keepdims=True).astype(jnp.int32) - c
        # uint8 mask: the (block, 2) tile pads to 128 lanes in HBM, so
        # the write traffic is 64x the logical mask — at i32 that was
        # ~512 MB/step (0.6+ ms) at 512px/bs8; u8 quarters it
        mask_ref[...] = jnp.concatenate([cls_e, cls_o],
                                        axis=-1).astype(jnp.uint8)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        onehot = ((cls_e == ci).astype(jnp.float32)
                  + (cls_o == ci).astype(jnp.float32))
        counts = jnp.sum(onehot, axis=0, keepdims=True)
        img = i * block // per_img
        hist_ref[pl.ds(img, 1), :] += counts

    return kernel


def fused_final_argmax_hist_paired(features, kernel, bias, num_classes: int,
                                   interpret: bool = False):
    """Paired-layout inference tail: features arrive (N, H, W/2, 2F) with
    adjacent output columns packed into lanes (the fused decoder's native
    output — see decoder_fuse.fused_unetup_paired), so the unpair relayout
    never happens.  One Pallas pass: block-diagonal final 1×1 conv →
    per-half argmax → (N,H,W) mask + per-image class histogram."""
    n, h, w2, f2 = features.shape
    f = f2 // 2
    kern = kernel.reshape(kernel.shape[-2], kernel.shape[-1])  # (F, C)
    c = kern.shape[-1]
    zero = jnp.zeros_like(kern)
    wd = jnp.concatenate([jnp.concatenate([kern, zero], axis=1),
                          jnp.concatenate([zero, kern], axis=1)], axis=0)
    b2 = jnp.concatenate([bias, bias]).reshape(1, 2 * c)
    rows = n * h * w2
    per_img = h * w2
    # big row blocks: at 1024 the 512px/bs8 tail ran 1024 grid steps of
    # a tiny (1024, 2F)x(2F, 2C) matmul — grid overhead dominated.  4096
    # stays inside scoped VMEM (the (block, 2) i32 mask tile pads to 128
    # lanes, so it costs 64x its logical size)
    block = 4096
    while block > 1024 and (per_img % block or rows % block):
        block //= 2
    if per_img % block or rows % block:
        # fall back through the unpaired tail (masks cast for dtype
        # parity with the kernel path)
        unp = features.reshape(n, h, 2 * w2, f)
        m, hs = fused_final_argmax_hist(unp, kernel, bias, num_classes,
                                        interpret)
        return m.astype(jnp.uint8), hs
    flat = features.reshape(rows, f2)
    wd = wd.astype(features.dtype)
    masks, hist = pl.pallas_call(
        _make_paired_argmax_hist_kernel(block, per_img, c),
        out_shape=(jax.ShapeDtypeStruct((rows, 2), jnp.uint8),
                   jax.ShapeDtypeStruct((n, c), jnp.float32)),
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, f2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(flat, wd, b2)
    return masks.reshape(n, h, 2 * w2), hist


def _palette_blend_kernel(mask_ref, img_ref, palette_ref, alpha_ref, out_ref):
    """mask (rows,1) int32 + original RGB (rows,3) + palette (C,3) →
    blended uint8 RGB (rows,3): out = img*(1-a) + palette[mask]*a
    (reference blend: unet.py:174-182, Image.blend(old, new, 0.7))."""
    mask = mask_ref[...]                       # (rows, 1)
    img = img_ref[...].astype(jnp.float32)     # (rows, 3)
    palette = palette_ref[...].astype(jnp.float32)  # (C, 3)
    alpha = alpha_ref[0]
    onehot = (mask == jax.lax.broadcasted_iota(
        jnp.int32, (1, palette.shape[0]), 1)).astype(jnp.float32)
    seg = jnp.dot(onehot, palette, preferred_element_type=jnp.float32)
    out = img * (1.0 - alpha) + seg * alpha
    out_ref[...] = jnp.round(out).astype(jnp.uint8)


def fused_mask_palette(mask, image_rgb, colors, alpha: float = 0.7,
                       interpret: bool = False):
    """(N,H,W) int mask + (N,H,W,3) uint8 original → blended uint8 RGB.

    mix_type 0 when alpha=0.7; mix_type 1 is alpha=1.0
    (reference: unet.py:168-194).
    """
    n, h, w = mask.shape
    rows = n * h * w
    flat_mask = mask.reshape(rows, 1).astype(jnp.int32)
    flat_img = image_rgb.reshape(rows, 3)
    palette = jnp.asarray(np.asarray(colors, np.uint8))
    block = 1024
    pad = (-rows) % block
    if pad:
        flat_mask = jnp.pad(flat_mask, ((0, pad), (0, 0)))
        flat_img = jnp.pad(flat_img, ((0, pad), (0, 0)))
    grid = (pl.cdiv(flat_mask.shape[0], block),)
    out = pl.pallas_call(
        functools.partial(_palette_blend_kernel),
        out_shape=jax.ShapeDtypeStruct((flat_mask.shape[0], 3), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((palette.shape[0], 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat_mask, flat_img, palette,
      jnp.asarray([alpha], jnp.float32))
    return out[:rows].reshape(n, h, w, 3)
