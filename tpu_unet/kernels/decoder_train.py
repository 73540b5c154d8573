"""Paired backward kernels for the fused UnetUp decoder stage.

Round-3 train-step profiling (512px, batch 8, VGG16-UNet) showed the
up1 stage's XLA backward dominating the 125 ms step: the F=64 dgrad
conv runs at ~37% MXU (half-filled lanes — the same disease the paired
forward kernel cures), and the relu-mask / bias-grad elementwise passes
around it cost another ~10 ms at 512² resolution.

This module runs the whole activation-gradient chain of one decoder
stage in a single Pallas pass per row-tile, in the PAIRED column layout
(adjacent columns packed into lanes, kernels/decoder_fuse.py):

    g2  = g ⊙ [out > 0]                       (relu VJP, in-VMEM)
    dz1 = conv(g2, flipT(k2)) ⊙ [y1 > 0]      (dgrad as a paired conv)
    dskip = conv(dz1, flipT(k1)[..., :Cs])    (dgrad, skip section)
    dups  = conv(dz1, flipT(k1)[..., Cs:])    (dgrad, upsample section)

dgrad of a SAME-padded 3×3 conv is itself a SAME-padded 3×3 conv with
the kernel flipped in (ky, kx) and transposed in (cin, cout), so the
backward reuses the forward's dense+edge paired conv (`_conv_rows`)
with host-flipped weights — full 128-lane matmuls where XLA ran at
half rate.  g2 and dz1 are also written out (kernel-native layouts) so
the weight/bias gradients run as plain XLA contractions over them; the
upsample transpose dx = U^T(dups) stays in XLA too (interpolation-as-
matmul, nn/resize.py).

Reference semantics: the autodiff of nets/unet.py:16-22's unetUp.

Round-3 measurement (512px, batch 8, v5e): this kernel chain runs the
up1 backward in 5.0 ms vs XLA's ~12 ms of dgrad+mask fusions — but the
step ends up at 56.6 img/s vs 63.2 for pure XLA, because the paired↔
natural boundary still costs ~10 ms of {1,3,2,0}↔{3,0,2,1} relayout
copies per step (profiled) plus split wgrads over reshaped buffers.
The designed fix is keeping the whole up1→final→loss→backward region in
the paired layout (see kernels/loss.py final-conv fusion); until that
lands, training defaults to XLA (TPU_UNET_FUSED_TRAIN opts in).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import _conv_rows, _pair_weights


def _flip_t(k):
    """dgrad weights: (3, 3, Ci, Co) → (3, 3, Co, Ci), flipped in ky/kx."""
    return jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)


def _bwd_kernel(T, W, Cs, Cx, F, dt):
    def kernel(k2d, k2e, zf, k1sd, k1se, zs, k1ud, k1ue, zu,
               g_m, g_h, o_m, o_h, y_m, y_h,
               dsk_ref, dup_ref, g2_ref, dz1_ref):
        gw = jnp.concatenate([g_m[0], g_h[0, :4]], axis=0)   # rows r0-2..r0+T+2
        ow = jnp.concatenate([o_m[0], o_h[0, :4]], axis=0)
        yw = jnp.concatenate([y_m[0], y_h[0, :4]], axis=0)
        # relu VJP; zero-padded inputs make OOB rows vanish on their own.
        # Compares run in f32 — v5e Mosaic has no packed-bf16 compare.
        g2 = jnp.where(ow.astype(jnp.float32) > 0.0, gw,
                       jnp.zeros_like(gw))                   # (T+4, W, 2F)
        dz1 = _conv_rows(g2, T + 2, k2d, k2e, zf, dt, relu=False)
        dz1 = jnp.where(yw[1:T + 3].astype(jnp.float32) > 0.0, dz1,
                        jnp.zeros_like(dz1))
        dsk_ref[0] = _conv_rows(dz1, T, k1sd, k1se, zs, dt, relu=False)
        dup_ref[0] = _conv_rows(dz1, T, k1ud, k1ue, zu, dt, relu=False)
        g2_ref[0] = g2[2:T + 2]
        dz1_ref[0] = dz1[1:T + 1]

    return kernel


def fused_unetup_bwd_impl(g, out, y1, k1, k2, Cs, block_rows=None):
    """Paired activation-gradient chain for one decoder stage.

    All of ``g``/``out``/``y1`` arrive NATURAL (B, H2, W2, F).  Returns
    (dskip (B,H2,W2,Cs), dups (B,H2,W2,Cx), g2, dz1) — natural layouts —
    or None when the stage isn't paired-tileable (caller falls back to
    the XLA VJP).
    """
    B, H2, W2, F = g.shape
    Cp = k1.shape[2]
    Cx = Cp - Cs
    dt = g.dtype
    W = W2 // 2
    paired = F < 128 and F % 8 == 0 and Cs % 2 == 0 and Cx % 2 == 0
    if not paired or W2 % 2:
        return None
    T = block_rows or (16 if H2 % 16 == 0 else 8)
    if H2 % T or T < 8:
        return None

    interpret = jax.default_backend() == "cpu"

    def to_paired(t):
        return jnp.pad(t.reshape(B, H2, W, 2 * t.shape[-1]),
                       ((0, 0), (2, T - 2), (0, 0), (0, 0)))

    g_p, o_p, y_p = to_paired(g), to_paired(out), to_paired(y1)

    k2f_d, k2f_e = _pair_weights(_flip_t(k2).astype(dt), F, F)
    k1f = _flip_t(k1).astype(dt)                     # (3, 3, F, Cp)
    k1s_d, k1s_e = _pair_weights(k1f[..., :Cs], F, Cs)
    k1u_d, k1u_e = _pair_weights(k1f[..., Cs:], F, Cx)
    zf = jnp.zeros((2 * F,), dt)
    zs = jnp.zeros((2 * Cs,), dt)
    zu = jnp.zeros((2 * Cx,), dt)

    grid = (B, H2 // T)

    def blk(c):
        return [
            pl.BlockSpec((1, T, W, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, c), lambda b, i: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    out_shapes = (
        jax.ShapeDtypeStruct((B, H2, W, 2 * Cs), dt),
        jax.ShapeDtypeStruct((B, H2, W, 2 * Cx), dt),
        jax.ShapeDtypeStruct((B, H2, W, 2 * F), dt),
        jax.ShapeDtypeStruct((B, H2, W, 2 * F), dt),
    )
    out_specs = tuple(
        pl.BlockSpec((1, T, W, c), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM)
        for c in (2 * Cs, 2 * Cx, 2 * F, 2 * F))

    kernel = _bwd_kernel(T, W, Cs, Cx, F, dt)
    dsk, dup, g2, dz1 = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
        + blk(2 * F) * 3,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(k2f_d, k2f_e, zf, k1s_d, k1s_e, zs, k1u_d, k1u_e, zu,
      g_p, g_p, o_p, o_p, y_p, y_p)
    return (dsk.reshape(B, H2, W2, Cs), dup.reshape(B, H2, W2, Cx),
            g2.reshape(B, H2, W2, F), dz1.reshape(B, H2, W2, F))
