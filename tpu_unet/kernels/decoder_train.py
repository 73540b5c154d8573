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

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import (_col_arrays, _conv_rows,
                                           _h_upsample_rows, _mm,
                                           _pair_weights, _row_arrays,
                                           _shift_cols_zero,
                                           _w_expand_pair)


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


# ---------------------------------------------------------------------------
# v2: the fully-paired backward — dgrads AND wgrads in one kernel pass.
#
# v1 (above) lost to XLA end-to-end (56.6 vs 63.2 img/s at 512px/bs8)
# because every paired↔natural boundary cost a relayout copy (~10 ms/step
# profiled) and the split XLA wgrads re-read reshaped buffers.  Here the
# entire up1 training region speaks paired:
#
#   loss kernel (paired dfeat) → THIS kernel → paired weight-grads
#
# Per row-tile the kernel:
#   g2  = g ⊙ [out > 0]                      (relu VJP)
#   dz1 = conv(g2, flipT(k2)) ⊙ [y1 > 0]     (dgrad, paired conv)
#   dskip/dups = conv(dz1, flipT(k1) split)  (dgrads, paired)
#   cc  = [skip | upsample(x)] recomputed    (the forward's lerp chain —
#                                             cheaper than an 800 MB
#                                             HBM roundtrip for the concat)
#   dkd1/dke1 += ccᵀ @ dz1-window            (conv1 wgrad, paired space)
#   dkd2/dke2 += y1ᵀ @ g2-window             (conv2 wgrad, paired space)
#   db1/db2   += row sums
#
# The paired-space weight grads (dkd, dke) map back to the natural (3, 3,
# Ci, Co) tensor through the exact adjoint of `_pair_weights` — obtained
# mechanically with jax.linear_transpose (it is a linear layout map).
# Residuals out/y1 are saved PAIRED by the forward; g arrives PAIRED from
# the fused final-conv+loss kernel; dskip/dups leave paired and are
# unpaired by one XLA reshape each (Mosaic restricts offset-64 lane
# slices, so the in-kernel interleave is not available at Cs = 64).
# ---------------------------------------------------------------------------


def _mmT(a, b):
    """(R, W, C) ⊗ (R, W, F) → (C, F), contracting all pixels (f32 acc)."""
    r, w, c = a.shape
    return jax.lax.dot_general(
        a.reshape(r * w, c), b.reshape(r * w, b.shape[-1]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _edge_cotangent(dout):
    """Edge-matmul weight cotangent.  In `_conv_rows` the edge result res
    feeds acc_even[:, j+1] and acc_odd[:, j-1] (shift −1 / +1 of res), so
    the res cotangent at column m is dout_even[:, m+1] + dout_odd[:, m−1]
    — the opposite shifts applied to the output gradient."""
    F2 = dout.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, dout.shape, 2)
    return jnp.where(lane < F2 // 2,
                     _shift_cols_zero(dout, 1), _shift_cols_zero(dout, -1))


def _w_expand_adjoint(dup, we3, wo3, Cx, W):
    """Adjoint of `_w_expand_pair` on the paired cotangent ``dup``
    (R, W, 2Cx) — lanes [0:Cx] = d(even), [Cx:2Cx] = d(odd).  Returns
    dh (R, W, Cx) f32.  Forward: even_j = (1-we_j)·h_{max(j-1,0)} +
    we_j·h_j, odd_j = (1-wo_j)·h_j + wo_j·h_{min(j+1,W-1)}."""
    if Cx % 128 == 0 or jax.default_backend() == "cpu":
        # slice-then-convert: converting the full 2Cx array first keeps
        # an extra (R, W, 2Cx) f32 live and pushed the F=512 stage's
        # backward past its scoped-VMEM cap
        deven = dup[:, :, :Cx].astype(jnp.float32)
        dodd = dup[:, :, Cx:].astype(jnp.float32)
    else:
        # Cx = 64 (up_conv head): the lane-offset-64 slice poisons the
        # layout of the column-shift concats below (Mosaic rejects
        # lane-offset concat operands) — a half-width lane roll of the
        # 2-block array lands the odd half at offset 0 instead
        dupf = dup.astype(jnp.float32)
        deven = dupf[:, :, :Cx]
        dodd = pltpu.roll(dupf, Cx, axis=2)[:, :, :Cx]
    a = deven * we3
    b = deven - a                               # (1-we)·deven
    c = dodd - dodd * wo3                       # (1-wo)·dodd
    d = dodd * wo3
    colj = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    sb = jnp.concatenate([b[:, 1:], jnp.zeros_like(b[:, :1])], axis=1)
    sd = jnp.concatenate([jnp.zeros_like(d[:, :1]), d[:, :-1]], axis=1)
    return (a + sb + jnp.where(colj == 0, b, 0.0)
            + c + sd + jnp.where(colj == W - 1, d, 0.0))


def _h_adjoint_rows(dh, hwc, hselc, validc, T, win, W, Cx):
    """Adjoint of the H-axis ×2 lerp for the T output rows of one tile:
    dx_win = Lᵀ @ dh, with L (T, win) rebuilt in-register exactly as
    `_h_upsample_mxu` builds it (rows e = t+2 of the E-row L).  Returns
    (win, W, Cx) f32 — the tile's contribution to x rows
    r0//2 - 2 .. r0//2 + win - 2, overlap-added by the caller.

    When Cx isn't a 128-multiple (the 64-channel up_conv head) the
    trailing (W, Cx)↔(W·Cx) folds are unsupported Mosaic shape casts, so
    dh is lane-padded to 128 first (zero columns contract to zeros) and
    the result sliced back — the matmul N doubles, but it is tiny."""
    ein = jax.lax.broadcasted_iota(jnp.int32, (T, win), 0) + 2
    li = jax.lax.broadcasted_iota(jnp.int32, (T, win), 1)
    def row_coeff(c):
        # per-row scalars broadcast across the win columns; the arrays
        # arrive Cx lanes wide (Cx >= win on every production shape —
        # the broadcast branch only serves narrow test shapes)
        if c.shape[1] >= win:
            return c[2:T + 2, :win].astype(jnp.float32)
        return jnp.broadcast_to(c[2:T + 2, :1],
                                (T, win)).astype(jnp.float32)

    hw_t, hsel_t, valid_t = row_coeff(hwc), row_coeff(hselc), row_coeff(validc)
    lo_i = jnp.where(hsel_t != 0.0, (ein + 2) // 2, ein // 2)
    aw = valid_t - hw_t
    L = (jnp.where(li == lo_i, aw, 0.0)
         + jnp.where(li == lo_i + 1, hw_t, 0.0))
    C = Cx
    if C % 128:
        pad = 128 - C % 128
        dh = jnp.concatenate([dh, jnp.zeros(dh.shape[:2] + (pad,),
                                            dh.dtype)], axis=-1)
        C += pad
    out = jax.lax.dot_general(
        L, dh.reshape(T, W * C),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out.reshape(win, W, C)
    return out[:, :, :Cx] if C != Cx else out


def _bwd_kernel_v2(T, E, win, Cs, Cx, F, H2, W, dt):
    Cp = Cs + Cx

    def kernel(hw, hsel, validx, skv, rv, we, wo,
               k2d, k2e, zf, k1sd, k1se, zs, k1ud, k1ue, zu,
               sk_p, sk_m, sk_n, x_l, x_m, x_h,
               g_p, g_m, g_n, o_p, o_m, o_n, y_p, y_m, y_n,
               dsk_ref, dxp_ref, dkd1_ref, dke1_ref, dkd2_ref, dke2_ref,
               db_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * T

        @pl.when((b == 0) & (i == 0))
        def _():
            dkd1_ref[...] = jnp.zeros_like(dkd1_ref)
            dke1_ref[...] = jnp.zeros_like(dke1_ref)
            dkd2_ref[...] = jnp.zeros_like(dkd2_ref)
            dke2_ref[...] = jnp.zeros_like(dke2_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def win3(p, m, n):
            # rows r0-2 .. r0+T+2 from three row-clamped blocks; boundary
            # duplicates carry wrong rows and are handled by masks below
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        # one aligned load (r0 = i·T is a multiple of 8 — Mosaic requires
        # provable sublane alignment); shifted views are register slices
        rva = rv[pl.ds(r0, T + 4)]
        rvw = rva[:, None, :]
        gw = win3(g_p, g_m, g_n) * rvw            # OOB rows → exact zero
        ow = win3(o_p, o_m, o_n)
        # yw feeds the conv2 wgrad windows directly: its OOB halo rows
        # (clamped duplicates) must be the zeros SAME-padding implies.
        yw = win3(y_p, y_m, y_n) * rvw
        # compares in f32 — v5e Mosaic has no packed-bf16 compare
        g2 = jnp.where(ow.astype(jnp.float32) > 0.0, gw,
                       jnp.zeros_like(gw))        # (T+4, W, 2F)
        dz1 = _conv_rows(g2, T + 2, k2d, k2e, zf, dt, relu=False)
        dz1 = jnp.where(yw[1:T + 3].astype(jnp.float32) > 0.0, dz1,
                        jnp.zeros_like(dz1))      # rows r0-1 .. r0+T+1
        # conv1 has no outputs outside the image — its gradient must be
        # exactly zero there (the clamped y1 halo rows are duplicates, not
        # the zero padding that enforced this in the padded-buffer path)
        dz1 = dz1 * rva[1:T + 3][:, None, :]

        dsk_ref[0] = _conv_rows(dz1, T, k1sd, k1se, zs, dt, relu=False)
        # ---- upsample transpose IN-KERNEL: dup (the paired cotangent of
        # [even|odd]) never touches HBM; its W- and H-lerp adjoints run
        # here and only the tile's dx window (win rows of x) is written.
        # The XLA path this replaces (unpair reshape + relayout copies +
        # the upsample2x VJP over (B, 2H, 2W, Cx)) profiled ~5.7 ms/step.
        dup = _conv_rows(dz1, T, k1ud, k1ue, zu, dt, relu=False)
        we3 = we[...].astype(jnp.float32)[None]
        wo3 = wo[...].astype(jnp.float32)[None]
        dh = _w_expand_adjoint(dup, we3, wo3, Cx, W)
        dxw = _h_adjoint_rows(dh, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                              validx[pl.ds(r0, E)], T, win, W, Cx)
        dxp_ref[0, 0] = dxw.astype(dt)

        # ---- conv2 wgrad: src = y1 window, dout = g2 rows r0..r0+T ----
        g2c = g2[2:T + 2]
        sh2 = _edge_cotangent(g2c)
        dkd2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], g2c) for ky in (0, 1, 2)])
        dke2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], sh2) for ky in (0, 1, 2)])

        # ---- recompute cc = [skip | up-even | up-odd] (forward's chain) --
        sk = jnp.concatenate([sk_p[0], sk_m[0], sk_n[0]],
                             axis=0)[T - 2:2 * T + 2]
        sk = sk * skv[pl.ds(r0, T + 4)][:, None, :]
        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        h = _h_upsample_rows(xs, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                             r0, H2, E)
        h = h * validx[pl.ds(r0, E)][:, None, :]
        even, odd = _w_expand_pair(h, we[...][None], wo[...][None])
        cc = jnp.concatenate([sk, even.astype(dt), odd.astype(dt)],
                             axis=-1)             # (T+4, W, 2Cp)

        # ---- conv1 wgrad: src = cc, dout = dz1 rows r0..r0+T ----
        dz1c = dz1[1:T + 1]
        sh1 = _edge_cotangent(dz1c)
        dkd1_ref[...] += jnp.stack(
            [_mmT(cc[1 + ky:1 + ky + T], dz1c) for ky in (0, 1, 2)])
        dke1_ref[...] += jnp.stack(
            [_mmT(cc[1 + ky:1 + ky + T], sh1) for ky in (0, 1, 2)])

        dbs = jnp.concatenate([
            jnp.sum(dz1c.astype(jnp.float32), axis=(0, 1), keepdims=False
                    ).reshape(1, 2 * F),
            jnp.sum(g2c.astype(jnp.float32), axis=(0, 1), keepdims=False
                    ).reshape(1, 2 * F)], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 2), (0, 0)))

    return kernel


def _unpair_wgrad(dkd, dke, k_shape, Cs, F):
    """Exact adjoint of `_pair_weights`: paired-space weight cotangents
    (3, 2C, 2F) → natural (3, 3, C, F)."""
    fn = jax.linear_transpose(
        lambda k: _pair_weights(k, Cs, F),
        jax.ShapeDtypeStruct(k_shape, dkd.dtype))
    (dk,) = fn((dkd, dke))
    return dk


def fused_unetup_bwd_paired_impl(g, out, y1, skip, x, k1, k2, Cs,
                                 block_rows=None):
    """Paired backward for one decoder stage: activation-gradient chain +
    in-kernel weight gradients.

    ``g``/``out``/``y1`` arrive PAIRED (B, H2, W, 2F); ``skip`` paired
    (B, H2, W, 2Cs); ``x`` natural (B, H, W, Cx).  Returns
    (dskip_paired, dups_paired, dk1, db1, dk2, db2) — the weight grads in
    natural layout and f32 — or None when the stage isn't tileable.
    """
    B, H2, Wp, F2 = g.shape
    F = F2 // 2
    Cp = k1.shape[2]
    Cx = Cp - Cs
    _, H, W, _ = x.shape
    dt = g.dtype
    paired = F < 128 and F % 8 == 0 and Cs % 2 == 0 and Cx % 2 == 0
    if not paired or Wp != W:
        return None
    # A/B: T=32 row tiles halve the per-step count of the stacked
    # H-adjoint's N-bound MXU passes (M fills 72/128 instead of 48/128)
    # at ~2x the VMEM block residency
    t32 = (os.environ.get("TPU_UNET_PAIRED_BWD_T32", "0").lower()
           not in ("0", "false", "off"))
    T = block_rows or (32 if (t32 and H2 % 32 == 0)
                       else (16 if H2 % 16 == 0 else 8))
    if H2 % T or T < 8 or H % (T // 2):
        return None
    E = T + 4
    win = T // 2 + 4

    interpret = jax.default_backend() == "cpu"

    hw, hsel, valid = _row_arrays(H)
    we, wo = _col_arrays(W)
    hw = np.repeat(hw, Cx, axis=1)
    hsel = np.repeat(hsel, Cx, axis=1)
    validx = np.repeat(valid, Cx, axis=1)
    we = np.repeat(we, Cx, axis=1)
    wo = np.repeat(wo, Cx, axis=1)
    rs = np.arange(-2, H2 + 2)
    inimg = ((rs >= 0) & (rs < H2)).astype(np.float32).reshape(-1, 1)
    skv = np.repeat(inimg, 2 * Cs, axis=1)
    rv = np.repeat(inimg, 2 * F, axis=1)

    k2f_d, k2f_e = _pair_weights(_flip_t(k2).astype(dt), F, F)
    k1f = _flip_t(k1).astype(dt)                     # (3, 3, F, Cp)
    k1s_d, k1s_e = _pair_weights(k1f[..., :Cs], F, Cs)
    k1u_d, k1u_e = _pair_weights(k1f[..., Cs:], F, Cx)
    zf = jnp.zeros((2 * F,), dt)
    zs = jnp.zeros((2 * Cs,), dt)
    zu = jnp.zeros((2 * Cx,), dt)

    from tpu_unet.core import fusion
    if (fusion.use_lowres_bwd_paired() and (2 * F) % 128 == 0
            and Cx % 128 == 0):
        return _bwd_paired_lowres_call(
            g, out, y1, skip, x, k1, B, H2, F, Cp, Cx, Cs, H, W, dt,
            T, E, win, hw, hsel, validx, skv, rv,
            k2f_d, k2f_e, zf, k1s_d, k1s_e, zs, interpret)

    nb = H2 // T - 1
    nbx = H // (T // 2) - 1
    grid = (B, H2 // T)

    def blk3(c):
        return [
            pl.BlockSpec((1, T, W, c),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, c),
                         lambda b, i: (b, jnp.minimum(i + 1, nb), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    x_specs = [
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.minimum(i + 1, nbx), 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    nblk = H2 // T
    out_shapes = (
        jax.ShapeDtypeStruct((B, H2, W, 2 * Cs), dt),
        jax.ShapeDtypeStruct((B, nblk, win, W, Cx), dt),
        jax.ShapeDtypeStruct((3, 2 * Cp, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * Cp, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * F), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, T, W, 2 * Cs), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, win, W, Cx), lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const((3, 2 * Cp, 2 * F)),
        const((3, 2 * Cp, 2 * F)),
        const((3, 2 * F, 2 * F)),
        const((3, 2 * F, 2 * F)),
        const((8, 2 * F)),
    )

    kernel = _bwd_kernel_v2(T, E, win, Cs, Cx, F, H2, W, dt)
    coef_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=coef_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
        + blk3(2 * Cs) + x_specs + blk3(2 * F) * 3,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(hw).astype(dt), jnp.asarray(hsel).astype(dt),
      jnp.asarray(validx).astype(dt), jnp.asarray(skv).astype(dt),
      jnp.asarray(rv).astype(dt),
      jnp.asarray(we).astype(dt), jnp.asarray(wo).astype(dt),
      k2f_d, k2f_e, zf, k1s_d, k1s_e, zs, k1u_d, k1u_e, zu,
      skip, skip, skip, x, x, x, g, g, g, out, out, out, y1, y1, y1)
    dsk, dxp, dkd1, dke1, dkd2, dke2, dbs = res

    # overlap-add of the per-tile dx windows (tile i covers x rows
    # i·half − 2 .. i·half + half + 2, 2-row halos each side) as one
    # Pallas pass: the jnp slice/pad/add composition materializes
    # ~2 ms/step of pad+add fusions across the four stages
    dx = _overlap_add_windows(dxp, B, H, W, Cx, T, win, dt, interpret)

    # paired-space → natural weight grads (exact adjoint of _pair_weights)
    dk1 = _unpair_wgrad(dkd1, dke1, (3, 3, Cp, F), Cs, F)
    dk2 = _unpair_wgrad(dkd2, dke2, (3, 3, F, F), F, F)
    db1 = dbs[0, :F] + dbs[0, F:]
    db2 = dbs[1, :F] + dbs[1, F:]
    return dsk, dx, dk1, db1, dk2, db2


# ---------------------------------------------------------------------------
# Low-res PAIRED backward — the F < 128 up1 stage.
#
# The v2 paired backward above is ~half VPU per row-tile (profiled 10.2
# ms/step at 512px/bs8, ~57% of its FLOP floor): the dup dgrad conv, the
# W-expand adjoint, and the cc up-half recompute (H-lerp + W-expand) all
# run at the FULL 512² resolution.  The same commutation the low-res
# forward uses (`_paired_kernel_lowres`) applies to the adjoint: the
# H/W-lerp scalars commute with the channel contraction, so
#
#   dx       = Σ_ky  Wcombᵀ(Hlerpᵀ(dz1)) @ kupᵀ       (low-res rows)
#   dkup[ky] = xsᵀ @ Wcombᵀ(Hlerpᵀ(dz1))              (low-res rows)
#
# — the full-res dup conv, its W/H adjoint chains, and the up-half
# recompute all disappear; conv1's wgrad contracts only the 2Cs skip
# lanes.  Mirrors `_bwd_kernel_wide_lowres` in the column-PAIRED layout
# (duplicated [kx|kx] weight blocks, 7 lane-blocked coefficient maps of
# `_lowres_col_coeffs_paired`).
# ---------------------------------------------------------------------------

from tpu_unet.kernels.decoder_fuse import _lowres_col_coeffs_paired


def _h_adjoint_cat_arrays(H, win):
    """Host-side stacked coefficient planes for `_h_adjoint_rows_cat`:
    three (H2, 3·winp) f32 arrays whose ky-th winp-lane block carries the
    per-row value at offset ky+1 (cat[r, ky·winp + l] = coef[r + ky + 1]
    in `_row_arrays` indexing).  Precomputed because the in-kernel
    equivalent — concat of three offset sublane slices — is a Mosaic
    unsupported op ("offset mismatch on non-concat dimension")."""
    winp = (win + 7) // 8 * 8
    hw, hsel, valid = _row_arrays(H)                 # (2H+4, 1) each
    H2 = 2 * H

    def cat(a):
        return np.concatenate(
            [np.repeat(a[ky + 1:ky + 1 + H2], winp, axis=1)
             for ky in range(3)], axis=1).astype(np.float32)

    return cat(hw), cat(hsel), cat(valid), winp


def _h_adjoint_rows_cat(dh2d, hw_t, hs_t, vl_t, R, win, winp):
    """All three per-ky H-lerp adjoints as ONE matmul.

    The per-ky form (`_h_adjoint_rows_ky` ×3) runs three MXU passes at
    M = win (12), K = T — tiny-M matmuls whose cost is set by the huge N
    (W·2F), so issuing them separately triples the pass count.  Here the
    three L matrices are stacked along padded winp-row column blocks
    (Lcat (R, 3·winp), zeros in the pad columns) and contracted once:
    out (3·winp, N); block ky starts at sublane ky·winp (8-aligned).
    ``hw_t``/``hs_t``/``vl_t`` are the tile's (R, 3·winp) slices of
    `_h_adjoint_cat_arrays`.
    """
    W3 = 3 * winp
    tin = jax.lax.broadcasted_iota(jnp.int32, (R, W3), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (R, W3), 1)
    kyi = li // winp
    lloc = li - kyi * winp
    ein = tin + kyi + 1
    lo_i = jnp.where(hs_t != 0.0, (ein + 2) // 2, ein // 2)
    aw = vl_t - hw_t
    L = (jnp.where(lloc == lo_i, aw, 0.0)
         + jnp.where(lloc == lo_i + 1, hw_t, 0.0))
    L = jnp.where(lloc < win, L, 0.0)
    return jax.lax.dot_general(
        L, dh2d, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _w_comb_adjoint_paired(du, colc):
    """Adjoint of the PAIRED low-res W-combination
    (`_paired_kernel_lowres`): given du (R, W, 2F) f32 — the cotangent of
    u = c0·s(P0,-1) + c1·P0 + c2·s(P1,-1) + c3·P1 + c4·s(P1,+1)
        + c5·P2 + c6·s(P2,+1)
    — returns dp_cat (R, W, 3·2F) = [dP0 | dP1 | dP2] (f32).  colc is the
    same (7, W, 2F) coefficient stack the forward used."""
    c = [colc[k][None] for k in range(7)]
    sp = lambda v: _shift_cols_zero(v, 1)    # adjoint of shift(·, -1)
    sm = lambda v: _shift_cols_zero(v, -1)   # adjoint of shift(·, +1)
    dp0 = sp(c[0] * du) + c[1] * du
    dp1 = sp(c[2] * du) + c[3] * du + sm(c[4] * du)
    dp2 = c[5] * du + sm(c[6] * du)
    return jnp.concatenate([dp0, dp1, dp2], axis=-1)


def _bwd_kernel_paired_lowres(T, E, win, winp, Cs, Cx, F, H2, W, dt):
    def kernel(hw3, hs3, vl3, skv, rv, colc,
               k2d, k2e, zf, k1sd, k1se, zs, kupt,
               sk_p, sk_m, sk_n, x_l, x_m, x_h,
               g_p, g_m, g_n, o_p, o_m, o_n, y_p, y_m, y_n,
               dsk_ref, dxp_ref, dkd1_ref, dke1_ref, dkup_ref,
               dkd2_ref, dke2_ref, db_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * T

        @pl.when((b == 0) & (i == 0))
        def _():
            dkd1_ref[...] = jnp.zeros_like(dkd1_ref)
            dke1_ref[...] = jnp.zeros_like(dke1_ref)
            dkup_ref[...] = jnp.zeros_like(dkup_ref)
            dkd2_ref[...] = jnp.zeros_like(dkd2_ref)
            dke2_ref[...] = jnp.zeros_like(dke2_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def win3(p, m, n):
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        rva = rv[pl.ds(r0, T + 4)]
        rvw = rva[:, None, :]
        gw = win3(g_p, g_m, g_n) * rvw
        ow = win3(o_p, o_m, o_n)
        yw = win3(y_p, y_m, y_n) * rvw
        g2 = jnp.where(ow.astype(jnp.float32) > 0.0, gw,
                       jnp.zeros_like(gw))        # (T+4, W, 2F)
        dz1 = _conv_rows(g2, T + 2, k2d, k2e, zf, dt, relu=False)
        dz1 = jnp.where(yw[1:T + 3].astype(jnp.float32) > 0.0, dz1,
                        jnp.zeros_like(dz1))
        dz1 = dz1 * rva[1:T + 3][:, None, :]

        dsk_ref[0] = _conv_rows(dz1, T, k1sd, k1se, zs, dt, relu=False)

        # ---- LOW-RES up path: dx + conv1's up-half wgrad ----
        dz2dc = dz1.astype(jnp.float32)[1:T + 1].reshape(T, W * 2 * F)
        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        ducat = _h_adjoint_rows_cat(dz2dc, hw3[pl.ds(r0, T)],
                                    hs3[pl.ds(r0, T)], vl3[pl.ds(r0, T)],
                                    T, win, winp)
        dxs = None
        for ky in range(3):
            duc = ducat[ky * winp:ky * winp + win].reshape(win, W, 2 * F)
            dpc = _w_comb_adjoint_paired(duc, colc).astype(dt)
            t = _mm(dpc, kupt[ky])                    # (win, W, Cx) f32
            dxs = t if dxs is None else dxs + t
            dkup_ref[ky] += _mmT(xs, dpc)             # (Cx, 6F)
        dxp_ref[0, 0] = dxs.astype(dt)

        # ---- conv2 wgrad: src = y1 window, dout = g2 center rows ----
        g2c = g2[2:T + 2]
        sh2 = _edge_cotangent(g2c)
        dkd2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], g2c) for ky in (0, 1, 2)])
        dke2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], sh2) for ky in (0, 1, 2)])

        # ---- conv1's SKIP-half wgrad: src = skip window only ----
        sk = jnp.concatenate([sk_p[0], sk_m[0], sk_n[0]],
                             axis=0)[T - 2:2 * T + 2]
        sk = sk * skv[pl.ds(r0, T + 4)][:, None, :]
        dz1c = dz1[1:T + 1]
        sh1 = _edge_cotangent(dz1c)
        dkd1_ref[...] += jnp.stack(
            [_mmT(sk[1 + ky:1 + ky + T], dz1c) for ky in (0, 1, 2)])
        dke1_ref[...] += jnp.stack(
            [_mmT(sk[1 + ky:1 + ky + T], sh1) for ky in (0, 1, 2)])

        dbs = jnp.concatenate([
            jnp.sum(dz1c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
            jnp.sum(g2c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
        ], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 2), (0, 0)))

    return kernel


def _unpack_wgrad_up_paired(dkup, Cx, F):
    """dkup (3, Cx, 3·2F) — per-kx lane blocks of the DUPLICATED [kx|kx]
    weight columns — back to the natural up-half tensor (3, 3, Cx, F):
    the duplicate halves sum.  Explicit slices + stack (the
    linear_transpose form canonicalizes to negative-pad fusions the TPU
    fusion emitter rejects, see `_unpack_wgrad_eo`)."""
    F2 = 2 * F
    return jnp.stack(
        [dkup[:, :, kx * F2:kx * F2 + F] + dkup[:, :, kx * F2 + F:(kx + 1) * F2]
         for kx in range(3)], axis=1)


def _bwd_paired_lowres_call(g, out, y1, skip_p, x, k1, B, H2, F, Cp, Cx,
                            Cs, H, W, dt, T, E, win, hw, hsel, validx,
                            skv, rv, k2f_d, k2f_e, zf, k1s_d, k1s_e, zs,
                            interpret):
    """pallas_call + host unpack for `_bwd_kernel_paired_lowres`."""
    k1u = k1[:, :, Cs:, :].astype(dt)                # (3, 3, Cx, F)
    # kupᵀ with the duplicated [kx|kx] column blocks: one transpose +
    # concat + reshape (no slice/pad folds — the fusion-emitter-safe form)
    kt = k1u.transpose(0, 1, 3, 2)                   # (3, 3, F, Cx)
    kupt = jnp.concatenate([kt, kt], axis=2).reshape(3, 6 * F, Cx)
    colc = jnp.asarray(_lowres_col_coeffs_paired(W, F)).astype(dt)
    hw3, hs3, vl3, winp = _h_adjoint_cat_arrays(H, win)

    nb = H2 // T - 1
    nbx = H // (T // 2) - 1
    nblk = H2 // T
    grid = (B, nblk)

    def blk3(c):
        return [
            pl.BlockSpec((1, T, W, c),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W, c),
                         lambda b, i: (b, jnp.minimum(i + 1, nb), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    x_specs = [
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.minimum(i + 1, nbx), 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, H2, W, 2 * Cs), dt),
        jax.ShapeDtypeStruct((B, nblk, win, W, Cx), dt),
        jax.ShapeDtypeStruct((3, 2 * Cs, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * Cs, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, Cx, 6 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * F), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, T, W, 2 * Cs), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, win, W, Cx), lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const((3, 2 * Cs, 2 * F)), const((3, 2 * Cs, 2 * F)),
        const((3, Cx, 6 * F)),
        const((3, 2 * F, 2 * F)), const((3, 2 * F, 2 * F)),
        const((8, 2 * F)),
    )

    kernel = _bwd_kernel_paired_lowres(T, E, win, winp, Cs, Cx, F, H2, W,
                                       dt)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13
        + blk3(2 * Cs) + x_specs + blk3(2 * F) * 3,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(hw3), jnp.asarray(hs3), jnp.asarray(vl3),
      jnp.asarray(skv).astype(dt), jnp.asarray(rv).astype(dt), colc,
      k2f_d, k2f_e, zf, k1s_d, k1s_e, zs, kupt,
      skip_p, skip_p, skip_p, x, x, x, g, g, g, out, out, out, y1, y1, y1)
    dsk, dxp, dkd1, dke1, dkup, dkd2, dke2, dbs = res

    dx = _overlap_add_windows(dxp, B, H, W, Cx, T, win, dt, interpret)

    dk1s = _unpair_wgrad(dkd1, dke1, (3, 3, Cs, F), Cs, F)
    dk1u = _unpack_wgrad_up_paired(dkup, Cx, F)
    dk1 = jnp.concatenate([dk1s, dk1u], axis=2)      # (3, 3, Cp, F)
    dk2 = _unpair_wgrad(dkd2, dke2, (3, 3, F, F), F, F)
    db1 = dbs[0, :F] + dbs[0, F:]
    db2 = dbs[1, :F] + dbs[1, F:]
    return dsk, dx, dk1, db1, dk2, db2


# ---------------------------------------------------------------------------
# Wide (F >= 128) training backward — the up2/up3 stages.
#
# With up1 + the stem + the loss fused, the up2/up3 training regions were
# the largest remaining XLA cost (~18 ms/step for up2 at 512px/bs8: the
# cc concat+pad fusions, conv dgrad/wgrad fusions, and ~5 ms/step of
# {3,2,1,0}<->{3,0,2,1} relayouts at the Pallas boundary).  This kernel
# mirrors the v2 paired backward but speaks the PLANE-paired [E|O]
# layout of `_conv_rows_wide` (decoder_fuse.py): natural cotangents are
# folded to planes in-register (F=128+: one cheap pair fold, not the
# f32 interleave), every conv runs dense + two full-lane edges (zero
# FLOP overhead at F >= 128), both weight gradients accumulate
# in-kernel, and the upsample transpose reuses the v2 adjoint helpers —
# the dgrad conv emits dups ALREADY as the [E|O] planes
# `_w_expand_adjoint` consumes.
# ---------------------------------------------------------------------------

from tpu_unet.kernels.decoder_fuse import (_col_arrays as _col_arrays2,
                                           _conv_rows_wide, _pair_weights_eo)


def _unpack_wgrad_eo(dkd, dkeo, dkee, k_shape):
    """Exact adjoint of `_pair_weights_eo`: plane-paired weight cotangents
    back to the natural (3, 3, C, F) tensor.

    Written as explicit slices + one stack (not jax.linear_transpose):
    the transpose-emitted pad(slice(...)) chains canonicalize to
    negative-pad fusions the TPU fusion emitter crashes on
    (fusion_emitter.cc pad_low check) when they fuse into the optimizer
    update."""
    C, F = k_shape[2], k_shape[3]
    dkx1 = dkd[:, :C, :F] + dkd[:, C:, F:]
    dkx0 = dkd[:, :C, F:] + dkeo
    dkx2 = dkd[:, C:, :F] + dkee
    return jnp.stack([dkx0, dkx1, dkx2], axis=1)


def _h_adjoint_rows_ky(dh2d, hwc, hselc, validc, R, win, off):
    """Adjoint of the H-axis ×2 lerp for R output rows whose E-row
    indices are ``off + t`` (t in [0, R)): dx_win = Lᵀ @ dh2d with
    L (R, win) rebuilt in-register as `_h_upsample_mxu` builds it.
    ``dh2d`` is (R, W·C) 2D; returns (win, W·C) f32."""
    ein = jax.lax.broadcasted_iota(jnp.int32, (R, win), 0) + off
    li = jax.lax.broadcasted_iota(jnp.int32, (R, win), 1)

    def row_coeff(c):
        if c.shape[1] >= win:
            return c[off:off + R, :win].astype(jnp.float32)
        return jnp.broadcast_to(c[off:off + R, :1],
                                (R, win)).astype(jnp.float32)

    hw_t, hsel_t, valid_t = row_coeff(hwc), row_coeff(hselc), row_coeff(validc)
    lo_i = jnp.where(hsel_t != 0.0, (ein + 2) // 2, ein // 2)
    aw = valid_t - hw_t
    L = (jnp.where(li == lo_i, aw, 0.0)
         + jnp.where(li == lo_i + 1, hw_t, 0.0))
    return jax.lax.dot_general(
        L, dh2d,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _w_comb_adjoint(du, colc, F):
    """Adjoint of the low-res W-combination (`_wide_kernel_lowres`):
    given du (R, W, 2F) = [d(even-out) | d(odd-out)], returns
    dp_cat (R, W, 3F) = [dp0 | dp1 | dp2] (f32).  colc is the same
    (8, W, F) coefficient stack the forward used."""
    a0, b0, c1, d1, e0, f0, e2, f2 = [colc[k][None] for k in range(8)]
    due = du[:, :, :F].astype(jnp.float32)
    duo = du[:, :, F:].astype(jnp.float32)
    sp = lambda v: _shift_cols_zero(v, 1)    # adjoint of shift(·, -1)
    sm = lambda v: _shift_cols_zero(v, -1)   # adjoint of shift(·, +1)
    dp0 = sp(a0 * due) + b0 * due + sp(c1 * duo) + d1 * duo
    dp1 = sp(c1 * due) + d1 * due + e0 * duo + sm(f0 * duo)
    dp2 = e0 * due + sm(f0 * due) + e2 * duo + sm(f2 * duo)
    return jnp.concatenate([dp0, dp1, dp2], axis=-1)


def _bwd_kernel_wide_lowres(T, E, win, winp, Cs, Cx, F, H2, W, dt):
    """`_bwd_kernel_wide` with the LOW-RES up path: the dup→dx chain and
    conv1's up-half weight gradient run against the raw low-res x window
    through the same commutation the forward uses — dgrad:
    dx = Σ_ky Wcombᵀ(Hlerpᵀ(dz1)) @ kupᵀ; wgrad: dkup[ky] = xsᵀ @
    dp_ky(center rows).  The full-res upsample recompute (cc's up
    planes) disappears entirely."""
    def kernel(hw3, hs3, vl3, skv, rv, colc,
               k2fd, k2feo, k2fee, zf,
               k1sd, k1seo, k1see, zs,
               kupt,
               sk_p, sk_m, sk_n, x_l, x_m, x_h,
               g_p, g_m, g_n, o_p, o_m, o_n, y_p, y_m, y_n,
               dsk_ref, dxp_ref, dkd1_ref, dkeo1_ref, dkee1_ref,
               dkup_ref, dkd2_ref, dkeo2_ref, dkee2_ref, db_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * T

        @pl.when((b == 0) & (i == 0))
        def _():
            dkd1_ref[...] = jnp.zeros_like(dkd1_ref)
            dkeo1_ref[...] = jnp.zeros_like(dkeo1_ref)
            dkee1_ref[...] = jnp.zeros_like(dkee1_ref)
            dkup_ref[...] = jnp.zeros_like(dkup_ref)
            dkd2_ref[...] = jnp.zeros_like(dkd2_ref)
            dkeo2_ref[...] = jnp.zeros_like(dkeo2_ref)
            dkee2_ref[...] = jnp.zeros_like(dkee2_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def win3(p, m, n):
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        def fold(a, c):
            return a.reshape(a.shape[0], W, 2 * c)

        rva = rv[pl.ds(r0, T + 4)]
        rvw = rva[:, None, :]
        gw = fold(win3(g_p, g_m, g_n), F) * rvw
        ow = fold(win3(o_p, o_m, o_n), F)
        yw = win3(y_p, y_m, y_n) * rvw          # y1 saved paired already
        g2 = jnp.where(ow.astype(jnp.float32) > 0.0, gw,
                       jnp.zeros_like(gw))
        dz1 = _conv_rows_wide(g2, T + 2, k2fd, k2feo, k2fee, zf, dt,
                              relu=False)
        dz1 = jnp.where(yw[1:T + 3].astype(jnp.float32) > 0.0, dz1,
                        jnp.zeros_like(dz1))
        dz1 = dz1 * rva[1:T + 3][:, None, :]

        dsk_p = _conv_rows_wide(dz1, T, k1sd, k1seo, k1see, zs, dt,
                                relu=False)     # (T, W, 2Cs) [E|O]
        dE, dO = dsk_p[:, :, :Cs], dsk_p[:, :, Cs:]
        st = jnp.concatenate([dE[:, :, None], dO[:, :, None]], axis=2)
        dsk_ref[0] = st.reshape(T, 2 * W, Cs)

        # ---- LOW-RES up path: dx + conv1's up-half wgrad ----
        # only the T CENTER y1-row cotangents contribute (the halo rows
        # are the neighbouring tiles' center rows — overlap-added there)
        dz2dc = dz1.astype(jnp.float32)[1:T + 1].reshape(T, W * 2 * F)

        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        ducat = _h_adjoint_rows_cat(dz2dc, hw3[pl.ds(r0, T)],
                                    hs3[pl.ds(r0, T)], vl3[pl.ds(r0, T)],
                                    T, win, winp)
        dxs = None
        for ky in range(3):
            duc = ducat[ky * winp:ky * winp + win].reshape(win, W, 2 * F)
            dpc = _w_comb_adjoint(duc, colc, F).astype(dt)
            t = _mm(dpc, kupt[ky])                    # (win, W, Cx) f32
            dxs = t if dxs is None else dxs + t
            dkup_ref[ky] += _mmT(xs, dpc)             # (Cx, 3F)
        dxp_ref[0, 0] = dxs.astype(dt)

        # ---- conv2 wgrads: src = y1 window, dout = g2 center rows ----
        g2c = g2[2:T + 2]
        gE, gO = g2c[:, :, :F], g2c[:, :, F:]
        d_eo2 = _shift_cols_zero(gE, 1)
        d_ee2 = _shift_cols_zero(gO, -1)
        dkd2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], g2c) for ky in (0, 1, 2)])
        dkeo2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T, :, F:], d_eo2) for ky in (0, 1, 2)])
        dkee2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T, :, :F], d_ee2) for ky in (0, 1, 2)])

        # ---- conv1's SKIP-half wgrads: src = skip planes ----
        sk = win3(sk_p, sk_m, sk_n)
        sk = sk * skv[pl.ds(r0, T + 4)][:, None, :]
        skf = fold(sk, Cs)                           # (T+4, W, 2Cs)
        dz1c = dz1[1:T + 1]
        zE, zO = dz1c[:, :, :F], dz1c[:, :, F:]
        d_eo1 = _shift_cols_zero(zE, 1)
        d_ee1 = _shift_cols_zero(zO, -1)
        dkd1_ref[...] += jnp.stack(
            [_mmT(skf[1 + ky:1 + ky + T], dz1c) for ky in (0, 1, 2)])
        dkeo1_ref[...] += jnp.stack(
            [_mmT(skf[1 + ky:1 + ky + T, :, Cs:], d_eo1)
             for ky in (0, 1, 2)])
        dkee1_ref[...] += jnp.stack(
            [_mmT(skf[1 + ky:1 + ky + T, :, :Cs], d_ee1)
             for ky in (0, 1, 2)])

        dbs = jnp.concatenate([
            jnp.sum(dz1c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
            jnp.sum(g2c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
        ], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 2), (0, 0)))

    return kernel


def _bwd_kernel_wide(T, E, win, Cs, Cx, F, H2, W, dt):
    Cp = Cs + Cx

    def kernel(hw, hsel, validx, skv, rv, we, wo,
               k2fd, k2feo, k2fee, zf,
               k1sd, k1seo, k1see, zs,
               k1ud, k1ueo, k1uee, zu,
               sk_p, sk_m, sk_n, x_l, x_m, x_h,
               g_p, g_m, g_n, o_p, o_m, o_n, y_p, y_m, y_n,
               dsk_ref, dxp_ref, dkd1_ref, dkeo1_ref, dkee1_ref,
               dkd2_ref, dkeo2_ref, dkee2_ref, db_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * T

        @pl.when((b == 0) & (i == 0))
        def _():
            dkd1_ref[...] = jnp.zeros_like(dkd1_ref)
            dkeo1_ref[...] = jnp.zeros_like(dkeo1_ref)
            dkee1_ref[...] = jnp.zeros_like(dkee1_ref)
            dkd2_ref[...] = jnp.zeros_like(dkd2_ref)
            dkeo2_ref[...] = jnp.zeros_like(dkeo2_ref)
            dkee2_ref[...] = jnp.zeros_like(dkee2_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def win3(p, m, n):
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        def fold(a, c):
            # natural (R, W2, c) -> plane-paired (R, W, 2c)
            return a.reshape(a.shape[0], W, 2 * c)

        rva = rv[pl.ds(r0, T + 4)]
        rvw = rva[:, None, :]
        gw = fold(win3(g_p, g_m, g_n), F) * rvw
        ow = fold(win3(o_p, o_m, o_n), F)
        yw = win3(y_p, y_m, y_n) * rvw          # y1 saved paired already
        g2 = jnp.where(ow.astype(jnp.float32) > 0.0, gw,
                       jnp.zeros_like(gw))
        dz1 = _conv_rows_wide(g2, T + 2, k2fd, k2feo, k2fee, zf, dt,
                              relu=False)
        dz1 = jnp.where(yw[1:T + 3].astype(jnp.float32) > 0.0, dz1,
                        jnp.zeros_like(dz1))
        dz1 = dz1 * rva[1:T + 3][:, None, :]

        dsk_p = _conv_rows_wide(dz1, T, k1sd, k1seo, k1see, zs, dt,
                                relu=False)     # (T, W, 2Cs) [E|O]
        dE, dO = dsk_p[:, :, :Cs], dsk_p[:, :, Cs:]
        st = jnp.concatenate([dE[:, :, None], dO[:, :, None]], axis=2)
        dsk_ref[0] = st.reshape(T, 2 * W, Cs)

        # dups comes out ALREADY in the [E|O] planes the W-adjoint wants
        dup = _conv_rows_wide(dz1, T, k1ud, k1ueo, k1uee, zu, dt,
                              relu=False)       # (T, W, 2Cx)
        we3 = we[...].astype(jnp.float32)[None]
        wo3 = wo[...].astype(jnp.float32)[None]
        dh = _w_expand_adjoint(dup, we3, wo3, Cx, W)
        dxw = _h_adjoint_rows(dh, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                              validx[pl.ds(r0, E)], T, win, W, Cx)
        dxp_ref[0, 0] = dxw.astype(dt)

        # ---- conv2 wgrads: src = y1 window, dout = g2 center rows ----
        g2c = g2[2:T + 2]
        gE, gO = g2c[:, :, :F], g2c[:, :, F:]
        d_eo2 = _shift_cols_zero(gE, 1)
        d_ee2 = _shift_cols_zero(gO, -1)
        dkd2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], g2c) for ky in (0, 1, 2)])
        dkeo2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T, :, F:], d_eo2) for ky in (0, 1, 2)])
        dkee2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T, :, :F], d_ee2) for ky in (0, 1, 2)])

        # ---- recompute cc = [skE, upE, skO, upO] (forward's chain) ----
        sk = win3(sk_p, sk_m, sk_n)
        sk = sk * skv[pl.ds(r0, T + 4)][:, None, :]
        skf = fold(sk, Cs)
        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        h = _h_upsample_rows(xs, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                             r0, H2, E)
        h = h * validx[pl.ds(r0, E)][:, None, :]
        even, odd = _w_expand_pair(h, we[...][None], wo[...][None])
        cc = jnp.concatenate([skf[:, :, :Cs], even.astype(dt),
                              skf[:, :, Cs:], odd.astype(dt)], axis=-1)

        # ---- conv1 wgrads: src = cc, dout = dz1 center rows ----
        dz1c = dz1[1:T + 1]
        zE, zO = dz1c[:, :, :F], dz1c[:, :, F:]
        d_eo1 = _shift_cols_zero(zE, 1)
        d_ee1 = _shift_cols_zero(zO, -1)
        dkd1_ref[...] += jnp.stack(
            [_mmT(cc[1 + ky:1 + ky + T], dz1c) for ky in (0, 1, 2)])
        dkeo1_ref[...] += jnp.stack(
            [_mmT(cc[1 + ky:1 + ky + T, :, Cp:], d_eo1) for ky in (0, 1, 2)])
        dkee1_ref[...] += jnp.stack(
            [_mmT(cc[1 + ky:1 + ky + T, :, :Cp], d_ee1) for ky in (0, 1, 2)])

        dbs = jnp.concatenate([
            jnp.sum(dz1c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
            jnp.sum(g2c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
        ], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 2), (0, 0)))

    return kernel


def _repack_wgrad(dkd, dkeo, dkee, dkup, Cs, Cx, F, interpret):
    """Unpack the plane-paired weight-gradient accumulators into the
    natural (3, 3, Cs+Cx, F) tensor as ONE Pallas pass.

    Inputs: dkd (3, 2Cs, 2F), dkeo/dkee (3, Cs, F) — the
    `_pair_weights_eo` cotangents for the skip channels — and optionally
    dkup (3, Cx, 3F), the low-res up-half gradient whose lane blocks are
    the per-kx slices.  A custom call is an opaque fusion boundary, so
    none of this lands in the grad/optimizer fusions (see the caller's
    note on the fusion-emitter crash)."""
    Cp = Cs + Cx

    def kernel(*refs):
        if dkup is not None:
            dkd_r, dkeo_r, dkee_r, dkup_r, out_ref = refs
        else:
            dkd_r, dkeo_r, dkee_r, out_ref = refs
        d = dkd_r[...]
        dkx1 = d[:, :Cs, :F] + d[:, Cs:, F:]
        dkx0 = d[:, :Cs, F:] + dkeo_r[...]
        dkx2 = d[:, Cs:, :F] + dkee_r[...]
        out_ref[:, 0, :Cs] = dkx0
        out_ref[:, 1, :Cs] = dkx1
        out_ref[:, 2, :Cs] = dkx2
        if dkup is not None:
            u = dkup_r[...]
            for kx in range(3):
                out_ref[:, kx, Cs:] = u[:, :, kx * F:(kx + 1) * F]

    args = [dkd, dkeo, dkee] + ([dkup] if dkup is not None else [])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, 3, Cp, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _overlap_add_jnp(dxp, B, H, W, Cx, T, dt, nblk):
    """jnp overlap-add of the per-tile dx windows — kept for the deepest
    wide stage (F = 512), whose backward kernel sits within 0.3 MB of the
    scoped-VMEM cap: routing dxp through another Pallas consumer nudges
    its operand staging over the limit.  The pad+add fusions are cheap at
    that stage's 64² resolution (~0.05 ms/step)."""
    half = T // 2
    dx = dxp[:, :, 2:2 + half].reshape(B, H, W, Cx)
    if nblk > 1:
        zlo = jnp.concatenate(
            [jnp.zeros((B, nblk - 1, half - 2, W, Cx), dt),
             dxp[:, 1:, 0:2]], axis=2).reshape(B, H - half, W, Cx)
        dx = dx + jnp.pad(zlo, ((0, 0), (0, half), (0, 0), (0, 0)))
        zhi = jnp.concatenate(
            [dxp[:, :-1, 2 + half:4 + half],
             jnp.zeros((B, nblk - 1, half - 2, W, Cx), dt)],
            axis=2).reshape(B, H - half, W, Cx)
        dx = dx + jnp.pad(zhi, ((0, 0), (half, 0), (0, 0), (0, 0)))
    return dx


def _overlap_add_windows(dxp, B, H, W, Cx, T, win, dt, interpret):
    """Overlap-add the per-tile dx windows (B, nblk, win, W, Cx) into
    (B, H, W, Cx) as one tiny Pallas pass.  The jnp slice+pad+add
    composition canonicalizes to negative pads inside XLA fusions, which
    the TPU fusion emitter rejects (fusion_emitter.cc pad_low check) —
    in-kernel the window arithmetic is just clamped block reads."""
    half = T // 2
    nblk = dxp.shape[1]

    def kernel(w_p, w_m, w_n, dx_ref):
        i = pl.program_id(1)
        c = w_m[0, 0, 2:2 + half].astype(jnp.float32)
        lo = w_p[0, 0, 2 + half:4 + half].astype(jnp.float32)
        hi = w_n[0, 0, 0:2].astype(jnp.float32)
        z2 = jnp.zeros((half - 2,) + lo.shape[1:], jnp.float32)
        add_lo = jnp.where(i > 0, jnp.concatenate([lo, z2], axis=0), 0.0)
        add_hi = jnp.where(i < nblk - 1,
                           jnp.concatenate([z2, hi], axis=0), 0.0)
        dx_ref[0] = (c + add_lo + add_hi).astype(dt)

    specs = [
        pl.BlockSpec((1, 1, win, W, Cx),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, win, W, Cx), lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, win, W, Cx),
                     lambda b, i: (b, jnp.minimum(i + 1, nblk - 1), 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cx), dt),
        grid=(B, nblk),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, half, W, Cx),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(dxp, dxp, dxp)


def _bwd_wide_lowres_call(g, out, y1p, skip, x, k1, B, H2, W2, F, Cp, Cx,
                          Cs, H, W, dt, T, E, win, hw, hsel, validx, skv,
                          rv, k2fd, k2feo, k2fee, zf, k1sd, k1seo, k1see,
                          zs, interpret):
    """pallas_call + host unpack for `_bwd_kernel_wide_lowres`."""
    from tpu_unet.kernels.decoder_fuse import _lowres_col_coeffs

    k1u = k1[:, :, Cs:, :].astype(dt)                # (3, 3, Cx, F)
    # (3, 3F, Cx) with rows [kx*F + f] = k1u[ky, kx, :, f].  Written as a
    # single transpose+reshape: the equivalent per-kx slice/concat/.T
    # chain fuses into a backend window op with negative low padding that
    # the TPU fusion emitter rejects (fusion_emitter.cc:4272 pad_low
    # check) — this form never creates that fold.
    kupt = k1u.transpose(0, 1, 3, 2).reshape(3, 3 * F, Cx)
    colc = jnp.asarray(_lowres_col_coeffs(W, F)).astype(dt)

    nb = H2 // T - 1
    nbx = H // (T // 2) - 1
    nblk = H2 // T
    grid = (B, nblk)

    def blk3(c, paired_cols=False):
        wdim = W if paired_cols else W2
        return [
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.minimum(i + 1, nb), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    x_specs = [
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.minimum(i + 1, nbx), 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, H2, W2, Cs), dt),
        jax.ShapeDtypeStruct((B, nblk, win, W, Cx), dt),
        jax.ShapeDtypeStruct((3, 2 * Cs, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, Cs, F), jnp.float32),
        jax.ShapeDtypeStruct((3, Cs, F), jnp.float32),
        jax.ShapeDtypeStruct((3, Cx, 3 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * F), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, T, W2, Cs), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, win, W, Cx), lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const((3, 2 * Cs, 2 * F)), const((3, Cs, F)), const((3, Cs, F)),
        const((3, Cx, 3 * F)),
        const((3, 2 * F, 2 * F)), const((3, F, F)), const((3, F, F)),
        const((8, 2 * F)),
    )

    hw3, hs3, vl3, winp = _h_adjoint_cat_arrays(H, win)
    kernel = _bwd_kernel_wide_lowres(T, E, win, winp, Cs, Cx, F, H2, W, dt)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15
        + blk3(Cs) + x_specs + blk3(F) * 2 + blk3(2 * F, paired_cols=True),
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(hw3), jnp.asarray(hs3), jnp.asarray(vl3),
      jnp.asarray(skv).astype(dt), jnp.asarray(rv).astype(dt), colc,
      k2fd, k2feo, k2fee, zf, k1sd, k1seo, k1see, zs, kupt,
      skip, skip, skip, x, x, x, g, g, g, out, out, out, y1p, y1p, y1p)
    (dsk, dxp, dkd1, dkeo1, dkee1, dkup, dkd2, dkeo2, dkee2, dbs) = res

    dx = _overlap_add_windows(dxp, B, H, W, Cx, T, win, dt, interpret)

    # the wgrad repacks run as Pallas passes: composed as jnp ops they
    # fuse into the surrounding grad graph, where XLA's simplifier
    # canonicalizes the slice/pad chains into negative-pad fusions the
    # TPU fusion emitter rejects (fusion_emitter.cc pad_low check)
    dk1 = _repack_wgrad(dkd1, dkeo1, dkee1, dkup, Cs, Cx, F, interpret)
    dk2 = _repack_wgrad(dkd2, dkeo2, dkee2, None, F, 0, F, interpret)
    db1 = dbs[0, :F] + dbs[0, F:]
    db2 = dbs[1, :F] + dbs[1, F:]
    return dsk, dx, dk1, db1, dk2, db2


def fused_unetup_bwd_wide_impl(g, out, y1p, skip, x, k1, k2, Cs,
                               block_rows=None):
    """Wide (F >= 128) backward for one decoder stage.

    ``g``/``out``/``skip`` arrive NATURAL; ``y1p`` arrives plane-paired
    (B, H2, W, 2F) as saved by the wide forward; ``x`` natural.  Returns
    (dskip natural, dx natural, dk1, db1, dk2, db2) or None when the
    stage isn't tileable."""
    from tpu_unet.core import fusion

    B, H2, W2, F = g.shape
    Cp = k1.shape[2]
    Cx = Cp - Cs
    _, H, W, _ = x.shape
    dt = g.dtype
    ok = (F % 128 == 0 and Cs % 128 == 0 and Cx % 128 == 0
          and W2 == 2 * W and W % 2 == 0)
    if not ok:
        return None
    lowres = fusion.use_lowres_bwd()
    # Per-stage defaults from the round-3 v5e profile (512px/bs8,
    # ms/step): F=128 full-res 9.05 vs lowres 9.29; F=256 lowres 7.14 vs
    # full-res 8.09; F=512 full-res 5.85 vs lowres 6.42 (the T=8 tiles
    # the F=512 variant needs for VMEM cost more than the FLOP cut
    # saves).  Env overrides keep the other combinations reachable.
    if lowres and F > 256 and os.environ.get(
            "TPU_UNET_LOWRES_BWD_DEEP", "0").lower() in ("0", "false",
                                                         "off"):
        lowres = False
    if lowres and F < 256 and os.environ.get(
            "TPU_UNET_LOWRES_BWD_SHALLOW", "0").lower() in ("0", "false",
                                                            "off"):
        lowres = False
    # The low-res variant carries the (3, Cx, 3F) up-half weight + wgrad
    # blocks resident in VMEM on top of the paired set; at F=512 the
    # deepest stage's scoped demand exceeds the 100 MB budget by ~1 MB
    # at T=16 no matter the limit (Mosaic sizes its buffering up to
    # whatever cap it is given), so that stage drops to T=8 row tiles —
    # the weight/wgrad residency is T-invariant, the ~33 MB of row
    # blocks halve, and the kernel is T-parametric (grad-exact at T=8,
    # tests/test_decoder_train.py).
    T = block_rows or (8 if (lowres and F > 256 and H2 % 8 == 0)
                       else (16 if H2 % 16 == 0 else 8))
    if H2 % T or T < 8 or H % (T // 2):
        return None
    E = T + 4
    win = T // 2 + 4

    interpret = jax.default_backend() == "cpu"

    hw, hsel, valid = _row_arrays(H)
    we, wo = _col_arrays(W)
    hw = np.repeat(hw, Cx, axis=1)
    hsel = np.repeat(hsel, Cx, axis=1)
    validx = np.repeat(valid, Cx, axis=1)
    we = np.repeat(we, Cx, axis=1)
    wo = np.repeat(wo, Cx, axis=1)
    rs = np.arange(-2, H2 + 2)
    inimg = ((rs >= 0) & (rs < H2)).astype(np.float32).reshape(-1, 1)
    skv = np.repeat(inimg, Cs, axis=1)
    rv = np.repeat(inimg, 2 * F, axis=1)

    k2fd, k2feo, k2fee = _pair_weights_eo(_flip_t(k2).astype(dt))
    k1f = _flip_t(k1).astype(dt)                     # (3, 3, F, Cp)
    k1sd, k1seo, k1see = _pair_weights_eo(k1f[..., :Cs])
    k1ud, k1ueo, k1uee = _pair_weights_eo(k1f[..., Cs:])
    zf = jnp.zeros((2 * F,), dt)
    zs = jnp.zeros((2 * Cs,), dt)
    zu = jnp.zeros((2 * Cx,), dt)

    if lowres:
        return _bwd_wide_lowres_call(
            g, out, y1p, skip, x, k1, B, H2, W2, F, Cp, Cx, Cs, H, W, dt,
            T, E, win, hw, hsel, validx, skv, rv,
            k2fd, k2feo, k2fee, zf, k1sd, k1seo, k1see, zs, interpret)

    nb = H2 // T - 1
    nbx = H // (T // 2) - 1
    nblk = H2 // T
    grid = (B, nblk)

    def blk3(c, paired_cols=False):
        wdim = W if paired_cols else W2
        return [
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.minimum(i + 1, nb), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    x_specs = [
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, Cx),
                     lambda b, i: (b, jnp.minimum(i + 1, nbx), 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, H2, W2, Cs), dt),
        jax.ShapeDtypeStruct((B, nblk, win, W, Cx), dt),
        jax.ShapeDtypeStruct((3, 2 * Cp, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, Cp, F), jnp.float32),
        jax.ShapeDtypeStruct((3, Cp, F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * F), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, T, W2, Cs), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, win, W, Cx), lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const((3, 2 * Cp, 2 * F)), const((3, Cp, F)), const((3, Cp, F)),
        const((3, 2 * F, 2 * F)), const((3, F, F)), const((3, F, F)),
        const((8, 2 * F)),
    )

    kernel = _bwd_kernel_wide(T, E, win, Cs, Cx, F, H2, W, dt)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 19
        + blk3(Cs) + x_specs + blk3(F) * 2 + blk3(2 * F, paired_cols=True),
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 114 MB: the F=512 stage needs ~103 MB at T=16, ~108 MB
            # once the surrounding stages run their low-res backwards
            # (operand staging changes at the Pallas boundaries), and
            # ~111.1 MB at batch 16; v5e has 128 MB physical VMEM
            vmem_limit_bytes=114 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(hw).astype(dt), jnp.asarray(hsel).astype(dt),
      jnp.asarray(validx).astype(dt), jnp.asarray(skv).astype(dt),
      jnp.asarray(rv).astype(dt),
      jnp.asarray(we).astype(dt), jnp.asarray(wo).astype(dt),
      k2fd, k2feo, k2fee, zf, k1sd, k1seo, k1see, zs, k1ud, k1ueo, k1uee, zu,
      skip, skip, skip, x, x, x, g, g, g, out, out, out, y1p, y1p, y1p)
    (dsk, dxp, dkd1, dkeo1, dkee1, dkd2, dkeo2, dkee2, dbs) = res

    # overlap-add as one Pallas pass for F < 512 (see _overlap_add_jnp
    # for why the deepest stage keeps the jnp composition)
    if F < 512:
        dx = _overlap_add_windows(dxp, B, H, W, Cx, T, win, dt, interpret)
    else:
        dx = _overlap_add_jnp(dxp, B, H, W, Cx, T, dt, nblk)

    dk1 = _unpack_wgrad_eo(dkd1, dkeo1, dkee1, (3, 3, Cp, F))
    dk2 = _unpack_wgrad_eo(dkd2, dkeo2, dkee2, (3, 3, F, F))
    db1 = dbs[0, :F] + dbs[0, F:]
    db2 = dbs[1, :F] + dbs[1, F:]
    return dsk, dx, dk1, db1, dk2, db2
