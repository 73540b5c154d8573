"""Training VJP for the fused VGG stem (kernels/stem.py).

Round-3 train-step profiling (512px, batch 8, VGG16-UNet, ~111 ms/step
after the paired decoder region landed) showed the encoder's block-1
backward as the next-largest region: the conv1_2 dgrad+bias fusion
(~3.2 ms, 37% MXU at 64 channels), the conv1_1 relu-mask/wgrad fusions
(~3.0 + 1.1 ms), the relu-mask pass (~2.6 ms), the 2×2 maxpool
select-and-scatter (~1.8 ms), and the relayout copies at the paired
decoder boundary (~2.8 ms) — all at 512² resolution.

This module runs that whole region as ONE Pallas pass per row tile, in
the column-PAIRED layout end-to-end:

    dfeat = dskip (paired, straight from the paired decoder backward)
          + unpool(dpool)              (first-max routing, recomputed)
    dz2   = dfeat ⊙ [y2 > 0]           (conv1_2 relu VJP)
    da1   = conv(dz2, flipT(k12))      (dgrad as a paired conv, full MXU)
    dz1   = da1 ⊙ [a1 > 0]             (conv1_1 relu VJP)
    dk12  += a1-windowᵀ @ dz2          (paired dense+edge wgrad)
    dk11  += im2col(x)ᵀ @ dz1          (one K=128 wgrad matmul)
    db11/db12 += row sums

The image cotangent is NOT computed: `fused_vgg_stem_train` is built for
the training step, which differentiates w.r.t. parameters only — its VJP
returns a symbolic zero for ``x``.  (The untileable-shape fallback path
differentiates the XLA reference and is exact in all arguments.)

First-max pool routing matches XLA's select-and-scatter exactly: the 2×2
window is scanned in row-major order ((2r,2c), (2r,2c+1), (2r+1,2c),
(2r+1,2c+1)) and the gradient goes to the first element equal to the max.

Reference semantics: autodiff of nets/vgg.py:26-31 features[0:4] + the
stage-2 entry maxpool.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import (_conv_rows, _pair_weights,
                                           _shift_cols_zero)
from tpu_unet.kernels.decoder_train import (_edge_cotangent, _flip_t, _mmT,
                                            _unpair_wgrad)
from tpu_unet.kernels.stem import (_T, _pack_conv1_weights,
                                   fused_vgg_stem_impl, reference_vgg_stem)


def _stem_bwd_kernel(Wp, F, H, dt, lane_roll, nb, T):
    H2F = 2 * F

    def kernel(vcc, k12fd, k12fe, zf,
               x_l, x_m, x_t,
               ds_p, ds_m, ds_n, y_p, y_m, y_n, a_p, a_m, a_n,
               dp_p, dp_m, dp_n,
               dk11p_ref, dkd12_ref, dke12_ref, db_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * T

        @pl.when((b == 0) & (i == 0))
        def _():
            dk11p_ref[...] = jnp.zeros_like(dk11p_ref)
            dkd12_ref[...] = jnp.zeros_like(dkd12_ref)
            dke12_ref[...] = jnp.zeros_like(dke12_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def win3(p, m, n):
            # rows r0-2 .. r0+T+2 from three row-clamped T-blocks
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        # feat-row validity for the T+4 window (boundary clamps are
        # duplicates, not the zeros SAME padding implies)
        lrow = jax.lax.broadcasted_iota(jnp.int32, (T + 4, 1, 1), 0)
        okf = jnp.where((lrow < 2) & (i == 0), 0.0, 1.0)
        okf = jnp.where((lrow >= T + 2) & (i == nb - 1), 0.0, okf)

        dsw = win3(ds_p, ds_m, ds_n) * okf.astype(dt)
        yw = win3(y_p, y_m, y_n) * okf.astype(dt)
        aw = win3(a_p, a_m, a_n) * okf.astype(dt)

        # ---- maxpool backward: first-max routing, recomputed from y2 ----
        # pool window rows q0-1 .. q0+T/2+1 from three (T/2)-blocks
        dp4 = jnp.concatenate([dp_p[0], dp_m[0], dp_n[0]],
                              axis=0)[T // 2 - 1:T + 1]          # (T/2+2,Wp,F)
        lp = jax.lax.broadcasted_iota(jnp.int32, (T // 2 + 2, 1, 1), 0)
        dp4 = jnp.where((lp == 0) & (i == 0), 0.0, dp4)
        dp4 = jnp.where((lp == T // 2 + 1) & (i == nb - 1), 0.0, dp4)
        dp4 = dp4.astype(jnp.float32)

        y4 = yw.reshape(T // 2 + 2, 2, Wp, H2F)
        ye = y4[:, 0].astype(jnp.float32)
        yo = y4[:, 1].astype(jnp.float32)
        c1 = ye[:, :, :F]
        c2 = lane_roll(ye, F)[:, :, :F]
        c3 = yo[:, :, :F]
        c4 = lane_roll(yo, F)[:, :, :F]
        m = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
        f1 = jnp.where(c1 == m, 1.0, 0.0)
        f2 = jnp.where(c2 == m, 1.0, 0.0) * (1.0 - f1)
        f3 = jnp.where(c3 == m, 1.0, 0.0) * (1.0 - f1) * (1.0 - f2)
        f4 = (jnp.where(c4 == m, 1.0, 0.0)
              * (1.0 - f1) * (1.0 - f2) * (1.0 - f3))
        de = jnp.concatenate([dp4 * f1, dp4 * f2], axis=-1)
        do = jnp.concatenate([dp4 * f3, dp4 * f4], axis=-1)
        dpool_feat = jnp.concatenate(
            [de[:, None], do[:, None]], axis=1).reshape(T + 4, Wp, H2F)

        dfeat = (dsw.astype(jnp.float32) + dpool_feat) * okf
        # relu VJP for conv1_2 (compares in f32 — no packed-bf16 compare)
        dz2 = jnp.where(yw.astype(jnp.float32) > 0.0, dfeat,
                        jnp.zeros_like(dfeat)).astype(dt)       # (T+4,Wp,2F)

        # ---- dgrad to a1 (paired conv, full-lane matmuls) ----
        da1 = _conv_rows(dz2, T + 2, k12fd, k12fe, zf, dt, relu=False)
        dz1 = jnp.where(aw[1:T + 3].astype(jnp.float32) > 0.0, da1,
                        jnp.zeros_like(da1))                    # (T+2,Wp,2F)

        # ---- conv1_2 wgrad: src = a1 window, dout = dz2 center rows ----
        dz2c = dz2[2:T + 2]
        sh2 = _edge_cotangent(dz2c)
        dkd12_ref[...] += jnp.stack(
            [_mmT(aw[1 + ky:1 + ky + T], dz2c) for ky in (0, 1, 2)])
        dke12_ref[...] += jnp.stack(
            [_mmT(aw[1 + ky:1 + ky + T], sh2) for ky in (0, 1, 2)])

        # ---- conv1_1 wgrad: src = im2col(x) center rows, dout = dz1 ----
        xs = jnp.concatenate([x_l[0], x_m[0], x_t[0]], axis=0)  # (T+4,Wp,6)
        views = []
        for ky in range(3):
            rows = xs[1 + ky:1 + ky + T]
            for d in (-1, 0, 1):
                views.append(_shift_cols_zero(rows, d))
        views.append(jnp.zeros((T, Wp, 128 - 54), xs.dtype))
        cc = jnp.concatenate(views, axis=-1)                    # (T, Wp, 128)
        vc = vcc[pl.ds(r0, T + 2)][1:T + 1]
        cc = cc * vc[:, None, :]
        dz1c = dz1[1:T + 1]
        dk11p_ref[...] += jax.lax.dot_general(
            cc.reshape(T * Wp, 128), dz1c.reshape(T * Wp, H2F),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        dbs = jnp.concatenate([
            jnp.sum(dz1c.astype(jnp.float32), axis=(0, 1)).reshape(1, H2F),
            jnp.sum(dz2c.astype(jnp.float32), axis=(0, 1)).reshape(1, H2F),
        ], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 2), (0, 0)))

    return kernel


def fused_vgg_stem_bwd_impl(dskip_p, dpool, y2_p, a1_p, x, k12):
    """One-pass stem backward.  ``dskip_p``/``y2_p``/``a1_p`` arrive
    PAIRED (B, H, W/2, 2F); ``dpool`` natural (B, H/2, W/2, F); ``x`` is
    the raw normalized image (B, H, W, 3).  Returns (dk11, db11, dk12,
    db12) in natural layouts and f32, or None if untileable."""
    B, H, Wp, F2 = y2_p.shape
    F = F2 // 2
    dt = y2_p.dtype
    # T=16 row tiles: at the forward's T=8 the 4-row halo is 50% overhead
    # on every VPU pass of the backward (pool routing, relu VJPs, masks);
    # 16 quarters the fixed per-tile cost share.  (The forward keeps T=8
    # for the P8 prepad handoff convention with the decoder.)
    T = 16 if H % 32 == 0 else _T
    if H % (2 * T) or x.shape[-1] != 3 or F % 8:
        return None
    nb = H // T

    interpret = jax.default_backend() == "cpu"
    xp = x.reshape(B, H, Wp, 6)

    # same im2col row-validity array the forward uses (index = row + 1)
    q = np.arange(H + 2 * T).reshape(-1, 1)
    ky_of_lane = np.minimum(np.arange(128) // 18, 2).reshape(1, -1)
    raw_row = q - 2 + ky_of_lane
    vcc = ((raw_row >= 0) & (raw_row < H)).astype(np.float32)

    k12f_d, k12f_e = _pair_weights(_flip_t(k12).astype(dt), F, F)
    zf = jnp.zeros((2 * F,), dt)

    grid = (B, nb)

    if interpret:
        def lane_roll(yf, f):
            return jnp.concatenate([yf[..., f:], yf[..., :f]], axis=-1)
    else:
        def lane_roll(yf, f):
            return pltpu.roll(yf, f, axis=2)

    def blk3(c):
        return [
            pl.BlockSpec((1, T, Wp, c),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Wp, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Wp, c),
                         lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    half = T // 2
    nbp = (H // 2) // half
    pool_specs = [
        pl.BlockSpec((1, half, Wp, F),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, half, Wp, F), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, half, Wp, F),
                     lambda b, i: (b, jnp.minimum(i + 1, nbp - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    x_specs = [
        pl.BlockSpec((1, 2, Wp, 6),
                     lambda b, i: (b, jnp.maximum(i * half - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, Wp, 6), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, Wp, 6),
                     lambda b, i: (b, jnp.minimum((i + 1) * half,
                                                  H // 2 - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((128, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * F), jnp.float32),
    )
    out_specs = (const((128, 2 * F)), const((3, 2 * F, 2 * F)),
                 const((3, 2 * F, 2 * F)), const((8, 2 * F)))

    kernel = _stem_bwd_kernel(Wp, F, H, dt, lane_roll, nb, T)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + x_specs + blk3(2 * F) * 3 + pool_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(vcc).astype(dt), k12f_d, k12f_e, zf,
      xp, xp, xp,
      dskip_p, dskip_p, dskip_p, y2_p, y2_p, y2_p, a1_p, a1_p, a1_p,
      dpool, dpool, dpool)
    dk11p, dkd12, dke12, dbs = res

    dk11 = jax.linear_transpose(
        _pack_conv1_weights,
        jax.ShapeDtypeStruct((3, 3, 3, F), jnp.float32))(dk11p)[0]
    dk12 = _unpair_wgrad(dkd12, dke12, (3, 3, F, F), F, F)
    db11 = dbs[0, :F] + dbs[0, F:]
    db12 = dbs[1, :F] + dbs[1, F:]
    return dk11, db11, dk12, db12


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_vgg_stem_train(x, k11, b11, k12, b12):
    """Training stem: (paired skip (B, H, W/2, 2F), pooled (B, H/2, W/2, F)).

    Parameter gradients run through the one-pass Pallas backward above;
    the image cotangent is defined as ZERO (the training step never
    differentiates w.r.t. the input batch).  Do not use under
    ``jax.grad`` with respect to ``x`` — use `reference_vgg_stem`.
    """
    res = _stem_ok(x, k11) and fused_vgg_stem_impl(
        x, k11, b11, k12, b12, prepad_skip=False)
    if not res:
        return reference_vgg_stem(x, k11, b11, k12, b12)
    return res


def _stem_ok(x, k11):
    B, H, W, C = x.shape
    F = k11.shape[-1]
    return C == 3 and H % (2 * _T) == 0 and W % 4 == 0 and F % 8 == 0


def _stem_train_fwd(x, k11, b11, k12, b12):
    res = (fused_vgg_stem_impl(x, k11, b11, k12, b12, prepad_skip=False,
                               want_a1=True)
           if _stem_ok(x, k11) else None)
    if res is None:
        out = reference_vgg_stem(x, k11, b11, k12, b12)
        return out, (x, k11, b11, k12, b12, None, None, None)
    skip_p, pooled, a1 = res
    return (skip_p, pooled), (x, k11, b11, k12, b12, skip_p, pooled, a1)


def _stem_train_bwd(res, g):
    x, k11, b11, k12, b12, skip_p, pooled, a1 = res
    dskip_p, dpool = g
    if skip_p is None:
        _, vjp = jax.vjp(reference_vgg_stem, x, k11, b11, k12, b12)
        return vjp(g)
    bwd = fused_vgg_stem_bwd_impl(dskip_p.astype(skip_p.dtype),
                                  dpool.astype(pooled.dtype),
                                  skip_p, a1, x, k12)
    if bwd is None:  # untileable at bwd time — differentiate the reference
        _, vjp = jax.vjp(reference_vgg_stem, x, k11, b11, k12, b12)
        return vjp(g)
    dk11, db11, dk12, db12 = bwd
    return (jnp.zeros_like(x), dk11.astype(k11.dtype),
            db11.astype(b11.dtype), dk12.astype(k12.dtype),
            db12.astype(b12.dtype))


fused_vgg_stem_train.defvjp(_stem_train_fwd, _stem_train_bwd)
