"""Training VJP for VGG block 2 (features_5: 64→128, features_7:
128→128, + the stage-3 entry 2×2 maxpool).

With the stem, up1/up2/up3, and the loss all kernel-first, block 2 was
the shallowest remaining XLA training region: its conv/relu/pool glue
plus the two layout conversions where feat2 and its cotangent cross the
Pallas boundary (~1.1 ms per 33 MB array at 512px/bs8).  Both the
forward and the one-pass backward here speak the [E|O] plane-paired
layout end-to-end:

  fwd:  x (natural) → pair fold → conv5 (paired, combined-edge — the
        64-channel input's O plane sits at lane offset 64, which Mosaic
        cannot slice, so conv5 uses the `_pair_weights` scheme) → a5
        (paired residual, saved) → conv7 (plane-paired dense + two
        full-lane edges, zero overhead at 128 ch) → feat2
        (natural skip out) + 2×2 first-max pool (natural)

  bwd:  dfeat2 = dskip + unpool(dpool)   (first-max, recomputed)
        dz7 = dfeat2 ⊙ [feat2 > 0];  dk7/db7 in-kernel
        dz5 = conv(dz7, flipT(k7)) ⊙ [a5 > 0];  dk5/db5 in-kernel
        dx  = conv(dz5, flipT(k5))             (paired → one interleave)

Reference semantics: autodiff of nets/vgg.py features[5:9] + the pool.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import (_conv_rows, _conv_rows_wide,
                                           _pair_weights, _pair_weights_eo,
                                           _shift_cols_zero)
from tpu_unet.kernels.decoder_train import (_edge_cotangent, _flip_t, _mmT,
                                            _unpair_wgrad, _unpack_wgrad_eo)
from tpu_unet.kernels.encoder import reference_vgg_block

_T = 8


def _row_valid(i, H, n, T=_T):
    """(n, 1, 1) bool mask for global rows i*T-2 .. i*T+n-3 (an iota-based
    mask: the host-array + in-kernel ``[:, None, :]`` reshape variant hits
    Mosaic's unsupported-shape-cast at <128 lanes, e.g. C=64)."""
    lr = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    gr = i * T - 2 + lr
    return (gr >= 0) & (gr < H)


def _make_block2_fwd(W, C, F, H, dt, lane_roll):
    T = _T

    def kernel(k5d, k5e, b5p, k7d, k7eo, k7ee, b7p,
               x_p, x_m, x_n, skip_ref, pool_ref, *a5_ref):
        i = pl.program_id(1)
        v4 = _row_valid(i, H, T + 4)

        def win3(p, m, n):
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        # x arrives PRE-PAIRED (W, 2C) — the sublane→lane pair fold is an
        # XLA reshape at the boundary (Mosaic rejects the in-kernel shape
        # cast at 64 lanes)
        xp = jnp.where(v4, win3(x_p, x_m, x_n), 0)
        a5 = _conv_rows(xp, T + 2, k5d, k5e, b5p, dt)      # (T+2, W, 2F)
        a5 = jnp.where(v4[1:T + 3], a5, 0)
        if a5_ref:  # training residual, saved PAIRED [E|O]
            a5_ref[0][0] = a5[1:T + 1]
        y7 = _conv_rows_wide(a5, T, k7d, k7eo, k7ee, b7p, dt)
        yE, yO = y7[:, :, :F], y7[:, :, F:]
        st = jnp.concatenate([yE[:, :, None], yO[:, :, None]], axis=2)
        skip_ref[0] = st.reshape(T, 2 * W, F)
        yf = y7.astype(jnp.float32)
        m = jnp.maximum(yf, lane_roll(yf, F))[:, :, :F]
        pool_ref[0] = jnp.max(m.reshape(T // 2, 2, W, F), axis=1).astype(dt)

    return kernel


def _lane_roll_fn(interpret):
    if interpret:
        return lambda yf, f: jnp.concatenate(
            [yf[..., f:], yf[..., :f]], axis=-1)
    return lambda yf, f: pltpu.roll(yf, f, axis=2)


def fused_vgg_block2_fwd_impl(x, k5, b5, k7, b7, want_a5=False):
    """(B, H, W2, C) natural → (skip (B, H, W2, F), pooled
    (B, H/2, W2/2, F)[, a5 paired (B, H, W2/2, 2F)]).  None if
    untileable."""
    B, H, W2, C = x.shape
    F = k5.shape[-1]
    dt = x.dtype
    T = _T
    if H % (2 * T) or W2 % 2 or F % 128 or C % 2 or k7.shape[-1] != F:
        return None
    W = W2 // 2
    nb = H // T
    interpret = jax.default_backend() == "cpu"

    k5d, k5e = _pair_weights(k5.astype(dt), C, F)
    b5p = jnp.concatenate([b5, b5]).astype(dt)
    k7d, k7eo, k7ee = _pair_weights_eo(k7.astype(dt))
    b7p = jnp.concatenate([b7, b7]).astype(dt)
    xp = x.reshape(B, H, W, 2 * C)          # pair fold in XLA

    kernel = _make_block2_fwd(W, C, F, H, dt, _lane_roll_fn(interpret))

    def blk3(c, cols=None):
        wdim = cols or W2
        return [
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    out_shapes = [
        jax.ShapeDtypeStruct((B, H, W2, F), dt),
        jax.ShapeDtypeStruct((B, H // 2, W, F), dt),
    ]
    out_specs = [
        pl.BlockSpec((1, T, W2, F), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T // 2, W, F), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if want_a5:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, W, 2 * F), dt))
        out_specs.append(pl.BlockSpec((1, T, W, 2 * F),
                                      lambda b, i: (b, i, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + blk3(2 * C, cols=W),
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(k5d, k5e, b5p, k7d, k7eo, k7ee, b7p, xp, xp, xp)
    return res if want_a5 else (res[0], res[1])


def _block2_bwd_kernel(W, C, F, H, dt, lane_roll, nb, T):
    F2 = 2 * F

    def kernel(k7fd, k7feo, k7fee, zf, k5fd, k5fe, zc,
               x_p, x_m, x_n,
               ds_p, ds_m, ds_n, y_p, y_m, y_n, a_p, a_m, a_n,
               dp_p, dp_m, dp_n,
               dx_ref, dkd5_ref, dke5_ref, dkd7_ref, dkeo7_ref, dkee7_ref,
               db_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)


        @pl.when((b == 0) & (i == 0))
        def _():
            dkd5_ref[...] = jnp.zeros_like(dkd5_ref)
            dke5_ref[...] = jnp.zeros_like(dke5_ref)
            dkd7_ref[...] = jnp.zeros_like(dkd7_ref)
            dkeo7_ref[...] = jnp.zeros_like(dkeo7_ref)
            dkee7_ref[...] = jnp.zeros_like(dkee7_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def win3(p, m, n):
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        v4 = _row_valid(i, H, T + 4, T)
        dsw = jnp.where(v4, win3(ds_p, ds_m, ds_n).reshape(T + 4, W, F2), 0)
        yw = jnp.where(v4, win3(y_p, y_m, y_n).reshape(T + 4, W, F2), 0)
        aw = jnp.where(v4, win3(a_p, a_m, a_n), 0)  # a5 saved paired already

        # ---- maxpool backward: first-max routing, recomputed from y7 ----
        dp4 = jnp.concatenate([dp_p[0], dp_m[0], dp_n[0]],
                              axis=0)[T // 2 - 1:T + 1]     # (T/2+2, W, F)
        lp = jax.lax.broadcasted_iota(jnp.int32, (T // 2 + 2, 1, 1), 0)
        dp4 = jnp.where((lp == 0) & (i == 0), 0.0, dp4)
        dp4 = jnp.where((lp == T // 2 + 1) & (i == nb - 1), 0.0, dp4)
        dp4 = dp4.astype(jnp.float32)
        y4 = yw.reshape(T // 2 + 2, 2, W, F2)
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
            [de[:, None], do[:, None]], axis=1).reshape(T + 4, W, F2)

        dfeat = jnp.where(v4, dsw.astype(jnp.float32) + dpool_feat, 0.0)
        dz7 = jnp.where(yw.astype(jnp.float32) > 0.0, dfeat,
                        jnp.zeros_like(dfeat)).astype(dt)   # (T+4, W, 2F)

        da5 = _conv_rows_wide(dz7, T + 2, k7fd, k7feo, k7fee, zf, dt,
                              relu=False)
        dz5 = jnp.where(aw[1:T + 3].astype(jnp.float32) > 0.0, da5,
                        jnp.zeros_like(da5))
        dz5 = jnp.where(v4[1:T + 3], dz5, 0)

        # dx leaves PAIRED (W, 2C); the lane→sublane unfold is an XLA
        # reshape at the boundary
        dx_ref[0] = _conv_rows(dz5, T, k5fd, k5fe, zc, dt, relu=False)

        # ---- conv7 wgrads: src = a5 window, dout = dz7 center ----
        dz7c = dz7[2:T + 2]
        gE, gO = dz7c[:, :, :F], dz7c[:, :, F:]
        d_eo7 = _shift_cols_zero(gE, 1)
        d_ee7 = _shift_cols_zero(gO, -1)
        dkd7_ref[...] += jnp.stack(
            [_mmT(aw[1 + ky:1 + ky + T], dz7c) for ky in (0, 1, 2)])
        dkeo7_ref[...] += jnp.stack(
            [_mmT(aw[1 + ky:1 + ky + T, :, F:], d_eo7) for ky in (0, 1, 2)])
        dkee7_ref[...] += jnp.stack(
            [_mmT(aw[1 + ky:1 + ky + T, :, :F], d_ee7) for ky in (0, 1, 2)])

        # ---- conv5 wgrads: src = x window (pre-paired), dout = dz5 ----
        xp = jnp.where(v4, win3(x_p, x_m, x_n), 0)
        dz5c = dz5[1:T + 1]
        sh5 = _edge_cotangent(dz5c)
        dkd5_ref[...] += jnp.stack(
            [_mmT(xp[1 + ky:1 + ky + T], dz5c) for ky in (0, 1, 2)])
        dke5_ref[...] += jnp.stack(
            [_mmT(xp[1 + ky:1 + ky + T], sh5) for ky in (0, 1, 2)])

        dbs = jnp.concatenate([
            jnp.sum(dz5c.astype(jnp.float32), axis=(0, 1)).reshape(1, F2),
            jnp.sum(dz7c.astype(jnp.float32), axis=(0, 1)).reshape(1, F2),
        ], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 2), (0, 0)))

    return kernel


def fused_vgg_block2_bwd_impl(dskip, dpool, y7, a5p, xp, k5, k7):
    """One-pass block-2 backward.  ``dskip``/``y7`` natural; ``xp`` and
    ``a5p`` paired (B, H, W2/2, 2C|2F); ``dpool`` natural
    (B, H/2, W2/2, F).  Returns (dx natural, dk5, db5, dk7, db7) or
    None."""
    B, H, W2, F = y7.shape
    C = xp.shape[-1] // 2
    dt = y7.dtype
    # T=16 backward tiles: the forward keeps T=8 (P8 handoff convention),
    # but the backward's 4-row halo is 50% overhead on every VPU pass at
    # T=8 - see the stem backward's identical change
    T = 16 if H % 32 == 0 else _T
    if H % (2 * T) or W2 % 2 or F % 128 or C % 2:
        return None
    W = W2 // 2
    nb = H // T
    interpret = jax.default_backend() == "cpu"

    k7fd, k7feo, k7fee = _pair_weights_eo(_flip_t(k7).astype(dt))
    zf = jnp.zeros((2 * F,), dt)
    k5f = _flip_t(k5).astype(dt)                 # (3, 3, F, C)
    k5fd, k5fe = _pair_weights(k5f, F, C)
    zc = jnp.zeros((2 * C,), dt)

    kernel = _block2_bwd_kernel(W, C, F, H, dt, _lane_roll_fn(interpret),
                                nb, T)

    def blk3(c, cols=None):
        wdim = cols or W2
        return [
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wdim, c),
                         lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    half = T // 2
    nbp = (H // 2) // half
    pool_specs = [
        pl.BlockSpec((1, half, W, F),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, half, W, F), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, half, W, F),
                     lambda b, i: (b, jnp.minimum(i + 1, nbp - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, H, W, 2 * C), dt),
        jax.ShapeDtypeStruct((3, 2 * C, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * C, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * F), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, T, W, 2 * C), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((3, 2 * C, 2 * F)), const((3, 2 * C, 2 * F)),
        const((3, 2 * F, 2 * F)), const((3, F, F)), const((3, F, F)),
        const((8, 2 * F)),
    )

    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + blk3(2 * C, cols=W) + blk3(F) * 2 + blk3(2 * F, cols=W)
        + pool_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(k7fd, k7feo, k7fee, zf, k5fd, k5fe, zc,
      xp, xp, xp, dskip, dskip, dskip, y7, y7, y7, a5p, a5p, a5p,
      dpool, dpool, dpool)
    dxp, dkd5, dke5, dkd7, dkeo7, dkee7, dbs = res
    dx = dxp.reshape(B, H, W2, C)            # lane→sublane unfold in XLA

    dk5 = _unpair_wgrad(dkd5, dke5, (3, 3, C, F), C, F)
    dk7 = _unpack_wgrad_eo(dkd7, dkeo7, dkee7, (3, 3, F, F))
    db5 = dbs[0, :F] + dbs[0, F:]
    db7 = dbs[1, :F] + dbs[1, F:]
    return dx, dk5, db5, dk7, db7


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


def _block2_ok(x, k5, k7):
    B, H, W2, C = x.shape
    F = k5.shape[-1]
    return (H % (2 * _T) == 0 and W2 % 2 == 0 and F % 128 == 0
            and C % 2 == 0 and k7.shape[-1] == F)


@jax.custom_vjp
def fused_vgg_block2_train(x, k5, b5, k7, b7):
    """Training block 2: (skip (B, H, W2, F), pooled (B, H/2, W2/2, F)),
    with the one-pass Pallas backward above.  Falls back to the XLA
    reference when untileable."""
    res = (fused_vgg_block2_fwd_impl(x, k5, b5, k7, b7)
           if _block2_ok(x, k5, k7) else None)
    if res is None:
        return reference_vgg_block(x, [k5, k7], [b5, b7], pool=True)
    return res


def _b2_fwd(x, k5, b5, k7, b7):
    res = (fused_vgg_block2_fwd_impl(x, k5, b5, k7, b7, want_a5=True)
           if _block2_ok(x, k5, k7) else None)
    if res is None:
        out = reference_vgg_block(x, [k5, k7], [b5, b7], pool=True)
        return out, (x, k5, b5, k7, b7, None, None)
    skip, pooled, a5p = res
    B, H, W2, C = x.shape
    xp = x.reshape(B, H, W2 // 2, 2 * C)   # CSE'd with fwd_impl's fold
    return (skip, pooled), (xp, k5, b5, k7, b7, skip, a5p)


def _b2_bwd(res, g):
    xp, k5, b5, k7, b7, y7, a5p = res
    dskip, dpool = g
    if y7 is None:
        # fallback residual: xp slot holds x natural
        _, vjp = jax.vjp(
            lambda xx, a, c, d, e: reference_vgg_block(
                xx, [a, d], [c, e], pool=True), xp, k5, b5, k7, b7)
        return vjp(g)
    dx, dk5, db5, dk7, db7 = fused_vgg_block2_bwd_impl(
        dskip.astype(y7.dtype), dpool.astype(y7.dtype), y7, a5p, xp, k5, k7)
    return (dx.astype(xp.dtype), dk5.astype(k5.dtype), db5.astype(b5.dtype),
            dk7.astype(k7.dtype), db7.astype(b7.dtype))


fused_vgg_block2_train.defvjp(_b2_fwd, _b2_bwd)
