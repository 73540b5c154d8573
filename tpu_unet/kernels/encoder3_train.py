"""Training VJP for the deep VGG encoder blocks (3/4/5): 2-3 stacked
3×3 convs (+ReLU) and the trailing 2×2 maxpool as ONE Pallas pass each
way, in the natural NHWC layout.

Round-3 train-step profiling (512px bs8, 97 ms/step) showed the XLA
region for blocks 3-5 spends ~10 ms/step in pure layout transposes
({3,2,1,0}→{3,0,2,1} copies XLA inserts around every conv of its own
backward) on top of the conv FLOPs.  These kernels keep the whole block
in VMEM per row-tile — the intermediate activations a1/a2 are saved by
the forward (HBM round-trip ≈ 0.2 ms, far below the recompute cost),
and the backward produces dx, every weight gradient, and every bias
gradient in a single pass:

  fwd:  x → conv1 → a1 (saved) → conv2 → a2 (saved) → conv3 → skip
        (+ 2×2 first-max pool → pooled)
  bwd:  dy3 = dskip + unpool(dpool)   (first-max routing, recomputed
        from the saved skip — matches XLA select-and-scatter row-major
        tie semantics)
        dz3 = dy3 ⊙ [y3>0];  dk3/db3 in-kernel (9 shifted _mmT's)
        dz2 = conv(dz3, flipT(k3)) ⊙ [a2>0];  dk2/db2 in-kernel
        dz1 = conv(dz2, flipT(k2)) ⊙ [a1>0];  dk1/db1 in-kernel
        dx  = conv(dz1, flipT(k1))

Reference semantics: autodiff of nets/vgg.py features[10:16] / [17:23] /
[24:-1] (+ the stage-entry pools).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import _mm, _shift_cols_zero
from tpu_unet.kernels.decoder_train import _flip_t, _mmT
from tpu_unet.kernels.encoder import reference_vgg_block


def _conv_nat(src, R, k, dt, bias=None, relu=False):
    """Natural-layout 3×3 conv.  src (R+2, W, C), k (3, 3, C, F) →
    (R, W, F).

    kx is resolved with INPUT-side column shifts shared across ky (A/B:
    TPU_UNET_ENC_INSHIFT, see kernels/encoder.py::_conv3_kxsum)."""
    from tpu_unet.kernels.encoder import _inshift
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
    else:
        def kxsum(kx):
            t = _mm(src[0:R], k[0, kx])
            for ky in (1, 2):
                t += _mm(src[ky:ky + R], k[ky, kx])
            return t

        acc = _shift_cols_zero(kxsum(0), -1)
        acc += kxsum(1)
        acc += _shift_cols_zero(kxsum(2), 1)
    if bias is not None:
        acc = acc.astype(dt) + bias[...][None, :]
        return jax.nn.relu(acc) if relu else acc
    return acc


def _row_valid(i, T, H, n, off):
    """(n, 1, 1) bool mask for global rows i*T+off .. i*T+off+n-1."""
    lr = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    gr = i * T + off + lr
    return (gr >= 0) & (gr < H)


def _wgrad9(src, dz, row_off, T):
    """(3, 3, C, F) f32 weight gradient: dk[ky, kx] = Σ src[r+ky-1,
    j+kx-1]·dz[r, j] over the tile's T center rows.  ``src`` is the
    (T+8)-row window (center rows at offset 4), ``dz`` the center rows
    already sliced; ``row_off`` is src's window offset of dz row 0
    minus 1 (i.e. src rows row_off+ky align with dz rows at ky-1).

    The column shift rides on ``dz`` (dk[ky, kx] = Σ src[·, j']·
    shift(dz, 1−kx)[·, j']; out-of-range terms are src·0 either way), so
    only TWO shifted copies are built and reused across all three ky —
    the src-side form shifted the window six times per conv (~12 extra
    bf16 window passes per tile across the three convs)."""
    dzs = [_shift_cols_zero(dz, 1), dz, _shift_cols_zero(dz, -1)]
    return jnp.stack([
        jnp.stack([
            _mmT(src[row_off + ky:row_off + ky + T], dzs[kx])
            for kx in range(3)])
        for ky in range(3)])


def _make_bwd_kernel(T, W, C, F, H, dt, pool, nb):
    WN = T + 8

    def kernel(fk1, fk2, fk3,
               x_p, x_m, x_n, a1_p, a1_m, a1_n, a2_p, a2_m, a2_n,
               y_p, y_m, y_n, ds_p, ds_m, ds_n, *rest):
        if pool:
            dp_p, dp_m, dp_n = rest[:3]
            rest = rest[3:]
        dx_ref, dk1_ref, dk2_ref, dk3_ref, db_ref = rest
        b = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((b == 0) & (i == 0))
        def _():
            dk1_ref[...] = jnp.zeros_like(dk1_ref)
            dk2_ref[...] = jnp.zeros_like(dk2_ref)
            dk3_ref[...] = jnp.zeros_like(dk3_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def win(p, m, n):
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 4:2 * T + 4]

        v8 = _row_valid(i, T, H, WN, -4)
        y3w = jnp.where(v8, win(y_p, y_m, y_n), 0)
        dy3 = jnp.where(v8, win(ds_p, ds_m, ds_n),
                        0).astype(jnp.float32)

        if pool:
            # pooled rows i*T//2-2 .. i*T//2+T//2+1 (window WN//2)
            dpw = jnp.concatenate([dp_p[0], dp_m[0], dp_n[0]],
                                  axis=0)[T // 2 - 2:T + 2]
            vp = _row_valid(i, T // 2, H // 2, WN // 2, -2)
            dpw = jnp.where(vp, dpw, 0).astype(jnp.float32)
            # first-max routing recomputed from y3: window row-major
            # candidate order (r0c0, r0c1, r1c0, r1c1)
            y4 = y3w.reshape(WN // 2, 2, W, F)
            ye = y4[:, 0].astype(jnp.float32).reshape(WN // 2, W // 2, 2, F)
            yo = y4[:, 1].astype(jnp.float32).reshape(WN // 2, W // 2, 2, F)
            c1, c2 = ye[:, :, 0, :], ye[:, :, 1, :]
            c3, c4 = yo[:, :, 0, :], yo[:, :, 1, :]
            m = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
            f1 = jnp.where(c1 == m, 1.0, 0.0)
            f2 = jnp.where(c2 == m, 1.0, 0.0) * (1.0 - f1)
            f3 = jnp.where(c3 == m, 1.0, 0.0) * (1.0 - f1) * (1.0 - f2)
            f4 = (jnp.where(c4 == m, 1.0, 0.0)
                  * (1.0 - f1) * (1.0 - f2) * (1.0 - f3))
            de = jnp.concatenate([(dpw * f1)[:, :, None],
                                  (dpw * f2)[:, :, None]],
                                 axis=2).reshape(WN // 2, W, F)
            do = jnp.concatenate([(dpw * f3)[:, :, None],
                                  (dpw * f4)[:, :, None]],
                                 axis=2).reshape(WN // 2, W, F)
            dy3 = dy3 + jnp.concatenate(
                [de[:, None], do[:, None]], axis=1).reshape(WN, W, F)

        dz3 = jnp.where(y3w.astype(jnp.float32) > 0.0, dy3,
                        0.0).astype(dt)                       # (WN, W, F)
        da2 = _conv_nat(dz3, T + 6, fk3, dt)                  # rows g0+1..
        a2w = jnp.where(v8, win(a2_p, a2_m, a2_n), 0)
        dz2 = jnp.where(a2w[1:T + 7].astype(jnp.float32) > 0.0, da2,
                        0.0).astype(dt)
        da1 = _conv_nat(dz2, T + 4, fk2, dt)                  # rows g0+2..
        a1w = jnp.where(v8, win(a1_p, a1_m, a1_n), 0)
        dz1 = jnp.where(a1w[2:T + 6].astype(jnp.float32) > 0.0, da1,
                        0.0).astype(dt)
        dxw = _conv_nat(dz1, T + 2, fk1, dt)                  # rows g0+3..
        dx_ref[0] = dxw[1:T + 1].astype(dt)

        xw = jnp.where(v8, win(x_p, x_m, x_n), 0)
        dz1c, dz2c, dz3c = dz1[2:T + 2], dz2[3:T + 3], dz3[4:T + 4]
        dk1_ref[...] += _wgrad9(xw, dz1c, 3, T)
        dk2_ref[...] += _wgrad9(a1w, dz2c, 3, T)
        dk3_ref[...] += _wgrad9(a2w, dz3c, 3, T)
        dbs = jnp.concatenate([
            jnp.sum(dz1c.astype(jnp.float32), axis=(0, 1)).reshape(1, F),
            jnp.sum(dz2c.astype(jnp.float32), axis=(0, 1)).reshape(1, F),
            jnp.sum(dz3c.astype(jnp.float32), axis=(0, 1)).reshape(1, F),
        ], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 3), (0, 0)))

    return kernel


def _make_fwd_kernel(T, W, C, F, H, dt, pool, want_res):
    def kernel(k1, b1, k2, b2, k3, b3, x_p, x_m, x_n, skip_ref, *rest):
        i = pl.program_id(1)
        v6 = _row_valid(i, T, H, T + 6, -3)
        xs = jnp.concatenate([x_p[0], x_m[0], x_n[0]],
                             axis=0)[T - 3:2 * T + 3]
        xs = jnp.where(v6, xs, 0)
        a1 = _conv_nat(xs, T + 4, k1[...], dt, b1, relu=True)
        a1 = jnp.where(v6[1:T + 5], a1, 0)
        a2 = _conv_nat(a1, T + 2, k2[...], dt, b2, relu=True)
        a2 = jnp.where(v6[2:T + 4], a2, 0)
        y3 = _conv_nat(a2, T, k3[...], dt, b3, relu=True)
        skip_ref[0] = y3
        ri = 0
        if pool:
            m = jnp.max(y3.reshape(T // 2, 2, W, F), axis=1)
            rest[0][0] = jnp.max(
                m.reshape(T // 2, W // 2, 2, F), axis=2).astype(dt)
            ri = 1
        if want_res:
            rest[ri][0] = a1[2:T + 2]
            rest[ri + 1][0] = a2[1:T + 1]

    return kernel


def _blk3(nb, T, W, c):
    return [
        pl.BlockSpec((1, T, W, c),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, W, c), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, W, c),
                     lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _pick_t(H, W, C, F, itemsize):
    # window intermediates dominate: ~6 f32 (WN, W, F) + 6 bf16 windows
    for T in (16, 8):
        if H % T == 0 and T >= 8:
            if (T + 8) * W * F * (6 * 4 + 4 * itemsize) <= (64 << 20):
                return T
    return None


def _block3_ok(x, ks, pool):
    B, H, W, C = x.shape
    if len(ks) != 3 or any(k.shape[:2] != (3, 3) for k in ks):
        return False
    Fs = [int(k.shape[-1]) for k in ks]
    if len(set(Fs)) != 1 or Fs[0] % 128 or C % 128:
        return False
    if ks[0].shape[2] != C or ks[1].shape[2] != Fs[0] \
            or ks[2].shape[2] != Fs[0]:
        return False
    if pool and (W % 2 or H % 2):
        return False
    T = _pick_t(H, W, C, Fs[0], 2 if x.dtype == jnp.bfloat16 else 4)
    return T is not None and H % T == 0 and (not pool or T % 2 == 0)


def fused_vgg_block3_fwd_impl(x, ks, bs, pool, want_res=False,
                              block_rows=None):
    B, H, W, C = x.shape
    F = int(ks[0].shape[-1])
    dt = x.dtype
    T = block_rows or _pick_t(H, W, C, F,
                              2 if dt == jnp.bfloat16 else 4)
    if T is None:
        return None
    nb = H // T
    interpret = jax.default_backend() == "cpu"

    out_shapes = [jax.ShapeDtypeStruct((B, H, W, F), dt)]
    out_specs = [pl.BlockSpec((1, T, W, F), lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if pool:
        out_shapes.append(jax.ShapeDtypeStruct((B, H // 2, W // 2, F), dt))
        out_specs.append(pl.BlockSpec((1, T // 2, W // 2, F),
                                      lambda b, i: (b, i, 0, 0),
                                      memory_space=pltpu.VMEM))
    if want_res:
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct((B, H, W, F), dt))
            out_specs.append(pl.BlockSpec((1, T, W, F),
                                          lambda b, i: (b, i, 0, 0),
                                          memory_space=pltpu.VMEM))

    kernel = _make_fwd_kernel(T, W, C, F, H, dt, pool, want_res)
    wargs = []
    for k, bb in zip(ks, bs):
        wargs += [k.astype(dt), bb.astype(dt)]
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + _blk3(nb, T, W, C),
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*wargs, x, x, x)
    return res


def fused_vgg_block3_bwd_impl(dskip, dpool, x, a1, a2, y3, ks, pool,
                              block_rows=None):
    B, H, W, C = x.shape
    F = int(ks[0].shape[-1])
    dt = y3.dtype
    T = block_rows or _pick_t(H, W, C, F,
                              2 if dt == jnp.bfloat16 else 4)
    if T is None:
        return None
    nb = H // T
    interpret = jax.default_backend() == "cpu"

    fk1 = _flip_t(ks[0]).astype(dt)        # (3, 3, F, C)
    fk2 = _flip_t(ks[1]).astype(dt)
    fk3 = _flip_t(ks[2]).astype(dt)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, H, W, C), dt),
        jax.ShapeDtypeStruct((3, 3, C, F), jnp.float32),
        jax.ShapeDtypeStruct((3, 3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((3, 3, F, F), jnp.float32),
        jax.ShapeDtypeStruct((8, F), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, T, W, C), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((3, 3, C, F)), const((3, 3, F, F)), const((3, 3, F, F)),
        const((8, F)),
    )

    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                + _blk3(nb, T, W, C) + _blk3(nb, T, W, F) * 4)
    args = [fk1, fk2, fk3, x, x, x, a1, a1, a1, a2, a2, a2, y3, y3, y3,
            dskip, dskip, dskip]
    if pool:
        half = T // 2
        nbp = (H // 2) // half
        in_specs += [
            pl.BlockSpec((1, half, W // 2, F),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, W // 2, F), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, W // 2, F),
                         lambda b, i: (b, jnp.minimum(i + 1, nbp - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [dpool, dpool, dpool]

    kernel = _make_bwd_kernel(T, W, C, F, H, dt, pool, nb)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(B, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    dx, dk1, dk2, dk3, dbs = res
    return (dx, dk1, dbs[0], dk2, dbs[1], dk3, dbs[2])


# ---------------------------------------------------------------------------
# custom-VJP wrappers (one per pool mode: `pool` must be static)
# ---------------------------------------------------------------------------


def _ref(x, k1, b1, k2, b2, k3, b3, pool):
    return reference_vgg_block(x, [k1, k2, k3], [b1, b2, b3], pool=pool)


def _ref_diff(x, k1, b1, k2, b2, k3, b3, pool):
    """Differentiable XLA fallback (reduce_window max has no VJP on some
    backends; reshape-max is exact for the 2×2/stride-2 pool)."""
    skip, _ = reference_vgg_block(x, [k1, k2, k3], [b1, b2, b3],
                                  pool=False)
    if not pool:
        return skip, None
    B, H, W, F = skip.shape
    pooled = jnp.max(skip.reshape(B, H // 2, 2, W // 2, 2, F),
                     axis=(2, 4))
    return skip, pooled


def _make_train_fn(pool):
    @jax.custom_vjp
    def fn(x, k1, b1, k2, b2, k3, b3):
        ks = [k1, k2, k3]
        res = (fused_vgg_block3_fwd_impl(x, ks, [b1, b2, b3], pool)
               if _block3_ok(x, ks, pool) else None)
        if res is None:
            return _ref(x, k1, b1, k2, b2, k3, b3, pool)
        return (res[0], res[1]) if pool else (res[0], None)

    def fwd(x, k1, b1, k2, b2, k3, b3):
        ks = [k1, k2, k3]
        res = (fused_vgg_block3_fwd_impl(x, ks, [b1, b2, b3], pool,
                                         want_res=True)
               if _block3_ok(x, ks, pool) else None)
        if res is None:
            out = _ref_diff(x, k1, b1, k2, b2, k3, b3, pool)
            # 8-tuple marks the XLA fallback residual (fused is 7)
            return out, (x, k1, b1, k2, b2, k3, b3, None)
        if pool:
            skip, pooled, a1, a2 = res
            out = (skip, pooled)
        else:
            skip, a1, a2 = res
            out = (skip, None)
        return out, (x, k1, k2, k3, a1, a2, skip)

    def bwd(resid, g):
        if len(resid) == 8:             # XLA fallback residual
            x, k1, b1, k2, b2, k3, b3, _ = resid
            _, vjp = jax.vjp(
                lambda *a: _ref_diff(*a, pool), x, k1, b1, k2, b2, k3, b3)
            return vjp(g)
        x, k1, k2, k3, a1, a2, skip = resid
        dskip, dpool = g
        out = fused_vgg_block3_bwd_impl(
            dskip.astype(skip.dtype),
            None if dpool is None else dpool.astype(skip.dtype),
            x, a1, a2, skip, [k1, k2, k3], pool)
        dx, dk1, db1, dk2, db2, dk3, db3 = out
        return (dx.astype(x.dtype), dk1.astype(k1.dtype),
                db1.astype(k1.dtype), dk2.astype(k2.dtype),
                db2.astype(k2.dtype), dk3.astype(k3.dtype),
                db3.astype(k3.dtype))

    fn.defvjp(fwd, bwd)
    return fn


_fn_pool = _make_train_fn(True)
_fn_nopool = _make_train_fn(False)


def fused_vgg_block3_train(x, ks, bs, pool: bool = True):
    """Training deep VGG block: (skip, pooled-or-None) with the one-pass
    Pallas backward above.  Falls back to the XLA reference when
    untileable."""
    fn = _fn_pool if pool else _fn_nopool
    return fn(x, ks[0], bs[0], ks[1], bs[1], ks[2], bs[2])
