"""Fused ×2-upsample + conv + conv head (`up_conv`) — the extra decoder
head of the ResNet50 UNet and of Unet_vgg/self_net (reference:
nets/unet.py:47-54: upsample ×2, two 3×3 conv+ReLU, no skip).

Structurally this is a UnetUp stage WITHOUT the skip concat.  At 512px
the two 64-channel convs run at 512² resolution — XLA executes them at
~50% MXU (half-filled lanes), plus the materialized ×2 upsample.  The
kernel runs the whole head per row tile in the column-PAIRED layout
(kernels/decoder_fuse.py): the upsample's even/odd planes are the
paired channel blocks, both convs are dense+edge paired matmuls on full
lanes, and the output can stay PAIRED for the fused serving tail
(kernels/postprocess.py) or the fused final-conv+loss kernel.

The training VJP runs the backward in one pass too: relu VJPs, dgrad
convs, both weight gradients, and the upsample transpose (reusing the
W-/H-adjoint helpers of kernels/decoder_train.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import (_col_arrays, _conv_rows,
                                           _h_upsample_rows, _pair_weights,
                                           _pick_tile, _row_arrays,
                                           _w_expand_pair)
from tpu_unet.kernels.decoder_train import (_edge_cotangent, _flip_t,
                                            _h_adjoint_rows, _mmT,
                                            _unpair_wgrad, _w_expand_adjoint)
from tpu_unet.nn.resize import upsample2x


def reference_upconv(x, k1, b1, k2, b2):
    """XLA composition (and the exactness/VJP oracle):
    relu(conv2(relu(conv1(up2x(x)))))."""
    def conv(v, k, b):
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn) + b.astype(v.dtype)

    y = jax.nn.relu(conv(upsample2x(x), k1, b1))
    return jax.nn.relu(conv(y, k2, b2))


def _upconv_kernel(T, E, win, Cx, F, H2, W, dt, want_y1=False):
    def kernel(hw, hsel, validx, valid1,
               we, wo, k1d, k1e, b1d, k2d, k2e, b2d,
               x_l, x_m, x_h, out_ref, *y1_ref):
        i = pl.program_id(1)
        r0 = i * T

        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        # coefficient tables arrive (rows, 1, Cx) / (1, W, Cx) PRE-shaped:
        # unlike the 128-channel decoder stages, Cx is 64 here and an
        # in-kernel rank expansion of a 64-lane array is an unsupported
        # Mosaic shape cast
        h = _h_upsample_rows(xs, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                             r0, H2, E)
        h = h * validx[pl.ds(r0, E)]
        even, odd = _w_expand_pair(h, we[...], wo[...])
        cc = jnp.concatenate([even.astype(dt), odd.astype(dt)], axis=-1)
        y1 = _conv_rows(cc, T + 2, k1d, k1e, b1d, dt)
        y1 = y1 * valid1[pl.ds(r0, T + 2)][:, None, :]
        if want_y1:
            y1_ref[0][0] = y1[1:T + 1]
        out_ref[0] = _conv_rows(y1, T, k2d, k2e, b2d, dt)

    return kernel


def _upconv_kernel_p2(T, E, win, Cx, F, H2, W, dt):
    """Two T-row sub-tiles per grid step, written as two INDEPENDENT
    chains (probe: tools/probe_overlap.py — Mosaic's scheduler overlaps
    dependence-free VPU and MXU chains inside one kernel body at ~max()
    cost, but never across grid-step boundaries).  Sub-tile 1's upsample
    lerp chain (pure VPU) has no dependence on sub-tile 0's convs (pure
    MXU after the lerp), so the scheduler can hide most of the VPU time
    under the matmuls — the grid-step-per-tile layout serialized them."""
    def kernel(hw, hsel, validx, valid1,
               we, wo, k1d, k1e, b1d, k2d, k2e, b2d,
               x_l, x_m, x_h, out_ref):
        i = pl.program_id(1)

        def lerp(s):
            r0 = i * 2 * T + s * T
            off = T + s * (T // 2) - 2
            xs = jnp.concatenate(
                [x_l[0], x_m[0], x_h[0]], axis=0)[off:off + win]
            h = _h_upsample_rows(xs, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                                 r0, H2, E)
            h = h * validx[pl.ds(r0, E)]
            even, odd = _w_expand_pair(h, we[...], wo[...])
            return jnp.concatenate([even.astype(dt), odd.astype(dt)],
                                   axis=-1)

        def conv1(s, cc):
            r0 = i * 2 * T + s * T
            y1 = _conv_rows(cc, T + 2, k1d, k1e, b1d, dt)
            return y1 * valid1[pl.ds(r0, T + 2)][:, None, :]

        # source-interleaved: sub-tile 1's VPU lerp chain is emitted
        # between sub-tile 0's MXU conv passes so a program-order list
        # scheduler can co-issue them
        cc0 = lerp(0)
        y1_0 = conv1(0, cc0)
        cc1 = lerp(1)
        out0 = _conv_rows(y1_0, T, k2d, k2e, b2d, dt)
        y1_1 = conv1(1, cc1)
        out1 = _conv_rows(y1_1, T, k2d, k2e, b2d, dt)
        out_ref[0] = jnp.concatenate([out0, out1], axis=0)

    return kernel


def _upconv_kernel_wlow(T, E, win, Cx, F, H2, W, dt, want_y1=False):
    """`_upconv_kernel` with the separable upsample REORDERED: the ×2
    W-expansion runs at LOW-RES rows (win ≈ E/2 rows, so ~half the
    work), its even/odd planes concat into the 2Cx=128-lane paired
    layout, and the H-lerp then runs ONCE at full VPU lanes — the
    original order H-lerped at 64 lanes (half-idle VPU) and W-expanded
    at full-res rows.  Bilinear is separable, so the math is identical
    (reassociated)."""
    def kernel(hw, hsel, validx, valid1,
               we, wo, k1d, k1e, b1d, k2d, k2e, b2d,
               x_l, x_m, x_h, out_ref, *y1_ref):
        i = pl.program_id(1)
        r0 = i * T

        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        even_l, odd_l = _w_expand_pair(xs, we[...], wo[...])
        ccl = jnp.concatenate([even_l, odd_l], axis=-1)  # (win, W, 2Cx)
        h = _h_upsample_rows(ccl, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                             r0, H2, E)
        cc = (h * validx[pl.ds(r0, E)]).astype(dt)
        y1 = _conv_rows(cc, T + 2, k1d, k1e, b1d, dt)
        y1 = y1 * valid1[pl.ds(r0, T + 2)][:, None, :]
        if want_y1:
            y1_ref[0][0] = y1[1:T + 1]
        out_ref[0] = _conv_rows(y1, T, k2d, k2e, b2d, dt)

    return kernel


def fused_upconv_impl(x, k1, b1, k2, b2, want_y1=False, block_rows=None):
    """(B, H, W, Cx) → paired (B, 2H, W, 2F)[, y1 paired].  None if
    untileable."""
    import os

    B, H, W, Cx = x.shape
    F = k1.shape[-1]
    H2 = 2 * H
    dt = x.dtype
    if F >= 128 or F % 8 or Cx % 2 or k1.shape[2] != Cx:
        return None
    # TPU_UNET_HEAD_T: tile-size A/B knob.  T=32 at the resnet50 head
    # shape is another pathological Mosaic compile (>28 min, killed) —
    # the default T=16 stands.
    T = block_rows or int(os.environ.get("TPU_UNET_HEAD_T", "0")) or \
        _pick_tile(H2, W, 2 * (Cx + 2 * F),
                   2 if dt == jnp.bfloat16 else 4, cx=Cx)
    if T % 2 or T < 8 or H2 % T or H % (T // 2):
        return None
    pipe2 = (os.environ.get("TPU_UNET_PIPE2", "0") not in ("0", "false")
             and not want_y1 and H2 % (2 * T) == 0 and H % T == 0)
    if pipe2:
        return _fused_upconv_call_p2(x, k1, b1, k2, b2, T)
    E = T + 4
    win = T // 2 + 4
    interpret = jax.default_backend() == "cpu"

    # REJECTED experiment (kept for the record): the separable-upsample
    # reorder (`_upconv_kernel_wlow`) is exact in interpret mode but
    # sends Mosaic into a pathological 11-minute compile at the
    # production shape (8,256,256,64) — disqualifying regardless of
    # runtime.  Likely the (win, W, 128) dup-concat chain after the
    # low-res W-expand defeats the layout solver.
    wlow = os.environ.get("TPU_UNET_HEAD_WLOW", "0") not in ("0", "false")
    hw, hsel, valid = _row_arrays(H)
    we, wo = _col_arrays(W)
    # (rows, 1, Cx) / (1, W, Cx): rank expansion happens HERE, not in the
    # kernel — Mosaic rejects it on 64-lane arrays (see kernel comment).
    # The wlow kernel H-lerps the PAIRED (2Cx-lane) planes instead.
    hlanes = 2 * Cx if wlow else Cx
    hw = np.repeat(hw, hlanes, axis=1)[:, None, :]
    hsel = np.repeat(hsel, hlanes, axis=1)[:, None, :]
    validx = np.repeat(valid, hlanes, axis=1)[:, None, :]
    we = np.repeat(we, Cx, axis=1)[None]
    wo = np.repeat(wo, Cx, axis=1)[None]
    r1 = np.arange(-1, H2 + 1)
    valid1 = np.repeat(((r1 >= 0) & (r1 < H2)).astype(np.float32
                                                      ).reshape(-1, 1),
                       2 * F, axis=1)

    # _pair_weights with Cs = 0: channel order collapses to [uE, uO]
    k1d, k1e = _pair_weights(k1.astype(dt), 0, F)
    k2d, k2e = _pair_weights(k2.astype(dt), F, F)
    b1d = jnp.concatenate([b1, b1]).astype(dt)
    b2d = jnp.concatenate([b2, b2]).astype(dt)

    nbx = H // (T // 2) - 1
    grid = (B, H2 // T)
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
    out_shape = jax.ShapeDtypeStruct((B, H2, W, 2 * F), dt)
    out_spec = pl.BlockSpec((1, T, W, 2 * F), lambda b, i: (b, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = (out_shape, out_shape) if want_y1 else out_shape
    out_specs = (out_spec, out_spec) if want_y1 else out_spec

    kernel = (_upconv_kernel_wlow if wlow else _upconv_kernel)(
        T, E, win, Cx, F, H2, W, dt, want_y1)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12 + x_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(hw).astype(dt), jnp.asarray(hsel).astype(dt),
      jnp.asarray(validx).astype(dt), jnp.asarray(valid1).astype(dt),
      jnp.asarray(we).astype(dt), jnp.asarray(wo).astype(dt),
      k1d, k1e, b1d, k2d, k2e, b2d, x, x, x)
    return res


def _fused_upconv_call_p2(x, k1, b1, k2, b2, T):
    """pallas_call plumbing for the 2-sub-tile pipelined head kernel."""
    B, H, W, Cx = x.shape
    F = k1.shape[-1]
    H2 = 2 * H
    dt = x.dtype
    E = T + 4
    win = T // 2 + 4
    interpret = jax.default_backend() == "cpu"

    hw, hsel, valid = _row_arrays(H)
    we, wo = _col_arrays(W)
    hw = np.repeat(hw, Cx, axis=1)[:, None, :]
    hsel = np.repeat(hsel, Cx, axis=1)[:, None, :]
    validx = np.repeat(valid, Cx, axis=1)[:, None, :]
    we = np.repeat(we, Cx, axis=1)[None]
    wo = np.repeat(wo, Cx, axis=1)[None]
    r1 = np.arange(-1, H2 + 1)
    valid1 = np.repeat(((r1 >= 0) & (r1 < H2)).astype(np.float32
                                                      ).reshape(-1, 1),
                       2 * F, axis=1)
    k1d, k1e = _pair_weights(k1.astype(dt), 0, F)
    k2d, k2e = _pair_weights(k2.astype(dt), F, F)
    b1d = jnp.concatenate([b1, b1]).astype(dt)
    b2d = jnp.concatenate([b2, b2]).astype(dt)

    # x window per grid step: T-row blocks [iT-T, iT+2T) (clamped); each
    # sub-tile slices its (T/2+4)-row window at offset T + s*T/2 - 2
    nbx = H // T - 1
    grid = (B, H2 // (2 * T))
    x_specs = [
        pl.BlockSpec((1, T, W, Cx),
                     lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, W, Cx), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, W, Cx),
                     lambda b, i: (b, jnp.minimum(i + 1, nbx), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = jax.ShapeDtypeStruct((B, H2, W, 2 * F), dt)
    out_spec = pl.BlockSpec((1, 2 * T, W, 2 * F), lambda b, i: (b, i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = _upconv_kernel_p2(T, E, win, Cx, F, H2, W, dt)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12 + x_specs,
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(hw).astype(dt), jnp.asarray(hsel).astype(dt),
      jnp.asarray(validx).astype(dt), jnp.asarray(valid1).astype(dt),
      jnp.asarray(we).astype(dt), jnp.asarray(wo).astype(dt),
      k1d, k1e, b1d, k2d, k2e, b2d, x, x, x)


# ---------------------------------------------------------------------------
# backward (training)
# ---------------------------------------------------------------------------


def _upconv_bwd_kernel(T, E, win, Cx, F, H2, W, dt):
    def kernel(hw, hsel, validx, hw3, hsel3, validx3, rv, we, wo,
               k2fd, k2fe, zf, k1ud, k1ue, zu,
               x_l, x_m, x_h,
               g_p, g_m, g_n, o_p, o_m, o_n, y_p, y_m, y_n,
               dxp_ref, dkd1_ref, dke1_ref, dkd2_ref, dke2_ref, db_ref):
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
            return jnp.concatenate([p[0], m[0], n[0]],
                                   axis=0)[T - 2:2 * T + 2]

        rva = rv[pl.ds(r0, T + 4)]
        rvw = rva[:, None, :]
        gw = win3(g_p, g_m, g_n) * rvw
        ow = win3(o_p, o_m, o_n)
        yw = win3(y_p, y_m, y_n) * rvw
        g2 = jnp.where(ow.astype(jnp.float32) > 0.0, gw,
                       jnp.zeros_like(gw))
        dz1 = _conv_rows(g2, T + 2, k2fd, k2fe, zf, dt, relu=False)
        dz1 = jnp.where(yw[1:T + 3].astype(jnp.float32) > 0.0, dz1,
                        jnp.zeros_like(dz1))
        dz1 = dz1 * rva[1:T + 3][:, None, :]

        dup = _conv_rows(dz1, T, k1ud, k1ue, zu, dt, relu=False)
        # we/wo arrive (1, W, Cx) pre-shaped; the adjoint's row tables
        # stay 2D (rows, Cx) for the in-register L rebuild
        we3 = we[...].astype(jnp.float32)
        wo3 = wo[...].astype(jnp.float32)
        dh = _w_expand_adjoint(dup, we3, wo3, Cx, W)
        dxw = _h_adjoint_rows(dh, hw[pl.ds(r0, E)], hsel[pl.ds(r0, E)],
                              validx[pl.ds(r0, E)], T, win, W, Cx)
        dxp_ref[0, 0] = dxw.astype(dt)

        # conv2 wgrad: src = y1 window, dout = g2 center
        g2c = g2[2:T + 2]
        sh2 = _edge_cotangent(g2c)
        dkd2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], g2c) for ky in (0, 1, 2)])
        dke2_ref[...] += jnp.stack(
            [_mmT(yw[1 + ky:1 + ky + T], sh2) for ky in (0, 1, 2)])

        # conv1 wgrad: src = cc = [upE, upO] recomputed; the (rows, 1, Cx)
        # tables avoid in-kernel rank expansion at 64 lanes
        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        h = _h_upsample_rows(xs, hw3[pl.ds(r0, E)], hsel3[pl.ds(r0, E)],
                             r0, H2, E)
        h = h * validx3[pl.ds(r0, E)]
        even, odd = _w_expand_pair(h, we[...], wo[...])
        cc = jnp.concatenate([even.astype(dt), odd.astype(dt)], axis=-1)
        dz1c = dz1[1:T + 1]
        sh1 = _edge_cotangent(dz1c)
        dkd1_ref[...] += jnp.stack(
            [_mmT(cc[1 + ky:1 + ky + T], dz1c) for ky in (0, 1, 2)])
        dke1_ref[...] += jnp.stack(
            [_mmT(cc[1 + ky:1 + ky + T], sh1) for ky in (0, 1, 2)])

        dbs = jnp.concatenate([
            jnp.sum(dz1c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
            jnp.sum(g2c.astype(jnp.float32), axis=(0, 1)).reshape(1, 2 * F),
        ], axis=0)
        db_ref[...] += jnp.pad(dbs, ((0, db_ref.shape[0] - 2), (0, 0)))

    return kernel


def fused_upconv_bwd_impl(g, out, y1, x, k1, k2, block_rows=None):
    """Paired backward for the up_conv head: ``g``/``out``/``y1`` arrive
    PAIRED (B, 2H, W, 2F); ``x`` natural.  Returns (dx, dk1, db1, dk2,
    db2) or None."""
    B, H2, Wp, F2 = g.shape
    F = F2 // 2
    _, H, W, Cx = x.shape
    dt = g.dtype
    if F >= 128 or F % 8 or Wp != W:
        return None
    T = block_rows or (16 if H2 % 16 == 0 else 8)
    if H2 % T or T < 8 or H % (T // 2):
        return None
    E = T + 4
    win = T // 2 + 4
    interpret = jax.default_backend() == "cpu"

    hw, hsel, valid = _row_arrays(H)
    we, wo = _col_arrays(W)
    # 2D (rows, Cx) tables for the H-lerp adjoint's L rebuild, 3D
    # (rows, 1, Cx) / (1, W, Cx) for the forward recompute (no in-kernel
    # rank expansion at 64 lanes — unsupported Mosaic shape cast)
    hw = np.repeat(hw, Cx, axis=1)
    hsel = np.repeat(hsel, Cx, axis=1)
    validx = np.repeat(valid, Cx, axis=1)
    hw3, hsel3, validx3 = hw[:, None, :], hsel[:, None, :], validx[:, None, :]
    we = np.repeat(we, Cx, axis=1)[None]
    wo = np.repeat(wo, Cx, axis=1)[None]
    rs = np.arange(-2, H2 + 2)
    rv = np.repeat(((rs >= 0) & (rs < H2)).astype(np.float32
                                                  ).reshape(-1, 1),
                   2 * F, axis=1)

    k2fd, k2fe = _pair_weights(_flip_t(k2).astype(dt), F, F)
    k1f = _flip_t(k1).astype(dt)                     # (3, 3, F, Cx)
    k1ud, k1ue = _pair_weights(k1f, 0, Cx)
    zf = jnp.zeros((2 * F,), dt)
    zu = jnp.zeros((2 * Cx,), dt)

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
        jax.ShapeDtypeStruct((B, nblk, win, W, Cx), dt),
        jax.ShapeDtypeStruct((3, 2 * Cx, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * Cx, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((3, 2 * F, 2 * F), jnp.float32),
        jax.ShapeDtypeStruct((8, 2 * F), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, 1, win, W, Cx), lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const((3, 2 * Cx, 2 * F)), const((3, 2 * Cx, 2 * F)),
        const((3, 2 * F, 2 * F)), const((3, 2 * F, 2 * F)),
        const((8, 2 * F)),
    )

    kernel = _upconv_bwd_kernel(T, E, win, Cx, F, H2, W, dt)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15
        + x_specs + blk3(2 * F) * 3,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(hw).astype(dt), jnp.asarray(hsel).astype(dt),
      jnp.asarray(validx).astype(dt),
      jnp.asarray(hw3).astype(dt), jnp.asarray(hsel3).astype(dt),
      jnp.asarray(validx3).astype(dt), jnp.asarray(rv).astype(dt),
      jnp.asarray(we).astype(dt), jnp.asarray(wo).astype(dt),
      k2fd, k2fe, zf, k1ud, k1ue, zu,
      x, x, x, g, g, g, out, out, out, y1, y1, y1)
    dxp, dkd1, dke1, dkd2, dke2, dbs = res

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

    dk1 = _unpair_wgrad(dkd1, dke1, (3, 3, Cx, F), 0, F)
    dk2 = _unpair_wgrad(dkd2, dke2, (3, 3, F, F), F, F)
    db1 = dbs[0, :F] + dbs[0, F:]
    db2 = dbs[1, :F] + dbs[1, F:]
    return dx, dk1, db1, dk2, db2


# ---------------------------------------------------------------------------
# public entries
# ---------------------------------------------------------------------------


def _paired_view(out_nat):
    B, H2, W2, F = out_nat.shape
    return out_nat.reshape(B, H2, W2 // 2, 2 * F)


def fused_upconv(x, k1, b1, k2, b2):
    """Inference head, NATURAL output (custom VJP = XLA reference)."""
    out = _fwd(x, k1, b1, k2, b2)
    B, H2, W, F2 = out.shape
    return out.reshape(B, H2, 2 * W, F2 // 2)


def fused_upconv_paired(x, k1, b1, k2, b2):
    """Inference head, PAIRED output for the fused serving tail."""
    return _fwd(x, k1, b1, k2, b2)


def _fwd(x, k1, b1, k2, b2):
    res = fused_upconv_impl(x, k1, b1, k2, b2)
    if res is None:
        return _paired_view(reference_upconv(x, k1, b1, k2, b2))
    return res


@jax.custom_vjp
def fused_upconv_train(x, k1, b1, k2, b2):
    """Training head with COLUMN-PAIRED output and a one-pass backward
    (dgrads + in-kernel wgrads + upsample transpose)."""
    return _fwd(x, k1, b1, k2, b2)


def _t_fwd(x, k1, b1, k2, b2):
    res = fused_upconv_impl(x, k1, b1, k2, b2, want_y1=True)
    if res is None:
        out = _paired_view(reference_upconv(x, k1, b1, k2, b2))
        return out, (x, k1, b1, k2, b2, None, None)
    out, y1 = res
    return out, (x, k1, b1, k2, b2, y1, out)


def _t_bwd(res, g):
    x, k1, b1, k2, b2, y1, out = res
    if y1 is None:
        _, vjp = jax.vjp(
            lambda *a: _paired_view(reference_upconv(*a)),
            x, k1, b1, k2, b2)
        return vjp(g)
    bwd = fused_upconv_bwd_impl(g.astype(y1.dtype), out, y1, x, k1, k2)
    if bwd is None:
        _, vjp = jax.vjp(
            lambda *a: _paired_view(reference_upconv(*a)),
            x, k1, b1, k2, b2)
        return vjp(g)
    dx, dk1, db1, dk2, db2 = bwd
    return (dx.astype(x.dtype), dk1.astype(k1.dtype), db1.astype(b1.dtype),
            dk2.astype(k2.dtype), db2.astype(b2.dtype))


fused_upconv_train.defvjp(_t_fwd, _t_bwd)
