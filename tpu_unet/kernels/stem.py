"""Fused VGG16 stem — normalize-adjacent conv1_1 + conv1_2 + 2×2 maxpool
in one Pallas pass, emitting the column-PAIRED skip the fused decoder
(kernels/decoder_fuse.py) consumes directly.

Round-2 HLO profiling (bench forward, batch 8, 512px): XLA spends
~7.8 ms/step in this region — conv1_1 (1.3), conv1_2 at 35% MXU because 64
output channels half-fill the lanes (3.0), two relayout copies feeding the
decoder kernel (2.2), the stage-1 maxpool (1.0), and the input convert
copy (0.4).  This kernel replaces all of it:

- The raw (B, H, W, 3) image arrives host-reshaped to the paired layout
  (B, H, W/2, 6) — a free bitcast of the row-major buffer.
- conv1_1 runs as ONE im2col matmul: 9 shifted 6-lane views (3 ky row
  slices × 3 pair shifts) concatenated into 54 lanes, times a host-packed
  (54, 128) weight whose output halves are the even/odd pixels of each
  pair.  K=54 beats nine K=6 matmuls 6× on MXU occupancy.
- conv1_2 reuses the paired dense+edge conv of the decoder kernel
  (full 128-lane matmuls).
- The 2×2 maxpool folds the lane halves with a static f32 lane roll and
  the row pairs with a free outer-dim split.

Reference semantics: nets/vgg.py:26-31 features[0:4] (conv-relu-conv-relu)
+ the stage-2 entry maxpool.

Boundary rows are handled with clamped block-index maps (all DMAs stay in
bounds) plus precomputed validity masks — no host-side pads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.decoder_fuse import (_conv_rows, _pair_weights,
                                           _shift_cols_zero)

_T = 8  # output data rows per grid step


def _pack_conv1_weights(k11):
    """(3, 3, 3, F) HWIO conv kernel → (54, 2F) im2col matrix (traceable).

    Input lanes are ordered [(ky, δ, half, c)] for ky in 0..2, pair shift
    δ in (-1, 0, +1), half in (even, odd), c in 0..2; the output columns
    are [even-pixel F | odd-pixel F].  Even output 2p taps cols
    2p-1 (δ=-1 odd), 2p (δ=0 even), 2p+1 (δ=0 odd); odd output 2p+1 taps
    2p (δ=0 even), 2p+1 (δ=0 odd), 2p+2 (δ=+1 even).
    """
    f = k11.shape[-1]
    z = jnp.zeros((3, f), k11.dtype)
    rows = []
    for ky in range(3):
        kx0, kx1, kx2 = k11[ky, 0], k11[ky, 1], k11[ky, 2]  # (3, F) each
        for blk_e, blk_o in (
                (z, z), (kx0, z),       # δ=-1: even rows, odd rows
                (kx1, kx0), (kx2, kx1),  # δ=0
                (z, kx2), (z, z)):       # δ=+1
            rows.append(jnp.concatenate([blk_e, blk_o], axis=1))
    w = jnp.concatenate(rows, axis=0)  # (54, 2F)
    # zero-pad K to 128: Mosaic's (R, W, C) -> (R*W, C) shape cast needs a
    # 128-multiple lane count, so the kernel concatenates a zero filler
    return jnp.pad(w, ((0, 128 - 54), (0, 0)))


def _mm2(a, k):
    return jax.lax.dot_general(
        a, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_stem_kernel(Wp, F, dt, lane_roll, convert_in=False):
    E = _T + 4            # raw rows per window
    R1 = _T + 2           # conv1_1 output rows (conv1_2 halo included)

    def kernel(vcc, v1, k11p, b11p, k12d, k12e, b12d,
               x_l, x_m, x_t, out_ref, pool_ref, *a1_ref):
        t = pl.program_id(1)
        r0 = t * _T

        xs = jnp.concatenate([x_l[0], x_m[0], x_t[0]], axis=0)  # (E, Wp, 6)
        if convert_in:  # raw uint8 image: normalize scale lives in k11p
            # Mosaic has no direct u8->f32 cast; widen through i32
            xs = xs.astype(jnp.int32).astype(jnp.float32)
        # im2col build: 9 shifted 6-lane views.  Two measured-and-rejected
        # restructurings (round 4): (a) a zero-row host pad killing the
        # vcc mask — padding the 6-lane image in HBM pays the 128-lane
        # tile bloat on the whole copy, ~-4% e2e; (b) a two-level build
        # (shift once into an 18-lane group, row-slice per ky) — the
        # unaligned row slices of the 18-lane buffer materialize as
        # full-tile copies, ~-3% e2e.
        views = []
        for ky in range(3):
            rows = xs[ky:ky + R1]
            for d in (-1, 0, 1):
                views.append(_shift_cols_zero(rows, d))
        views.append(jnp.zeros((R1, Wp, 128 - 54), xs.dtype))
        cc = jnp.concatenate(views, axis=-1)                    # (R1, Wp, 128)
        # raw-row zero-padding applied per ky lane-group on the 128-lane
        # im2col buffer — Mosaic rejects broadcasts onto 6-lane arrays
        cc = cc * vcc[pl.ds(r0, R1)][:, None, :]
        a1 = _mm2(cc.reshape(R1 * Wp, 128), k11p[...])
        a1 = jax.nn.relu(a1 + b11p[...])
        a1 = a1.reshape(R1, Wp, 2 * F)
        a1 = (a1 * v1[pl.ds(r0, R1)][:, None, :]).astype(dt)
        if a1_ref:  # training residual: post-relu conv1_1 rows
            a1_ref[0][0] = a1[1:_T + 1]
        y2 = _conv_rows(a1, _T, k12d, k12e, b12d, dt)           # (T, Wp, 2F)
        out_ref[0] = y2
        yf = y2.astype(jnp.float32)
        m = jnp.maximum(yf, lane_roll(yf, F))[:, :, :F]
        mp = jnp.max(m.reshape(_T // 2, 2, Wp, F), axis=1)
        pool_ref[0] = mp.astype(dt)

    return kernel


def fused_vgg_stem_impl(x, k11, b11, k12, b12, prepad_pool: bool = False,
                        prepad_skip: bool = True, want_a1: bool = False,
                        input_scale: float | None = None):
    """(B, H, W, 3) normalized image → (paired skip (B, H, W/2, 2F),
    pooled (B, H/2, W/2, F)).  Returns None for untileable shapes.

    With ``prepad_pool`` the pooled output is written block-down into an
    (H/2 + 16)-row P8 buffer (rows [8, 8+H/2) valid, boundary blocks
    uninitialized) — the layout the fused encoder blocks consume with
    ``prepad_in`` (kernels/encoder.py), so the host pad copy between the
    stem and block 2 never runs.

    With ``input_scale`` the scale (e.g. 1/255) is folded into the packed
    conv1_1 weights and ``x`` may be the RAW uint8 image: the kernel
    converts in-VMEM, so the normalize fusion and the layout copy XLA
    inserts between it and the Pallas operand (~0.4 ms/step at 512px/bs8)
    never run."""
    B, H, W, C = x.shape
    F = k11.shape[-1]
    raw_u8 = x.dtype == jnp.uint8
    dt = k12.dtype if raw_u8 else x.dtype
    if C != 3 or H % (2 * _T) or W % 4 or F % 8:
        return None
    if input_scale is not None:
        k11 = k11 * input_scale
    Wp = W // 2

    interpret = jax.default_backend() == "cpu"
    xp = x.reshape(B, H, Wp, 6)

    # vcc[q, lane] = 1 iff raw row (q - 2 + ky(lane)) is inside the image,
    # where ky(lane) = lane // 18 (lane order: ky major, 3δ × 6 per ky);
    # filler lanes (54+) are don't-care (zero weights)
    q = np.arange(H + 2 * _T).reshape(-1, 1)
    ky_of_lane = np.minimum(np.arange(128) // 18, 2).reshape(1, -1)
    raw_row = q - 2 + ky_of_lane
    vcc = ((raw_row >= 0) & (raw_row < H)).astype(np.float32)
    v1 = np.zeros((H + 2 * _T, 2 * F), np.float32)
    rows1 = np.arange(-1, H + 2 * _T - 1)
    v1[(rows1 >= 0) & (rows1 < H)] = 1.0

    k11p = _pack_conv1_weights(k11.astype(jnp.float32))
    b11p = jnp.concatenate([b11, b11]).astype(jnp.float32).reshape(1, 2 * F)
    k12d, k12e = _pair_weights(k12.astype(dt), F, F)
    b12d = jnp.concatenate([b12, b12]).astype(dt)

    grid = (B, H // _T)
    if interpret:
        # concat-based lane roll — the interpreter path
        def lane_roll(yf, f):
            return jnp.concatenate([yf[..., f:], yf[..., :f]], axis=-1)
    else:
        def lane_roll(yf, f):
            return pltpu.roll(yf, f, axis=2)
    kernel = _make_stem_kernel(Wp, F, dt, lane_roll, convert_in=raw_u8)

    coef_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
    data_specs = [
        pl.BlockSpec((1, 2, Wp, 6),
                     lambda b, t: (b, jnp.maximum(t * (_T // 2) - 1, 0),
                                   0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _T, Wp, 6), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, Wp, 6),
                     lambda b, t: (b, jnp.minimum((t + 1) * (_T // 2),
                                                  H // 2 - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # The paired skip is written one 8-row block DOWN into an (H + 16)-row
    # buffer: exactly the lead/tail-padded layout the fused decoder's
    # stage-1 kernel tiles over (it zero-masks the two uninitialized
    # boundary blocks in-kernel), so the host-side pad copy never runs.
    if prepad_pool:
        pool_shape = jax.ShapeDtypeStruct((B, H // 2 + 16, Wp, F), dt)
        # 4-row pool blocks: the 8-row lead is exactly two blocks
        pool_spec = pl.BlockSpec((1, _T // 2, Wp, F),
                                 lambda b, t: (b, t + 2, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        pool_shape = jax.ShapeDtypeStruct((B, H // 2, Wp, F), dt)
        pool_spec = pl.BlockSpec((1, _T // 2, Wp, F),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
    if prepad_skip:
        skip_shape = jax.ShapeDtypeStruct((B, H + 2 * _T, Wp, 2 * F), dt)
        skip_spec = pl.BlockSpec((1, _T, Wp, 2 * F),
                                 lambda b, t: (b, t + 1, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        skip_shape = jax.ShapeDtypeStruct((B, H, Wp, 2 * F), dt)
        skip_spec = pl.BlockSpec((1, _T, Wp, 2 * F),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
    out_shapes = [skip_shape, pool_shape]
    out_specs = [skip_spec, pool_spec]
    if want_a1:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Wp, 2 * F), dt))
        out_specs.append(pl.BlockSpec((1, _T, Wp, 2 * F),
                                      lambda b, t: (b, t, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=coef_specs + data_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(vcc).astype(dt), jnp.asarray(v1),
      k11p, b11p, k12d, k12e, b12d, xp, xp, xp)
    return res if want_a1 else (res[0], res[1])


def reference_vgg_stem(x, k11, b11, k12, b12):
    """XLA reference: conv-relu-conv-relu + 2×2 maxpool; skip is returned
    in the paired layout for shape parity with the kernel."""
    def conv(v, k, b):
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn) + b.astype(v.dtype)

    y = jax.nn.relu(conv(x, k11, b11))
    y = jax.nn.relu(conv(y, k12, b12))
    pooled = jax.lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.array(
            -jnp.inf, y.dtype),
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    B, H, W, F = y.shape
    return y.reshape(B, H, W // 2, 2 * F), pooled
