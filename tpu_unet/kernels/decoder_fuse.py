"""Fused UnetUp decoder stage — one Pallas pass per row-tile.

Computes exactly (reference: nets/unet.py:16-22)

    relu(conv2(relu(conv1(concat([skip, up2x(x)], -1)))))

without ever materialising the upsampled tensor, the concat buffer, or any
XLA relayout copy.  Round-1 HLO profiling showed the XLA composition spends
~8 ms/step (batch 8, 512px) in pure layout copies + concat-pad fusions
around the resize einsums, and runs the 64-output-channel convs at only
~70 TFLOP/s because 64 channels half-fill the 128 MXU lanes.

Design (per grid step = one batch element × T output rows):

- ×2 align-corners H-lerp of a DMA'd input row window, fully vectorised
  with the interleave + static-shift + select identity: for output row u,
  i0(u) = u//2 - 1 when u is even and > 0, else u//2 — exact for all
  0 <= u < 2H: align-corners ×2 maps u to source coordinate u·(H-1)/(2H-1),
  whose floor is i0(u) as above; exactness vs jax.image.resize is pinned by
  this file's interpret-mode tests (tests/test_decoder_fuse.py).  The input
  row window is read as three CLAMPED (T/2)-row blocks (prev/main/next) —
  no host-side pad; boundary duplicates only land on positions whose lerp
  weight is exactly 0.
- W-expansion as pure VPU lerps of rolled columns.
- conv1/conv2 as ky-shifted MXU matmuls accumulating in f32.
- "paired" mode (used when F < 128): adjacent output columns are packed
  into the channel dim, so a 192->64 conv becomes a dense 384->128 matmul
  plus two cross-pair edge matmuls — near-identical FLOPs, full MXU
  lanes.  The skip input arrives pre-paired via a free host-side reshape
  (W2, C) -> (W2/2, 2C); the output unpairs the same way.  Mosaic cannot
  concatenate lane-offset vector slices, so the paired channel order is
  [skip-even, skip-odd, up-even, up-odd] (every concat operand is an
  offset-0 value) and the edge matmuls use zero-padded weight rows
  instead of channel slices.

The public entry `fused_unetup` carries a custom VJP whose backward is the
XLA reference composition (rematerialised), so the kernel is usable inside
training steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.nn.resize import _lerp_coeffs


# ---------------------------------------------------------------------------
# host-side precomputed coefficient arrays
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _row_arrays(H: int):
    """Per-output-row arrays for the H axis, indexed by p = u + 2 so the
    2-row conv halo fits: hw (lerp weight), hsel (1 where i0(u) = u//2,
    i.e. u odd or u == 0), valid (1 for 0 <= u < 2H)."""
    H2 = 2 * H
    u = np.arange(-2, H2 + 2)
    valid = ((u >= 0) & (u < H2)).astype(np.float32)
    uc = np.clip(u, 0, H2 - 1)
    _, _, w = _lerp_coeffs(H, H2, True)
    hw = w[uc] * valid
    hsel = (((u % 2) != 0) | (u == 0)).astype(np.float32)
    return (hw.reshape(-1, 1).astype(np.float32),
            hsel.reshape(-1, 1),
            valid.reshape(-1, 1))


@functools.lru_cache(maxsize=None)
def _row_arrays_eo(H: int):
    """Per-PARITY H-lerp tables for `_h_upsample_rows_eo` — the
    cheaper even/odd formulation of the ×2 align-corners row lerp.

    Sequence index q covers the kernels' row window [r0-2, r0+T+2):
    even rows u = 2(q-1) and odd rows u = 2q-1, both sliced at
    pl.ds(r0//2, E//2).  Weights carry the row-validity fold and the
    u=0 clamp (h[0] = x[0] → (wa, wb) = (0, 1)), so
    h = xs_a·wa + xs_b·wb needs no select and no separate valid pass:

      even seq r (u = r0-2+2r):  a = xs[r],     b = xs[r+1]
      odd  seq r (u = r0-1+2r):  a = xs[r+1],   b = xs[r+2]
    """
    H2 = 2 * H
    _, _, w = _lerp_coeffs(H, H2, True)
    q = np.arange(H2 // 2 + 2)
    ue = 2 * (q - 1)
    uo = 2 * q - 1
    ve = ((ue >= 0) & (ue < H2)).astype(np.float32)
    vo = ((uo >= 0) & (uo < H2)).astype(np.float32)
    we_ = w[np.clip(ue, 0, H2 - 1)]
    wo_ = w[np.clip(uo, 0, H2 - 1)]
    wa_e = (1.0 - we_) * ve
    wb_e = we_ * ve
    wa_e[ue == 0] = 0.0   # u=0 clamps to x[0] (= b operand)
    wb_e[ue == 0] = 1.0
    wa_o = (1.0 - wo_) * vo
    wb_o = wo_ * vo
    return tuple(a.reshape(-1, 1).astype(np.float32)
                 for a in (wa_e, wb_e, wa_o, wb_o))


def _eo_tables(hwu, hselu, validu, i, T, E):
    """Slice the per-parity H-lerp tables at sequence base r0//2 = i·T/2.

    Mosaic requires dynamic row-slice starts to be provably multiples of
    8; i·(T/2) only is when T/2 % 8 == 0 (T=16).  For T=8 the slice
    starts at a rounded base (i//2)·T — provably a multiple of 8 — and a
    scalar select picks the 0- or 4-row offset window."""
    half = T // 2
    Eh = E // 2
    if half % 8 == 0:
        q0 = i * half
        wae = hwu[pl.ds(q0, Eh)][:, None, :]
        wbe = hselu[pl.ds(q0, Eh)][:, None, :]
        wao = validu[pl.ds(q0, Eh), 0:1]
        wbo = validu[pl.ds(q0, Eh), 1:2]
        return wae, wbe, wao, wbo
    qb = (i // 2) * T
    even_step = (i % 2) == 0

    def tab2(ref):
        w = ref[pl.ds(qb, Eh + half)]
        return jnp.where(even_step, w[0:Eh], w[half:half + Eh])[:, None, :]

    wae, wbe = tab2(hwu), tab2(hselu)
    w2 = validu[pl.ds(qb, Eh + half)]
    wv = jnp.where(even_step, w2[0:Eh], w2[half:half + Eh])
    return wae, wbe, wv[:, 0:1], wv[:, 1:2]


def _h_upsample_rows_eo(xs, wa_e, wb_e, wa_o, wb_o, E):
    """×2 align-corners H-lerp as two per-parity lerps + a row
    interleave — ~half the VPU passes of `_h_upsample_rows` (no E-row
    dup concats, no selects, no separate valid multiply).  Requires the
    lane count to be a 128-multiple (the (E/2, 2, W, C) interleave
    reshape is an unsupported Mosaic shape cast below that).  The
    weight tables arrive (E/2, 1, C) pre-broadcast, parity-sliced by
    the caller at pl.ds(r0//2, E//2)."""
    Eh = E // 2
    he = xs[0:Eh] * wa_e + xs[1:1 + Eh] * wb_e
    ho = xs[1:1 + Eh] * wa_o + xs[2:2 + Eh] * wb_o
    st = jnp.concatenate([he[:, None], ho[:, None]], axis=1)
    return st.reshape(E, xs.shape[1], xs.shape[2])


@functools.lru_cache(maxsize=None)
def _col_arrays(W: int):
    """Even/odd-column lerp weights for the ×2 W axis: we[j] = w(2j),
    wo[j] = w(2j+1)."""
    _, _, w = _lerp_coeffs(W, 2 * W, True)
    return (w[0::2].reshape(-1, 1).astype(np.float32),
            w[1::2].reshape(-1, 1).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _lowres_col_coeffs(W: int, F: int):
    """(8, W, F) per-column coefficients for the LOW-RES up-half of
    conv1 (`_wide_kernel_lowres`).

    The ×2 W-lerp's per-column scalars commute with the channel
    contraction, so conv1's up contribution can be computed as
    per-(ky, kx) matmuls P_k = h @ k_up[ky, kx] and recombined per
    output column pair j from P_k[j-1], P_k[j], P_k[j+1]:

      even_out[j] = kx0·odd[j-1] + kx1·even[j] + kx2·odd[j]
                  = a0·P0[j-1] + b0·P0[j] + c1·P1[j-1] + d1·P1[j]
                    + e0·P2[j] + f0·P2[j+1]
      odd_out[j]  = kx0·even[j] + kx1·odd[j] + kx2·even[j+1]
                  = c1·P0[j-1] + d1·P0[j] + e0·P1[j] + f0·P1[j+1]
                    + e2·P2[j] + f2·P2[j+1]

    with even[j] = (1-we_j)h[j-1∨0] + we_j·h[j] and odd[j] =
    (1-wo_j)h[j] + wo_j·h[j+1∧W-1] (`_w_expand_pair`).  Boundary
    folding: odd[-1] / even[W] are out-of-image columns (zero); the
    j=0 lerp clamp becomes (c1, d1)[0] = (0, 1); wo[W-1] = 0 already
    encodes the right-edge clamp."""
    we, wo = (c.ravel() for c in _col_arrays(W))
    a0 = np.concatenate([[0.0], 1.0 - wo[:-1]])
    b0 = np.concatenate([[0.0], wo[:-1]])
    c1 = np.where(np.arange(W) == 0, 0.0, 1.0 - we)
    d1 = np.where(np.arange(W) == 0, 1.0, we)
    e0 = 1.0 - wo
    f0 = wo
    e2 = np.concatenate([1.0 - we[1:], [0.0]])
    f2 = np.concatenate([we[1:], [0.0]])
    cols = np.stack([a0, b0, c1, d1, e0, f0, e2, f2]).astype(np.float32)
    return np.repeat(cols.reshape(8, W, 1), F, axis=2)


@functools.lru_cache(maxsize=None)
def _lowres_col_coeffs_paired(W: int, F: int):
    """(7, W, 2F) lane-blocked coefficients for the PAIRED low-res
    up-half (F < 128).  The products are computed against duplicated
    weight blocks [kx|kx] so each P̂_k is already 2F = 128 lanes, and
    the even/odd output terms combine as lane-blocked coefficient pairs
    — no sub-128-lane slicing anywhere:

      u = [a0|c1]·s(P̂0,-1) + [b0|d1]·P̂0 + [c1|0]·s(P̂1,-1)
          + [d1|e0]·P̂1 + [0|f0]·s(P̂1,+1) + [e0|e2]·P̂2 + [f0|f2]·s(P̂2,+1)

    (same scalars as `_lowres_col_coeffs`)."""
    c = _lowres_col_coeffs(W, 1)[:, :, 0]        # (8, W) scalars
    a0, b0, c1, d1, e0, f0, e2, f2 = c
    z = np.zeros_like(a0)

    def blk(lo, hi):
        col = np.concatenate([np.repeat(lo.reshape(-1, 1), F, axis=1),
                              np.repeat(hi.reshape(-1, 1), F, axis=1)],
                             axis=1)
        return col

    cols = np.stack([blk(a0, c1), blk(b0, d1), blk(c1, z), blk(d1, e0),
                     blk(z, f0), blk(e0, e2), blk(f0, f2)])
    return cols.astype(np.float32)               # (7, W, 2F)


def _pick_tile(H2: int, W: int, c_total: int, itemsize: int,
               cx: int = 0) -> int:
    """Output-row tile size.  The halo-block pipeline needs T >= 8 and
    T | H2.  Caps calibrated on v5e with the 100 MB scoped-VMEM limit
    (CompilerParams below): T=16 halves the grid-step count and measured
    faster for the wide shallow stages, but slower once the upsampled
    feature is deep (Cx > 384: the f32 lerp window stops fitting cleanly)."""
    for t in (16, 8):
        cap = (6 << 20) if t == 16 else (8 << 20)
        if t == 16 and cx > 384:
            continue
        if H2 % t == 0 and t * W * c_total * itemsize <= cap:
            return t
    return 8  # caller rejects if H2 % 8 != 0


# ---------------------------------------------------------------------------
# kernel building blocks
# ---------------------------------------------------------------------------

def _h_upsample_rows(xs, hw_b, hsel_b, r0, H2, E):
    """Vectorised H-axis ×2 align-corners lerp of the row window ``xs``
    ((win, W, C)) into (E, W, C) output rows, zeroed where the output row
    (global r0 - 2 + e) is outside the image.  hw_b/hsel_b arrive (E, C)
    pre-broadcast on lanes — Mosaic can only broadcast narrow dtypes
    along sublanes."""
    win = xs.shape[0]

    # row duplication as a static concat of leading-dim slices
    # (repw[r] = xs[r // 2]): the rank-4 broadcast+reshape interleave this
    # replaces is an "unsupported shape cast" in Mosaic whenever the lane
    # count isn't a 128-multiple (e.g. the 64-channel up_conv head)
    def dup(o):
        idx = [min((e + o) // 2, win - 1) for e in range(E)]
        return jnp.concatenate([xs[i:i + 1] for i in idx], axis=0)

    s0, s2, s4 = dup(0), dup(2), dup(4)
    # coefficient tables may arrive (E, 1, C) pre-shaped: the in-kernel
    # rank expansion below is another unsupported-at-64-lanes shape cast
    if hw_b.ndim == 2:
        hw_b = hw_b[:, None, :]
        hsel_b = hsel_b[:, None, :]
    sel = hsel_b != 0.0
    lo = jnp.where(sel, s2, s0)
    hi = jnp.where(sel, s4, s2)
    # row-validity is folded into hw (OOB rows have weight 0) — zeroing
    # happens via the valid multiply at the call sites
    return lo + (hi - lo) * hw_b


def _h_upsample_mxu(xs2d, hwc, hselc, validc, E, win, dt, acc_dt=jnp.float32):
    """H-axis ×2 lerp as ONE small MXU matmul: h = L @ xs.

    xs2d is the 2D row window (win, W*C); L (E, win) is built in-register
    from the compact per-row coefficient columns — L[e, lo(e)] = valid-hw,
    L[e, lo(e)+1] = hw, where lo(e) = (e+2)//2 if hsel else e//2 (the same
    interleave identity the VPU path used).  Out-of-image rows fold to
    all-zero L rows, so no separate validity pass is needed.  Replaces the
    repw-interleave + two selects + lerp chain (~7 VPU passes over
    (E, W, C)) with a (E, win)x(win, W*C) contraction.
    """
    ein = jax.lax.broadcasted_iota(jnp.int32, (E, win), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (E, win), 1)
    lo_i = jnp.where(hselc != 0.0, (ein + 2) // 2, ein // 2)
    a = validc - hwc                       # valid*(1-w); 0 for OOB rows
    L = jnp.where(li == lo_i, a, 0.0) + jnp.where(li == lo_i + 1, hwc, 0.0)
    out = jax.lax.dot_general(
        L.astype(dt), xs2d,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # Mosaic: matmul acc is 32-bit
    return out if acc_dt == jnp.float32 else out.astype(acc_dt)


def _w_expand_pair_2d(h2, we2, wo2, C):
    """2D-lane-space ×2 W-lerp of h2 (E, W*C) f32: shifts by one
    column-group are offset-0 / 128-aligned lane concats (C is a
    multiple of 128 for every decoder stage)."""
    hm1 = jnp.concatenate([h2[:, :C], h2[:, :-C]], axis=1)
    hp1 = jnp.concatenate([h2[:, C:], h2[:, -C:]], axis=1)
    even = hm1 + (h2 - hm1) * we2
    odd = h2 + (hp1 - h2) * wo2
    return even, odd


def _shift_cols_zero(a, d):
    """out[:, j] = a[:, j + d], zero where j + d is out of range.

    Static slice + concat with an offset-0 zero block — the only column
    shift Mosaic accepts here (dynamic_rotate is 32-bit-only, and concat
    rejects lane-offset operands, which rules out channel-sliced inputs).
    """
    if d == 0:
        return a
    z = jnp.zeros_like(a[:, :abs(d)])
    if d > 0:
        return jnp.concatenate([a[:, d:], z], axis=1)
    return jnp.concatenate([z, a[:, :d]], axis=1)


def _w_expand_pair(h, we, wo):
    """(E, W, C) f32 -> even/odd ×2-upsampled column lerps, each (E, W, C).

    even[:, j] = lerp(h[:, max(j-1, 0)], h[:, j], we[j])
    odd[:, j]  = lerp(h[:, j], h[:, min(j+1, W-1)], wo[j])
    """
    xm1 = jnp.concatenate([h[:, :1], h[:, :-1]], axis=1)
    xp1 = jnp.concatenate([h[:, 1:], h[:, -1:]], axis=1)
    even = xm1 + (h - xm1) * we
    odd = h + (xp1 - h) * wo
    return even, odd


def _mm(a, k):
    """(R, W, C) x (C, F) matmul on the MXU with f32 accumulation."""
    r, w, c = a.shape
    out = jax.lax.dot_general(
        a.reshape(r * w, c), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(r, w, k.shape[1])


def _conv_rows_acc(src, R, kd, ke):
    """`_conv_rows` without the bias/activation epilogue (raw f32 acc),
    so a caller can sum several conv contributions before rounding."""
    res = _mm(src[0:R], ke[0])
    for ky in (1, 2):
        res += _mm(src[ky:ky + R], ke[ky])
    F2 = res.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, res.shape, 2)
    acc = jnp.where(lane < F2 // 2,
                    _shift_cols_zero(res, -1), _shift_cols_zero(res, 1))
    for ky in (0, 1, 2):
        acc += _mm(src[ky:ky + R], kd[ky])
    return acc


def _conv_rows(src, R, kd, ke, bd, dt, relu=True):
    """One paired 3x3 conv: dense per-ky matmuls plus ONE combined
    cross-pair edge matmul.  src is (R+2, W, C) in paired channel
    order; output (R, W, 2F) = relu(conv + bias) (or just conv + bias
    with ``relu=False`` — the backward kernels run the same conv
    structure with flipped/transposed weights and no activation).

    The two edge terms (odd[j-1]->even-out and even[j+1]->odd-out) share
    a single (2C, 2F) matmul so the MXU always sees 2F >= 128 output
    lanes — separate F-lane edge matmuls ran the MXU at half rate and
    capped the whole conv at 50% efficiency.  Column shifts commute with
    per-position matmuls, so the halves are split afterwards with two
    sublane shifts of the f32 result and a lane-select."""
    acc = _conv_rows_acc(src, R, kd, ke)
    out = acc.astype(dt) + bd[...][None, :]
    return jax.nn.relu(out) if relu else out


def _pair_weights_eo(k):
    """Plane-paired conv weights for channel order [E-plane | O-plane]
    (all Cp even-column channels first, then all odd).  Returns
    (kd (3, 2C, 2F), k_eo (3, C, F), k_ee (3, C, F)):

      kd:   dense per-ky block matrix [[kx1, kx0], [kx2, kx1]] — output
            columns [even F | odd F].
      k_eo: the pair j-1 → even-output edge (kx0, applied to the O plane).
      k_ee: the pair j+1 → odd-output edge (kx2, applied to the E plane).

    Unlike `_pair_weights`' combined (2C, 2F) edge matmul (needed at
    F < 128 where separate F-lane matmuls half-fill the MXU), the two
    edges here run as SEPARATE full-lane (C, F) matmuls — at F >= 128
    that wastes nothing, so the conv has NO FLOP overhead vs natural."""
    kx0, kx1, kx2 = k[:, 0], k[:, 1], k[:, 2]
    kd = jnp.concatenate([
        jnp.concatenate([kx1, kx0], axis=-1),
        jnp.concatenate([kx2, kx1], axis=-1)], axis=1)
    return kd, kx0, kx2


def _conv_rows_wide_acc(src, R, kd, keo, kee):
    """`_conv_rows_wide` without the bias/activation epilogue: the raw
    f32 accumulator, so a caller can sum several conv contributions
    (skip-part + low-res up-part) before rounding to the compute dtype."""
    C2 = src.shape[-1]
    C = C2 // 2
    acc = _mm(src[0:R], kd[0])
    eo = _mm(src[0:R, :, C:], keo[0])
    ee = _mm(src[0:R, :, :C], kee[0])
    for ky in (1, 2):
        acc += _mm(src[ky:ky + R], kd[ky])
        eo += _mm(src[ky:ky + R, :, C:], keo[ky])
        ee += _mm(src[ky:ky + R, :, :C], kee[ky])
    acc += jnp.concatenate([_shift_cols_zero(eo, -1),
                            _shift_cols_zero(ee, 1)], axis=-1)
    return acc


def _conv_rows_wide(src, R, kd, keo, kee, bd, dt, relu=True):
    """One plane-paired 3x3 conv for F >= 128: dense per-ky matmuls plus
    two separate full-lane edge matmuls.  src is (R+2, W, 2C) in
    [E-plane | O-plane] channel order; output (R, W, 2F) = [even | odd]
    output columns per pair (the standard paired layout)."""
    acc = _conv_rows_wide_acc(src, R, kd, keo, kee)
    out = acc.astype(dt) + bd[...][None, :]
    return jax.nn.relu(out) if relu else out


def _wide_kernel(T, E, win, Cs, Cx, F, H2, W, dt, want_y1=False,
                 mxu_lerp=False, lerp_dt=jnp.float32, lead_off=0,
                 clamp3=False):
    """Plane-paired kernel for the F >= 128 decoder stages (up2/up3).

    The natural-layout kernel paid ~1.9 ms/step (stage 2, 512px bs8)
    interleaving the upsample's even/odd column planes into the W2-wide
    cc buffer — a pure sublane-shuffle relayout.  Here the planes feed
    the convs DIRECTLY as the [E | O] channel blocks of `_conv_rows_wide`
    (skip joins via one in-register pair fold, 4x less data), and only
    the final (T, W, 2F) bf16 result is interleaved back to the natural
    layout — measured 5.69 vs 7.12 ms on the stage-2 shape."""
    def kernel(hw, hsel, valid, valid1, skv, we, wo,
               k1d, k1eo, k1ee, b1p, k2d, k2eo, k2ee, b2p,
               *rest):
        if clamp3:
            sk_a, sk_b, sk_c, x_l, x_m, x_h, out_ref, *y1_ref = rest
        else:
            sk_m, sk_h, x_l, x_m, x_h, out_ref, *y1_ref = rest
        i = pl.program_id(1)
        r0 = i * T

        if mxu_lerp:
            xs2d = jnp.concatenate(
                [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
            h2 = _h_upsample_mxu(xs2d, hw[pl.ds(r0, E)],
                                 hsel[pl.ds(r0, E)], valid[pl.ds(r0, E)],
                                 E, win, dt, acc_dt=lerp_dt)
            even2, odd2 = _w_expand_pair_2d(h2, we[...], wo[...], Cx)
            even = even2.reshape(E, W, Cx).astype(dt)
            odd = odd2.reshape(E, W, Cx).astype(dt)
        else:
            xs = jnp.concatenate(
                [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
            h = _h_upsample_rows(xs, hw[pl.ds(r0, E)],
                                 hsel[pl.ds(r0, E)], r0, H2, E)
            h = h * valid[pl.ds(r0, E)][:, None, :]
            even, odd = _w_expand_pair(h, we[...][None], wo[...][None])
            even = even.astype(dt)
            odd = odd.astype(dt)
        if clamp3:
            # three row-clamped blocks — no host pad; where-select
            # (NaN-safe) restores the zero padding at the image edges
            sk = jnp.concatenate([sk_a[0], sk_b[0], sk_c[0]],
                                 axis=0)[T - 2:2 * T + 2]
            sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0, sk,
                           jnp.zeros_like(sk))
        else:
            sk = jnp.concatenate(
                [sk_m[0, lead_off:], sk_h[0, :4 + lead_off]], axis=0)
            if lead_off:
                # prepadded producer buffer (P8): boundary blocks are
                # uninitialized — where-select (NaN-safe) restores the
                # zero padding the conv expects
                sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0,
                               sk, jnp.zeros_like(sk))
        # sk arrives HOST-pre-paired (T+4, W, 2Cs): the in-kernel
        # (E, W2, Cs)→(E, W, 2Cs) lane-merge produced a degenerate
        # (1,128) layout that made the downstream row-merge reshape an
        # invalid Mosaic layout at 2Cs = 2048 (resnet50's up4)
        skp = sk
        cc = jnp.concatenate([skp[:, :, :Cs], even,
                              skp[:, :, Cs:], odd], axis=-1)
        y1 = _conv_rows_wide(cc, T + 2, k1d, k1eo, k1ee, b1p, dt)
        y1 = y1 * valid1[pl.ds(r0, T + 2)][:, None, :]
        if want_y1:  # training residual, saved PAIRED [E|O]
            y1_ref[0][0] = y1[1:T + 1]
        outp = _conv_rows_wide(y1, T, k2d, k2eo, k2ee, b2p, dt)
        oE, oO = outp[:, :, :F], outp[:, :, F:]
        st = jnp.concatenate([oE[:, :, None], oO[:, :, None]], axis=2)
        out_ref[0] = st.reshape(T, 2 * W, F)

    return kernel


def _wide_kernel_lowres(T, E, win, Cs, Cx, F, H2, W, dt, want_y1=False,
                        lead_off=0, clamp3=False, eo_lerp=False):
    """`_wide_kernel` with the LOW-RES up-half of conv1: instead of
    materialising the ×2-upsampled map and contracting it at full
    resolution, the per-(ky, kx) channel contractions run on the RAW
    low-res x window (one (Cx → 3F) matmul per ky over win rows — ~45%
    of the rows), the W-lerp is applied to the F-lane partials via the
    host-precomputed `_lowres_col_coeffs`, and the H-lerp runs on the
    2F-lane combined terms.  Per-row/per-column lerp scalars commute
    with the channel contraction, so the result is exact (same math,
    reassociated).  Cuts conv1's up-half MACs ~3.6× — ~30% of the
    stage's total FLOPs at the production shapes (Cx = 2·Cs = 2F)."""
    def kernel(hwu, hselu, validu, valid1, skv, colc,
               k1sd, k1seo, k1see, kup, b1p, k2d, k2eo, k2ee, b2p,
               *rest):
        if clamp3:
            sk_a, sk_b, sk_c, x_l, x_m, x_h, out_ref, *y1_ref = rest
        else:
            sk_m, sk_h, x_l, x_m, x_h, out_ref, *y1_ref = rest
        i = pl.program_id(1)
        r0 = i * T

        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]

        # ---- up-half of conv1 at LOW-RES rows ----
        cc8 = [colc[k][None] for k in range(8)]
        a0, b0, c1, d1, e0, f0, e2, f2 = cc8
        if eo_lerp:
            # per-parity tables (hwu→wa_e, hselu→wb_e, validu→(rows,2,C)
            # stacked [wa_o | wb_o] so the 3 coef slots are reused)
            wae, wbe, wao, wbo = _eo_tables(hwu, hselu, validu, i, T, E)
        else:
            hwv = hwu[pl.ds(r0, E)]
            hsv = hselu[pl.ds(r0, E)]
            vv = validu[pl.ds(r0, E)][:, None, :]
        acc_up = None
        for ky in range(3):
            p = _mm(xs, kup[ky])                       # (win, W, 3F) f32
            p0, p1, p2 = p[:, :, :F], p[:, :, F:2 * F], p[:, :, 2 * F:]
            s0m = _shift_cols_zero(p0, -1)
            s1m = _shift_cols_zero(p1, -1)
            s1p = _shift_cols_zero(p1, 1)
            s2p = _shift_cols_zero(p2, 1)
            ue = (a0 * s0m + b0 * p0 + c1 * s1m + d1 * p1
                  + e0 * p2 + f0 * s2p)
            uo = (c1 * s0m + d1 * p0 + e0 * p1 + f0 * s1p
                  + e2 * p2 + f2 * s2p)
            u = jnp.concatenate([ue, uo], axis=-1)     # (win, W, 2F) f32
            if eo_lerp:
                q = _h_upsample_rows_eo(u, wae, wbe, wao, wbo, E)
            else:
                q = _h_upsample_rows(u, hwv, hsv, r0, H2, E) * vv
            acc_up = (q[ky:ky + T + 2] if acc_up is None
                      else acc_up + q[ky:ky + T + 2])

        # ---- skip-half of conv1 (plane-paired dense + edges) ----
        if clamp3:
            sk = jnp.concatenate([sk_a[0], sk_b[0], sk_c[0]],
                                 axis=0)[T - 2:2 * T + 2]
            sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0, sk,
                           jnp.zeros_like(sk))
        else:
            sk = jnp.concatenate(
                [sk_m[0, lead_off:], sk_h[0, :4 + lead_off]], axis=0)
            if lead_off:
                sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0,
                               sk, jnp.zeros_like(sk))
        # host-pre-paired (see `_wide_kernel`): no in-kernel lane merge
        skp = sk
        acc_sk = _conv_rows_wide_acc(skp, T + 2, k1sd, k1seo, k1see)

        y1 = jax.nn.relu((acc_sk + acc_up).astype(dt) + b1p[...][None, :])
        y1 = y1 * valid1[pl.ds(r0, T + 2)][:, None, :]
        if want_y1:  # training residual, saved PAIRED [E|O]
            y1_ref[0][0] = y1[1:T + 1]
        outp = _conv_rows_wide(y1, T, k2d, k2eo, k2ee, b2p, dt)
        oE, oO = outp[:, :, :F], outp[:, :, F:]
        st = jnp.concatenate([oE[:, :, None], oO[:, :, None]], axis=2)
        out_ref[0] = st.reshape(T, 2 * W, F)

    return kernel


def _paired_kernel(T, E, win, Cs, Cx, F, H2, W, dt, want_y1=False,
                   lead_off=0, mxu_lerp=False, lerp_dt=jnp.float32,
                   clamp3=False):
    def kernel(hw, hsel, valid, valid1, skv, we, wo,
               k1d, k1e, b1d, k2d, k2e, b2d, *rest):
        if clamp3:
            sk_a, sk_b, sk_c, x_l, x_m, x_h, out_ref, *y1_ref = rest
        else:
            sk_m, sk_h, x_l, x_m, x_h, out_ref, *y1_ref = rest
        i = pl.program_id(1)
        r0 = i * T

        if mxu_lerp:
            xs2d = jnp.concatenate(
                [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
            h2 = _h_upsample_mxu(xs2d, hw[pl.ds(r0, E)],
                                 hsel[pl.ds(r0, E)], valid[pl.ds(r0, E)],
                                 E, win, dt, acc_dt=lerp_dt)
            even2, odd2 = _w_expand_pair_2d(h2, we[...], wo[...], Cx)
            even = even2.reshape(E, W, Cx).astype(dt)
            odd = odd2.reshape(E, W, Cx).astype(dt)
        else:
            xs = jnp.concatenate(
                [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
            h = _h_upsample_rows(xs, hw[pl.ds(r0, E)],
                                 hsel[pl.ds(r0, E)], r0, H2, E)
            h = h * valid[pl.ds(r0, E)][:, None, :]
            even, odd = _w_expand_pair(h, we[...][None], wo[...][None])
        # paired channel order [skip-even, skip-odd, up-even, up-odd];
        # every operand is an offset-0 value (Mosaic concat constraint)
        if clamp3:
            sk = jnp.concatenate([sk_a[0], sk_b[0], sk_c[0]],
                                 axis=0)[T - 2:2 * T + 2]
            sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0, sk,
                           jnp.zeros_like(sk))
        else:
            sk = jnp.concatenate(
                [sk_m[0, lead_off:], sk_h[0, :4 + lead_off]], axis=0)
            if lead_off:
                # pre-padded producer buffer: the two boundary blocks are
                # uninitialized — a where-select (NaN-safe) zeroes the
                # out-of-image halo rows the conv must see as zero padding
                sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0,
                               sk, jnp.zeros_like(sk))
        cc = jnp.concatenate([sk, even, odd], axis=-1)

        y1 = _conv_rows(cc, T + 2, k1d, k1e, b1d, dt)
        y1 = y1 * valid1[pl.ds(r0, T + 2)][:, None, :]
        if want_y1:  # training residual: the post-relu conv1 activation
            y1_ref[0][0] = y1[1:T + 1]
        out_ref[0] = _conv_rows(y1, T, k2d, k2e, b2d, dt)

    return kernel


def _paired_kernel_lowres(T, E, win, Cs, Cx, F, H2, W, dt, want_y1=False,
                          lead_off=0, clamp3=False, eo_lerp=False):
    """`_paired_kernel` with the LOW-RES up-half of conv1 (F < 128).

    Same commutation as `_wide_kernel_lowres`, but the per-(ky, kx)
    products are computed against DUPLICATED weight blocks [kx|kx] so
    each P̂_k is already 2F = 128 lanes, and the even/odd output terms
    combine through the 7 lane-blocked coefficient maps of
    `_lowres_col_coeffs_paired` — no sub-128-lane slicing anywhere."""
    def kernel(hwu, hselu, validu, valid1, skv, colc,
               k1sd, k1se, kup, b1d, k2d, k2e, b2d, *rest):
        if clamp3:
            sk_a, sk_b, sk_c, x_l, x_m, x_h, out_ref, *y1_ref = rest
        else:
            sk_m, sk_h, x_l, x_m, x_h, out_ref, *y1_ref = rest
        i = pl.program_id(1)
        r0 = i * T
        F2 = 2 * F

        xs = jnp.concatenate(
            [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
        cc7 = [colc[k][None] for k in range(7)]
        if eo_lerp:
            wae, wbe, wao, wbo = _eo_tables(hwu, hselu, validu, i, T, E)
        else:
            hwv = hwu[pl.ds(r0, E)]
            hsv = hselu[pl.ds(r0, E)]
            vv = validu[pl.ds(r0, E)][:, None, :]
        acc_up = None
        for ky in range(3):
            p = _mm(xs, kup[ky])                   # (win, W, 3·2F) f32
            p0 = p[:, :, :F2]
            p1 = p[:, :, F2:2 * F2]
            p2 = p[:, :, 2 * F2:]
            s0m = _shift_cols_zero(p0, -1)
            s1m = _shift_cols_zero(p1, -1)
            s1p = _shift_cols_zero(p1, 1)
            s2p = _shift_cols_zero(p2, 1)
            u = (cc7[0] * s0m + cc7[1] * p0 + cc7[2] * s1m + cc7[3] * p1
                 + cc7[4] * s1p + cc7[5] * p2 + cc7[6] * s2p)
            if eo_lerp:
                q = _h_upsample_rows_eo(u, wae, wbe, wao, wbo, E)
            else:
                q = _h_upsample_rows(u, hwv, hsv, r0, H2, E) * vv
            acc_up = (q[ky:ky + T + 2] if acc_up is None
                      else acc_up + q[ky:ky + T + 2])

        if clamp3:
            sk = jnp.concatenate([sk_a[0], sk_b[0], sk_c[0]],
                                 axis=0)[T - 2:2 * T + 2]
            sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0, sk,
                           jnp.zeros_like(sk))
        else:
            sk = jnp.concatenate(
                [sk_m[0, lead_off:], sk_h[0, :4 + lead_off]], axis=0)
            if lead_off:
                sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0,
                               sk, jnp.zeros_like(sk))
        acc_sk = _conv_rows_acc(sk, T + 2, k1sd, k1se)

        y1 = jax.nn.relu((acc_sk + acc_up).astype(dt) + b1d[...][None, :])
        y1 = y1 * valid1[pl.ds(r0, T + 2)][:, None, :]
        if want_y1:  # training residual: the post-relu conv1 activation
            y1_ref[0][0] = y1[1:T + 1]
        out_ref[0] = _conv_rows(y1, T, k2d, k2e, b2d, dt)

    return kernel


def _unpaired_kernel(T, E, win, Cs, Cx, F, H2, W, dt, want_y1=False,
                     mxu_lerp=False, lerp_dt=jnp.float32, lead_off=0,
                     clamp3=False):
    def kernel(hw, hsel, valid, valid1, skv, we, wo,
               k1, b1, k2, b2, *rest):
        if clamp3:
            sk_a, sk_b, sk_c, x_l, x_m, x_h, out_ref, *y1_ref = rest
        else:
            sk_m, sk_h, x_l, x_m, x_h, out_ref, *y1_ref = rest
        i = pl.program_id(1)
        r0 = i * T

        if mxu_lerp:
            xs2d = jnp.concatenate(
                [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
            h2 = _h_upsample_mxu(xs2d, hw[pl.ds(r0, E)],
                                 hsel[pl.ds(r0, E)], valid[pl.ds(r0, E)],
                                 E, win, dt, acc_dt=lerp_dt)
            even2, odd2 = _w_expand_pair_2d(h2, we[...], wo[...], Cx)
            even = even2.reshape(E, W, Cx).astype(dt)
            odd = odd2.reshape(E, W, Cx).astype(dt)
        else:
            xs = jnp.concatenate(
                [x_l[0], x_m[0], x_h[0]], axis=0)[T // 2 - 2:T // 2 - 2 + win]
            h = _h_upsample_rows(xs, hw[pl.ds(r0, E)],
                                 hsel[pl.ds(r0, E)], r0, H2, E)
            h = h * valid[pl.ds(r0, E)][:, None, :]
            even, odd = _w_expand_pair(h, we[...][None], wo[...][None])
        # interleave columns: ups[:, 2j] = even[:, j], ups[:, 2j+1] = odd[:, j]
        st = jnp.concatenate([even[:, :, None], odd[:, :, None]], axis=2)
        ups = st.reshape(E, 2 * even.shape[1], even.shape[2])
        if clamp3:
            sk = jnp.concatenate([sk_a[0], sk_b[0], sk_c[0]],
                                 axis=0)[T - 2:2 * T + 2]
            sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0, sk,
                           jnp.zeros_like(sk))
        else:
            sk = jnp.concatenate(
                [sk_m[0, lead_off:], sk_h[0, :4 + lead_off]], axis=0)
            if lead_off:
                # prepadded producer buffer (P8): boundary blocks are
                # uninitialized — where-select (NaN-safe) restores the
                # zero padding the conv expects
                sk = jnp.where(skv[pl.ds(r0, T + 4)][:, None, :] != 0.0,
                               sk, jnp.zeros_like(sk))
        cc = jnp.concatenate([sk, ups], axis=-1)

        def conv3(src, R, k, bias):
            # INPUT-side kx shifts, shared across ky (A/B:
            # TPU_UNET_ENC_INSHIFT; see encoder.py::_conv3_kxsum).  (A
            # wide-K variant — kx folded into the contraction dim —
            # measured +4% in isolation but -9% e2e: the 3x concat
            # buffer wrecks the grid pipeline's VMEM headroom.)
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

        y1 = conv3(cc, T + 2, k1, b1)
        y1 = y1 * valid1[pl.ds(r0, T + 2)][:, None, :]
        if want_y1:  # training residual: the post-relu conv1 activation
            y1_ref[0][0] = y1[1:T + 1]
        out_ref[0] = conv3(y1, T, k2, b2)

    return kernel


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _pair_weights(k, Cs, F):
    """Paired-space conv weights for channel order [sE, sO, uE, uO] (skip
    pre-paired by the host reshape, upsample produced as even/odd blocks).

    Returns (kd, ke):
      kd (3, 2C, 2F): dense per-ky block matrix; output order [even, odd].
      ke (3, 2C, 2F): combined edge matrix — output columns [0:F] carry
        the pair j-1 -> even-output term (odd-input rows of k[:, 0]),
        columns [F:2F] the pair j+1 -> odd-output term (even-input rows
        of k[:, 2]).  One full-lane matmul; the caller splits the halves
        with opposing column shifts.
    """
    kx0, kx1, kx2 = k[:, 0], k[:, 1], k[:, 2]  # (3, C, F) each
    zc = jnp.zeros_like(kx1)

    def order(block_e, block_o):
        # channel sections [sE, sO, uE, uO] from (3, C, F) blocks whose
        # rows are the original concat order [skip(Cs), up(C - Cs)]
        return jnp.concatenate([
            block_e[:, :Cs], block_o[:, :Cs],
            block_e[:, Cs:], block_o[:, Cs:]], axis=1)

    kd = jnp.concatenate([order(kx1, kx2), order(kx0, kx1)], axis=-1)
    ke = jnp.concatenate([order(zc[:, :, :F], kx0),
                          order(kx2, zc[:, :, :F])], axis=-1)
    return kd, ke


def _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2, block_rows=None,
                           keep_paired=False, skip_paired=False,
                           want_y1=False, allow_deep=False):
    _, H, W, Cx = x.shape
    H2, W2 = 2 * H, 2 * W
    # a producer (the fused stem / encoder blocks) may hand the skip over
    # PRE-PADDED: 8 lead + 8 tail rows, written one block down
    # (kernels/stem.py, kernels/encoder.py P8 convention)
    skip_prepadded = skip.shape[1] == H2 + 16
    if skip_paired:
        B, _, Wh, Cs2 = skip.shape
        Cs = Cs2 // 2
        assert Wh * 2 == W2, (skip.shape, x.shape)
    else:
        B = skip.shape[0]
        Cs = skip.shape[-1]
        assert skip.shape[1] in (H2, H2 + 16) and skip.shape[2] == W2, (
            skip.shape, x.shape)
    F = k1.shape[-1]
    Cp = Cs + Cx
    dt = x.dtype
    paired = F < 128 and Cs % 2 == 0 and F % 8 == 0

    c_total = 2 * (Cp + 2 * F) if paired else (Cp + 2 * F)
    wk = W if paired else W2
    T = block_rows or _pick_tile(H2, wk, c_total,
                                 2 if dt == jnp.bfloat16 else 4, cx=Cx)
    E = T + 4
    win = T // 2 + 4
    # halo comes from the NEXT block, so the halo rows (4 / 4) must fit one
    # block: T//2 >= 4
    if T % 2 or T < 8 or H2 % T:
        return None  # shapes this kernel can't tile; caller falls back
    from tpu_unet.core import fusion
    # VGG's up4 (H=32, Cp=1024, F=512) defaults FUSED since round 4: the
    # XLA composition's relayout copies around its convs grew to ~3.0
    # ms/step and the fused wide+lowres stage measured 319.5 -> 327.8
    # img/s e2e.  Other deep shapes (resnet50's up3/up4: F=256 or
    # Cx=2048) stay XLA-gated — XLA measured faster there, and the
    # Cx=2048 shape hits an invalid Mosaic layout.  TPU_UNET_FUSE_DEEP
    # still force-overrides both ways.
    import os as _os
    _deep_shapes = {
        (32, 1024, 512): "vgg_up4",
        (32, 1024, 256): "rn50_up3",
        (16, 3072, 512): "rn50_up4",
    }
    _tag = _deep_shapes.get((H, Cp, F))
    _sel = _os.environ.get("TPU_UNET_DEEP_SEL")  # A/B: comma list of tags
    deep_fused_default = (_tag is not None if _sel is None
                          else _tag in _sel.split(","))
    if (not paired and H <= 32 and Cp >= 1024 and not allow_deep
            and not fusion.fuse_deep_stage(deep_fused_default)):
        return None

    # plane-paired path for the F >= 128 stages: the upsample's even/odd
    # planes feed the convs directly (no sublane interleave of the wide
    # f32 cc buffer — that relayout profiled ~1.9 ms/step on stage 2)
    wide = (not paired and F % 128 == 0
            and Cs % 128 == 0 and Cx % 128 == 0 and W % 2 == 0)
    # low-res up-half of conv1 (`_wide_kernel_lowres` /
    # `_paired_kernel_lowres`): cuts ~30% of the stage FLOPs by
    # contracting the up channels at the un-upsampled rows
    lowres = wide and fusion.use_lowres_up()
    lowres_p = (paired and fusion.use_lowres_up_paired()
                and (2 * F) % 128 == 0 and Cx % 128 == 0)

    hw, hsel, valid = _row_arrays(H)
    we, wo = _col_arrays(W)
    cw = 2 * F if (paired or wide) else F
    r1 = np.arange(-1, H2 + 1)
    valid1 = np.repeat(((r1 >= 0) & (r1 < H2)).astype(np.float32
                                                      ).reshape(-1, 1),
                       cw, axis=1)
    # H-lerp as an in-kernel MXU matmul whenever Cx is lane-tile aligned
    # (every real decoder stage); the row coefficients then stay compact
    # f32 columns.  Otherwise the VPU path needs them pre-broadcast to Cx
    # lanes (Mosaic: narrow-dtype broadcasts are sublane-only).
    # the 2D x-window block needs (T//2) % 8 == 0 (Mosaic sublane tiling);
    # the paired stage measured faster with the VPU chain (its f32 2D
    # intermediates crowd the T=16 pipeline), the unpaired stage with MXU
    mxu_lerp = (Cx % 128 == 0 and (T // 2) % 8 == 0 and not paired
                and not lowres)
    # experiment switch: carry the MXU-lerp output + W-expansion in the
    # compute dtype instead of f32 (halves the VMEM traffic of the lerp
    # chain; only meaningful for bf16 runs — f32 runs are unchanged)
    import os
    # tile-size A/B knob for the non-paired stages (the `cx > 384 → T=8`
    # cap in _pick_tile was calibrated on the NON-lowres kernel's f32
    # lerp windows)
    _tenv = int(os.environ.get("TPU_UNET_DEC_T", "0"))
    if _tenv and not paired and H2 % _tenv == 0 and _tenv % 2 == 0 \
            and _tenv >= 8:
        T = _tenv
        E = T + 4
        win = T // 2 + 4
    lerp_dt = dt if os.environ.get("TPU_UNET_LERP_BF16") == "1" \
        else jnp.float32
    # even/odd-split H-lerp for the lowres kernels (fewer VPU passes:
    # no dup concats / selects / separate valid multiply); tables ride
    # the same three coef slots (hw→wa_e, hsel→wb_e, valid→[wa_o|wb_o]).
    # Measured NEUTRAL e2e on VGG 512px/b8 (323.4/323.2 off vs
    # 318.8/323.9 on, interleaved runs) — consistent with the overlap
    # probe's finding that the per-ky VPU chains already hide under the
    # MXU passes; kept opt-in for re-evaluation on other hardware.
    eo_lerp = ((lowres or lowres_p) and (2 * F) % 128 == 0
               and os.environ.get("TPU_UNET_EO_LERP", "0")
               not in ("0", "false"))
    if mxu_lerp:
        validx = valid
        we = np.repeat(we.ravel(), Cx).reshape(1, W * Cx)
        wo = np.repeat(wo.ravel(), Cx).reshape(1, W * Cx)
    elif eo_lerp:
        wa_e, wb_e, wa_o, wb_o = _row_arrays_eo(H)
        lanes = 2 * F
        # +8 zero rows: the T=8 rounded-base window (`_eo_tables`) can
        # read past H+2 sequence rows on some grid extents
        hw = np.pad(np.repeat(wa_e, lanes, axis=1), ((0, 8), (0, 0)))
        hsel = np.pad(np.repeat(wb_e, lanes, axis=1), ((0, 8), (0, 0)))
        validx = np.pad(np.stack([np.repeat(wa_o, lanes, axis=1),
                                  np.repeat(wb_o, lanes, axis=1)], axis=1),
                        ((0, 8), (0, 0), (0, 0)))
        we = np.repeat(we, Cx, axis=1)
        wo = np.repeat(wo, Cx, axis=1)
    else:
        # lowres H-lerps the 2F-lane combined terms, not the Cx-lane x
        lanes = 2 * F if (lowres or lowres_p) else Cx
        hw = np.repeat(hw, lanes, axis=1)
        hsel = np.repeat(hsel, lanes, axis=1)
        validx = np.repeat(valid, lanes, axis=1)
        we = np.repeat(we, Cx, axis=1)
        wo = np.repeat(wo, Cx, axis=1)

    # the pre-padded layout needs the 20-row window to fit main+halo
    # blocks at an 8-row lead: only T=16 satisfies 2T-8 >= T+2 + alignment
    use_prepad = skip_prepadded and T == 16 and (paired == bool(skip_paired)
                                                 or not paired)
    if skip_prepadded and not use_prepad:
        skip = jax.lax.slice_in_dim(skip, 8, 8 + H2, axis=1)
        skip_prepadded = False
    if skip_paired and not paired and not wide:
        rows = skip.shape[1]
        skip = skip.reshape(B, rows, W2, Cs)  # unpair for the unpaired kernel
    elif not skip_paired and wide:
        # HOST-side pair fold (a free, layout-preserving view): the wide
        # kernels consume the skip as (rows, W, 2Cs) so no in-kernel
        # lane-merging reshape exists — at 2Cs = 2048 (resnet50 up4) that
        # reshape produced a degenerate (1,128) layout that made the
        # conv's row-merge an invalid Mosaic layout
        rows = skip.shape[1]
        skip = skip.reshape(B, rows, W, 2 * Cs)
    # Skip row windows: a P8-prepadded producer buffer is consumed
    # directly (2-block window, 8-row lead); otherwise the window is
    # read as three CLAMPED row blocks + a where-mask — no host pad
    # (the old jnp.pad to (nT+1)*T rows cost ~0.8 ms/step at 512px).
    clamp3 = not use_prepad
    skip_p = skip
    # x needs no host pad: its row window [r0/2-2, r0/2+T/2+2) is read as
    # three CLAMPED (T/2)-row blocks (prev, main, next) — boundary
    # duplicates land only on positions whose lerp weight is exactly 0
    x_p = x

    rs = np.arange(-2, H2 + 2)
    skv = np.repeat(((rs >= 0) & (rs < H2)).astype(np.float32
                                                   ).reshape(-1, 1),
                    2 * Cs if (paired or wide) else Cs, axis=1)

    grid = (B, H2 // T)
    # Mosaic limitation found on resnet50's up4 (Cs=1024, Cx=2048): a
    # DYNAMICALLY-sliced (pl.ds over grid-dependent rows) 16-bit table at
    # >= 2048 lanes loses its native sublane packing — the slice lands in
    # a (1,128)-tiled layout whose compare/convert is "changeBitwidth
    # when minor tiling is not 128".  Keep the dynamically-sliced tables
    # 32-bit at those widths (exact same values; the h chain is f32
    # anyway).  Narrower stages keep the measured-faster 16-bit tables.
    cdt = jnp.float32 if (mxu_lerp or validx.shape[-1] >= 2048) else dt
    svt = jnp.float32 if skv.shape[-1] >= 2048 else dt
    if lowres or lowres_p:
        colc = (_lowres_col_coeffs_paired(W, F) if lowres_p
                else _lowres_col_coeffs(W, F))
        coef_args = [
            jnp.asarray(hw).astype(cdt), jnp.asarray(hsel).astype(cdt),
            jnp.asarray(validx).astype(cdt),
            jnp.asarray(valid1).astype(dt), jnp.asarray(skv).astype(svt),
            jnp.asarray(colc).astype(dt)]
    else:
        coef_args = [
            jnp.asarray(hw).astype(cdt), jnp.asarray(hsel).astype(cdt),
            jnp.asarray(validx).astype(cdt),
            jnp.asarray(valid1).astype(dt), jnp.asarray(skv).astype(svt),
            jnp.asarray(we).astype(dt), jnp.asarray(wo).astype(dt)]
    coef_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(coef_args)

    if paired:
        if not skip_paired:
            skip_p = skip_p.reshape(B, skip_p.shape[1], W, 2 * Cs)
        k2d, k2e = _pair_weights(k2.astype(dt), F, F)
        b1d = jnp.concatenate([b1, b1]).astype(dt)
        b2d = jnp.concatenate([b2, b2]).astype(dt)
        if lowres_p:
            k1s = k1[:, :, :Cs, :].astype(dt)
            k1u = k1[:, :, Cs:, :].astype(dt)
            k1sd, k1se = _pair_weights(k1s, Cs, F)
            kup = jnp.stack([
                jnp.concatenate(
                    [jnp.concatenate([k1u[ky, kx], k1u[ky, kx]], axis=-1)
                     for kx in range(3)], axis=-1)
                for ky in range(3)])             # (3, Cx, 3·2F)
            weight_args = (k1sd, k1se, kup, b1d, k2d, k2e, b2d)
            kernel = _paired_kernel_lowres(T, E, win, Cs, Cx, F, H2, W,
                                           dt, want_y1,
                                           lead_off=6 if use_prepad else 0,
                                           clamp3=clamp3, eo_lerp=eo_lerp)
        else:
            k1d, k1e = _pair_weights(k1.astype(dt), Cs, F)
            weight_args = (k1d, k1e, b1d, k2d, k2e, b2d)
            kernel = _paired_kernel(T, E, win, Cs, Cx, F, H2, W, dt,
                                    want_y1,
                                    lead_off=6 if use_prepad else 0,
                                    mxu_lerp=mxu_lerp, lerp_dt=lerp_dt,
                                    clamp3=clamp3)
        out_shape = jax.ShapeDtypeStruct((B, H2, W, 2 * F), dt)
        out_spec = pl.BlockSpec((1, T, W, 2 * F), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        wsk, csk = W, 2 * Cs
    elif wide:
        k2d, k2eo, k2ee = _pair_weights_eo(k2.astype(dt))
        b1p = jnp.concatenate([b1, b1]).astype(dt)
        b2p = jnp.concatenate([b2, b2]).astype(dt)
        if lowres:
            k1s = k1[:, :, :Cs, :].astype(dt)
            k1u = k1[:, :, Cs:, :].astype(dt)
            k1sd, k1seo, k1see = _pair_weights_eo(k1s)
            kup = jnp.stack([
                jnp.concatenate([k1u[ky, 0], k1u[ky, 1], k1u[ky, 2]],
                                axis=-1) for ky in range(3)])
            weight_args = (k1sd, k1seo, k1see, kup, b1p,
                           k2d, k2eo, k2ee, b2p)
            kernel = _wide_kernel_lowres(T, E, win, Cs, Cx, F, H2, W, dt,
                                         want_y1=want_y1,
                                         lead_off=6 if use_prepad else 0,
                                         clamp3=clamp3, eo_lerp=eo_lerp)
        else:
            k1d, k1eo, k1ee = _pair_weights_eo(k1.astype(dt))
            weight_args = (k1d, k1eo, k1ee, b1p, k2d, k2eo, k2ee, b2p)
            kernel = _wide_kernel(T, E, win, Cs, Cx, F, H2, W, dt,
                                  want_y1=want_y1,
                                  mxu_lerp=mxu_lerp, lerp_dt=lerp_dt,
                                  lead_off=6 if use_prepad else 0,
                                  clamp3=clamp3)
        out_shape = jax.ShapeDtypeStruct((B, H2, W2, F), dt)
        out_spec = pl.BlockSpec((1, T, W2, F), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        wsk, csk = W, 2 * Cs    # skip arrives host-pre-paired
    else:
        weight_args = (k1.astype(dt), b1.astype(dt),
                       k2.astype(dt), b2.astype(dt))
        kernel = _unpaired_kernel(T, E, win, Cs, Cx, F, H2, W, dt,
                                  want_y1, mxu_lerp=mxu_lerp,
                                  lerp_dt=lerp_dt,
                                  lead_off=6 if use_prepad else 0,
                                  clamp3=clamp3)
        out_shape = jax.ShapeDtypeStruct((B, H2, W2, F), dt)
        out_spec = pl.BlockSpec((1, T, W2, F), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        wsk, csk = W2, Cs

    # the overlapping row windows are expressed as main-block + next-block
    # halo inputs so Mosaic's grid pipeline double-buffers all DMAs
    nbx = H // (T // 2) - 1  # last x block index
    if mxu_lerp:
        x_p = x_p.reshape(B, x_p.shape[1], W * Cx)
        x_specs = [
            pl.BlockSpec((1, T // 2, W * Cx),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // 2, W * Cx), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // 2, W * Cx),
                         lambda b, i: (b, jnp.minimum(i + 1, nbx), 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
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
    if clamp3:
        nbsk = H2 // T - 1
        sk_specs = [
            pl.BlockSpec((1, T, wsk, csk),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wsk, csk), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wsk, csk),
                         lambda b, i: (b, jnp.minimum(i + 1, nbsk), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        sk_specs = [
            pl.BlockSpec((1, T, wsk, csk), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, wsk, csk), lambda b, i: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    data_specs = sk_specs + x_specs
    if want_y1:
        if wide:  # the wide kernel's y1 residual is saved PAIRED [E|O]
            y1_shape = jax.ShapeDtypeStruct((B, H2, W, 2 * F), dt)
            y1_spec = pl.BlockSpec((1, T, W, 2 * F),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM)
        else:
            y1_shape, y1_spec = out_shape, out_spec
        out_shape = (out_shape, y1_shape)
        out_spec = (out_spec, y1_spec)
    out_call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=coef_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)] *
        len(weight_args) + data_specs,
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the deep stages keep ~25 MB of f32 accumulators + bf16
            # operands live; v5e has 128 MB VMEM, default scoped cap is 16
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )
    out = out_call(
        *coef_args,
        *weight_args,
        *((skip_p, skip_p, skip_p) if clamp3 else (skip_p, skip_p)),
        x_p, x_p, x_p)
    if want_y1:
        out, y1 = out
    if paired and not keep_paired:
        out = out.reshape(B, H2, W2, F)
        if want_y1:
            y1 = y1.reshape(B, H2, W2, F)
    elif not paired and keep_paired:
        out = out.reshape(B, H2, W2 // 2, 2 * F)
    if want_y1:
        return out, y1
    return out


def reference_unetup(skip, x, k1, b1, k2, b2):
    """The XLA composition the kernel must match (and the VJP rule).
    Accepts a P8-prepadded skip (rows == 2H+16) and slices it, so every
    fallback path works on producer-prepadded buffers."""
    from tpu_unet.nn.resize import upsample2x

    H2 = 2 * x.shape[1]
    if skip.shape[1] == H2 + 16:
        skip = jax.lax.slice_in_dim(skip, 8, 8 + H2, axis=1)

    def conv(v, k):
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn)

    cc = jnp.concatenate([skip, upsample2x(x)], axis=-1)
    y = jax.nn.relu(conv(cc, k1) + b1.astype(cc.dtype))
    return jax.nn.relu(conv(y, k2) + b2.astype(cc.dtype))


def fused_unetup_paired(skip, x, k1, b1, k2, b2, skip_paired=False):
    """Inference-only variant that returns the decoder stage output in the
    column-PAIRED layout (B, 2H, W, 2F) — adjacent output columns packed
    into lanes.  Saves the unpair relayout (measured 1.3 ms/step at 512px)
    when the consumer (the fused final-conv tail) accepts paired input.
    ``skip_paired`` marks the skip input as already column-paired (the
    fused VGG stem's native output)."""
    out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2, keep_paired=True,
                                 skip_paired=skip_paired)
    if out is None:
        if skip_paired:
            B, _, Wh, Cs2 = skip.shape
            H2 = 2 * x.shape[1]
            if skip.shape[1] == H2 + 16:  # pre-padded stem buffer
                skip = jax.lax.slice_in_dim(skip, 8, 8 + H2, axis=1)
            skip = skip.reshape(B, H2, 2 * Wh, Cs2 // 2)
        out = reference_unetup(skip, x, k1, b1, k2, b2)
        B, H2, W2, F = out.shape
        return out.reshape(B, H2, W2 // 2, 2 * F)
    return out


@jax.custom_vjp
def fused_unetup(skip, x, k1, b1, k2, b2):
    out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2)
    if out is None:
        return reference_unetup(skip, x, k1, b1, k2, b2)
    return out


def _fwd(skip, x, k1, b1, k2, b2):
    return fused_unetup(skip, x, k1, b1, k2, b2), (skip, x, k1, b1, k2, b2)


def _bwd(res, g):
    _, vjp = jax.vjp(reference_unetup, *res)
    return vjp(g)


fused_unetup.defvjp(_fwd, _bwd)


@jax.custom_vjp
def fused_unetup_train(skip, x, k1, b1, k2, b2):
    """Training variant: forward = the fused kernel, backward = manual
    conv transposes over KERNEL-SAVED residuals (out + the post-relu conv1
    activation y1).  The plain `fused_unetup` VJP re-runs the whole XLA
    composition to rebuild intermediates — that remat costs more than the
    kernel saves, so training with it was measured SLOWER than pure XLA
    (45.5 vs 56.7 img/s/chip).  Saving y1 removes the remat of both convs;
    only the ×2 upsample + concat are recomputed for the conv1 weight
    gradient."""
    if not _train_kernel_ok(skip, k1):
        return reference_unetup(skip, x, k1, b1, k2, b2)
    out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2)
    if out is None:
        return reference_unetup(skip, x, k1, b1, k2, b2)
    return out


def _train_kernel_ok(skip, k1):
    """Use the kernel in training only for PAIRED stages (F < 128): those
    are where XLA's forward conv runs at ~37% MXU (half-filled lanes);
    the unpaired stages measured faster through XLA end-to-end."""
    F = k1.shape[-1]
    return F < 128 and skip.shape[-1] % 2 == 0 and F % 8 == 0


def _conv_same(v, k, b):
    dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        v, k.astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn) + b.astype(v.dtype)


def _train_fwd(skip, x, k1, b1, k2, b2):
    res = (_fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2, want_y1=True)
           if _train_kernel_ok(skip, k1) else None)
    if res is None:
        out = reference_unetup(skip, x, k1, b1, k2, b2)
        return out, (skip, x, k1, b1, k2, b2, None, None)
    out, y1 = res
    return out, (skip, x, k1, b1, k2, b2, y1, out)


def _conv_wgrad(v, g, k_like):
    """dk for a SAME 3×3 conv with input v and output-grad g (XLA path:
    conv weight gradients measured ~71% MXU — not worth a kernel)."""
    _, vjp = jax.vjp(lambda k: _conv_same(v, k, jnp.zeros(
        (k_like.shape[-1],), v.dtype)), k_like)
    dk, = vjp(g.astype(v.dtype))
    return dk


def _train_bwd(res, g):
    skip, x, k1, b1, k2, b2, y1, out = res
    if y1 is None:
        _, vjp = jax.vjp(reference_unetup, skip, x, k1, b1, k2, b2)
        return vjp(g)
    from tpu_unet.kernels.decoder_train import fused_unetup_bwd_impl
    from tpu_unet.nn.resize import upsample2x

    cs = skip.shape[-1]
    bwd = fused_unetup_bwd_impl(g.astype(y1.dtype), out, y1, k1, k2, cs)
    if bwd is not None:
        # Pallas activation-gradient chain (relu masks + both dgrads in
        # one pass, paired layout); wgrads/bias-grads stay XLA, with the
        # k1 wgrad split into skip/upsample parts so the padded concat
        # buffer (measured 5.4 ms/step at 512px) is never materialized.
        dskip, dups, g2, dz1 = bwd
        db2 = jnp.sum(g2.astype(jnp.float32), axis=(0, 1, 2))
        dk2 = _conv_wgrad(y1, g2, k2)
        db1 = jnp.sum(dz1.astype(jnp.float32), axis=(0, 1, 2))
        dk1_sk = _conv_wgrad(skip, dz1, k1[:, :, :cs])
        up, vjpu = jax.vjp(upsample2x, x)
        dk1_up = _conv_wgrad(up.astype(skip.dtype), dz1, k1[:, :, cs:])
        dk1 = jnp.concatenate([dk1_sk, dk1_up], axis=2)
        dx, = vjpu(dups.astype(up.dtype))
        return (dskip, dx.astype(x.dtype), dk1.astype(k1.dtype),
                db1.astype(b1.dtype), dk2.astype(k2.dtype),
                db2.astype(b2.dtype))

    g2 = jnp.where(out > 0, g, 0).astype(y1.dtype)
    _, vjp2 = jax.vjp(_conv_same, y1, k2, b2)
    dy1, dk2, db2 = vjp2(g2)
    g1 = jnp.where(y1 > 0, dy1, 0)
    up, vjpu = jax.vjp(upsample2x, x)
    cc = jnp.concatenate([skip, up.astype(skip.dtype)], axis=-1)
    _, vjp1 = jax.vjp(_conv_same, cc, k1, b1)
    dcc, dk1, db1 = vjp1(g1)
    dskip = dcc[..., :cs]
    dx, = vjpu(dcc[..., cs:].astype(up.dtype))
    return (dskip, dx.astype(x.dtype), dk1.astype(k1.dtype),
            db1.astype(b1.dtype), dk2.astype(k2.dtype), db2.astype(b2.dtype))


fused_unetup_train.defvjp(_train_fwd, _train_bwd)


def _skip_is_paired(skip, x):
    """The skip may arrive COLUMN-PAIRED from a fused producer (the train
    stem, kernels/stem_train.py): (B, 2H, W, 2Cs) instead of
    (B, 2H, 2W, Cs).  The column counts disambiguate."""
    return skip.shape[2] == x.shape[2]


def _unpair_skip(skip):
    B, H2, Wh, Cs2 = skip.shape
    return skip.reshape(B, H2, 2 * Wh, Cs2 // 2)


@jax.custom_vjp
def fused_unetup_train_paired(skip, x, k1, b1, k2, b2):
    """Training decoder stage with COLUMN-PAIRED output (B, 2H, W, 2F).

    The whole training region speaks paired: this forward emits paired
    features (consumed relayout-free by the fused final-conv+loss kernel,
    kernels/loss.py), the VJP receives the paired cotangent straight from
    that kernel, and the backward (kernels/decoder_train.py v2) runs the
    activation-gradient chain AND both conv weight gradients in one Pallas
    pass in paired space — no paired↔natural boundary inside the region.
    The skip itself may arrive paired (from the train stem) — then its
    cotangent leaves paired too, and the layout never breaks anywhere
    between the stem and the loss.  Gradients are exact vs the XLA
    composition (tests/test_decoder_train).
    """
    sp = _skip_is_paired(skip, x)
    if not _train_kernel_ok(skip, k1):
        sk = _unpair_skip(skip) if sp else skip
        return _paired_view(reference_unetup(sk, x, k1, b1, k2, b2))
    out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2, keep_paired=True,
                                 skip_paired=sp)
    if out is None:
        sk = _unpair_skip(skip) if sp else skip
        return _paired_view(reference_unetup(sk, x, k1, b1, k2, b2))
    return out


def _paired_view(out_nat):
    B, H2, W2, F = out_nat.shape
    return out_nat.reshape(B, H2, W2 // 2, 2 * F)


def _ptrain_fwd(skip, x, k1, b1, k2, b2):
    sp = _skip_is_paired(skip, x)
    res = (_fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2,
                                  keep_paired=True, skip_paired=sp,
                                  want_y1=True)
           if _train_kernel_ok(skip, k1) else None)
    if res is None:
        sk = _unpair_skip(skip) if sp else skip
        out = _paired_view(reference_unetup(sk, x, k1, b1, k2, b2))
        return out, (skip, x, k1, b1, k2, b2, None, None)
    out, y1 = res
    return out, (skip, x, k1, b1, k2, b2, y1, out)


def _ptrain_bwd(res, g):
    skip, x, k1, b1, k2, b2, y1, out = res
    sp = _skip_is_paired(skip, x)
    if y1 is None:
        def ref(sk, *a):
            sk = _unpair_skip(sk) if sp else sk
            return _paired_view(reference_unetup(sk, *a))

        _, vjp = jax.vjp(ref, skip, x, k1, b1, k2, b2)
        return vjp(g)
    from tpu_unet.kernels.decoder_train import fused_unetup_bwd_paired_impl

    if sp:
        skip_p = skip
        cs = skip.shape[-1] // 2
    else:
        cs = skip.shape[-1]
        skip_p = skip.reshape(skip.shape[0], skip.shape[1],
                              skip.shape[2] // 2, 2 * cs)
    bwd = fused_unetup_bwd_paired_impl(g.astype(y1.dtype), out, y1,
                                       skip_p, x, k1, k2, cs)
    if bwd is None:
        # tiling fallback: unpair and reuse the v1 backward composition
        gn = g.reshape(g.shape[0], g.shape[1], -1, g.shape[-1] // 2)
        outn = out.reshape(gn.shape)
        y1n = y1.reshape(gn.shape)
        sk = _unpair_skip(skip) if sp else skip
        grads = _train_bwd((sk, x, k1, b1, k2, b2, y1n, outn), gn)
        if sp:
            grads = (grads[0].reshape(skip.shape),) + grads[1:]
        return grads
    dsk_p, dx, dk1, db1, dk2, db2 = bwd
    dskip = dsk_p if sp else dsk_p.reshape(skip.shape)
    return (dskip, dx.astype(x.dtype), dk1.astype(k1.dtype),
            db1.astype(b1.dtype), dk2.astype(k2.dtype),
            db2.astype(b2.dtype))


fused_unetup_train_paired.defvjp(_ptrain_fwd, _ptrain_bwd)


# -- wide (F >= 128) training stage ------------------------------------------


def _wide_train_ok(skip, x, k1):
    F = k1.shape[-1]
    return (F % 128 == 0 and skip.shape[-1] % 128 == 0
            and x.shape[-1] % 128 == 0)


@jax.custom_vjp
def fused_unetup_train_wide(skip, x, k1, b1, k2, b2):
    """Training decoder stage for the F >= 128 stages (up2/up3): the
    plane-paired forward (`_wide_kernel`) with NATURAL output, and a
    one-pass wide backward (kernels/decoder_train.py
    ``fused_unetup_bwd_wide_impl``) that runs the activation-gradient
    chain, both weight gradients, and the upsample transpose in-kernel.
    Gradients are exact vs the XLA composition (tests/test_decoder_train).
    """
    out = (_fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2, allow_deep=True)
           if _wide_train_ok(skip, x, k1) else None)
    if out is None:
        return reference_unetup(skip, x, k1, b1, k2, b2)
    return out


def _wtrain_fwd(skip, x, k1, b1, k2, b2):
    res = (_fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2, want_y1=True,
                                  allow_deep=True)
           if _wide_train_ok(skip, x, k1) else None)
    if res is None:
        return (reference_unetup(skip, x, k1, b1, k2, b2),
                (skip, x, k1, b1, k2, b2, None, None))
    out, y1p = res
    return out, (skip, x, k1, b1, k2, b2, y1p, out)


def _wtrain_bwd(res, g):
    skip, x, k1, b1, k2, b2, y1p, out = res
    if y1p is None:
        _, vjp = jax.vjp(reference_unetup, skip, x, k1, b1, k2, b2)
        return vjp(g)
    from tpu_unet.kernels.decoder_train import fused_unetup_bwd_wide_impl

    bwd = fused_unetup_bwd_wide_impl(g.astype(y1p.dtype), out, y1p,
                                     skip, x, k1, k2, skip.shape[-1])
    if bwd is None:  # untileable at bwd time — differentiate the reference
        _, vjp = jax.vjp(reference_unetup, skip, x, k1, b1, k2, b2)
        return vjp(g)
    dskip, dx, dk1, db1, dk2, db2 = bwd
    return (dskip, dx.astype(x.dtype), dk1.astype(k1.dtype),
            db1.astype(b1.dtype), dk2.astype(k2.dtype),
            db2.astype(b2.dtype))


fused_unetup_train_wide.defvjp(_wtrain_fwd, _wtrain_bwd)
