"""Fused segmentation loss — weighted CE + soft-dice + f_score and their
exact logits-gradient as two Pallas passes.

Round-2 train-step profiling (512px, batch 8, v5e): the jnp loss pipeline
costs ~16 ms/step — log-softmax, a second softmax for dice, a third for
f_score, an f32 one-hot megatensor and the autodiff backward each stream
the (8,512,512,21) f32 logit map through HBM again.  Here:

- pass 1 (reduce): one read of the bf16 logits + int32 target computes ALL
  global sums — weighted-NLL numerator/denominator, per-class tp / prob-sum
  / target-count for dice, and the thresholded tp / positive-count for
  f_score — accumulated in f32 VMEM across the sequential grid.
- host: closed-form per-class coefficients for the dice gradient (tiny).
- pass 2 (grad): one more read recomputes the row softmax and emits
  d(CE+dice)/dlogits directly in the compute dtype.

Exact math parity targets: nets/unet_training.py:9-19 (CE_Loss: weighted
NLL, ignore_index = num_classes, mean normalized by the SUM OF WEIGHTS of
contributing pixels), :38-56 (Dice_loss: β=1, smooth=1e-5, ignore channel
dropped), utils/utils_metrics.py:12-31 (f_score at threshold 0.5).

The public entry `ce_dice_loss_grad` carries a custom VJP built from the
pass-2 kernel, so `jax.grad` of a step using it never materializes the
softmax/one-hot intermediates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 16384


def _round_up(x, m):
    return (x + m - 1) // m * m


def _reduce_body(x, t, w_row, c, nc_pad, threshold, focal=False,
                 alpha=0.5, gamma=2.0):
    """Shared reduce math: f32 logits block (B, C) + int target (B, 1) →
    the (6, nc_pad) accumulation row (wnll/w, tp, psum, tsum, tp@th,
    pos@th).  With ``focal`` the first slot carries the focal sum
    Σ α·(1−pt)^γ·wnll instead (reference: nets/unet_training.py:21-36;
    pt = exp(−weighted-nll), mean over ALL pixels incl. ignored)."""
    logp = jax.nn.log_softmax(x, axis=-1)
    probs = jnp.exp(logp)
    ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (ci == t).astype(jnp.float32)            # ignore → all-zero
    valid = (t < c).astype(jnp.float32)               # (B, 1)
    # real pixels (incl. ignored, which DO count in dice fp per the
    # reference) vs padding rows (tgt = c + 1), which must not
    real = (t <= c).astype(jnp.float32)
    w_pix = jnp.sum(onehot * w_row, axis=-1, keepdims=True) * valid
    nll = -jnp.sum(logp * onehot, axis=-1, keepdims=True)
    pt = (probs > threshold).astype(jnp.float32) * real

    def cpad(v):  # (1, C) → (1, nc_pad)
        return jnp.pad(v, ((0, 0), (0, nc_pad - v.shape[-1])))

    if focal:
        u = w_pix * nll                               # per-pixel wnll
        ptf = jnp.exp(-u)
        term = alpha * (1.0 - ptf) ** gamma * u       # 0 where u == 0
        scal = jnp.concatenate([jnp.sum(term).reshape(1, 1),
                                jnp.sum(w_pix).reshape(1, 1)], axis=1)
    else:
        scal = jnp.concatenate([jnp.sum(w_pix * nll).reshape(1, 1),
                                jnp.sum(w_pix).reshape(1, 1)], axis=1)
    return jnp.concatenate([
        cpad(scal),                                               # wnll,w
        cpad(jnp.sum(probs * onehot, axis=0, keepdims=True)),     # tp
        cpad(jnp.sum(probs * real, axis=0, keepdims=True)),       # psum
        cpad(jnp.sum(onehot, axis=0, keepdims=True)),             # tsum
        cpad(jnp.sum(pt * onehot, axis=0, keepdims=True)),        # tp@th
        cpad(jnp.sum(pt, axis=0, keepdims=True)),                 # pos@th
    ], axis=0)                                                    # (6,·)


def _grad_body(x, t, w_row, coefA, coefB, inv_sw, c, focal=False,
               alpha=0.5, gamma=2.0):
    """Shared gradient math: f32 logits block → f32 dlogits block."""
    logp = jax.nn.log_softmax(x, axis=-1)
    probs = jnp.exp(logp)
    ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (ci == t).astype(jnp.float32)
    valid = (t < c).astype(jnp.float32)
    w_pix = jnp.sum(onehot * w_row, axis=-1, keepdims=True) * valid

    if focal:
        # L_px = α(1−pt)^γ·u with u = weighted nll, pt = e^{−u};
        # dL/du = α[(1−pt)^γ + γ·u·pt·(1−pt)^{γ−1}], du/dlogits =
        # w_pix·(probs − onehot); inv_sw carries gl / N_pixels
        u = w_pix * -jnp.sum(logp * onehot, axis=-1, keepdims=True)
        ptf = jnp.exp(-u)
        base = jnp.maximum(1.0 - ptf, 1e-12)
        fac = alpha * (base ** gamma
                       + gamma * u * ptf * base ** (gamma - 1.0))
        g_ce = fac * w_pix * (probs - onehot) * inv_sw
    else:
        g_ce = w_pix * (probs - onehot) * inv_sw

    # dice: dL/dprobs[p,c] = A_c * onehot + B_c; through softmax:
    # dlogits = probs * (dLdp - sum_c dLdp * probs)
    dldp = coefA * onehot + coefB
    inner = jnp.sum(dldp * probs, axis=-1, keepdims=True)
    g_dice = probs * (dldp - inner)
    # padding rows (t == c + 1) must contribute NOTHING — the final-conv
    # fused kernel accumulates db = Σ dlog in-kernel over padded blocks
    # (ignored pixels t == c keep their dice gradient: real == 1)
    real = (t <= c).astype(jnp.float32)
    return (g_ce + g_dice) * real


def _reduce_kernel(c, nc_pad, threshold, focal=False, alpha=0.5,
                   gamma=2.0):
    def kernel(logits_ref, tgt_ref, w_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        x = logits_ref[...].astype(jnp.float32)          # (B, C)
        t = tgt_ref[...].astype(jnp.int32)                # (B, 1) int8
        out_ref[...] += _reduce_body(x, t, w_ref[...], c, nc_pad,
                                     threshold, focal, alpha, gamma)

    return kernel


def _grad_kernel(c, dt, focal=False, alpha=0.5, gamma=2.0):
    def kernel(logits_ref, tgt_ref, w_ref, coefA_ref, coefB_ref,
               scal_ref, dlog_ref):
        x = logits_ref[...].astype(jnp.float32)
        t = tgt_ref[...].astype(jnp.int32)
        dlog = _grad_body(x, t, w_ref[...], coefA_ref[...], coefB_ref[...],
                          scal_ref[0, 0], c, focal, alpha, gamma)
        dlog_ref[...] = dlog.astype(dt)

    return kernel


def _flatten(logits, target):
    n, h, w, c = logits.shape
    rows = n * h * w
    flat = logits.reshape(rows, c)
    # int8 target: the (rows, 1) layout is lane-padded to 128 in HBM, so
    # i32 would cost a 128x-bloated 1 GB relayout write + two 1 GB kernel
    # reads at 512px/bs8 (profiled at ~4 ms/step); int8 quarters it
    tgt = target.reshape(rows, 1).astype(jnp.int8)
    pad = (-rows) % _BLOCK
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        # padded rows: target = c + 1, distinguishable from both real
        # classes and the ignore id c (ignored pixels still count in the
        # dice/f_score prob sums; padding must not)
        tgt = jnp.pad(tgt, ((0, pad), (0, 0)), constant_values=c + 1)
    return flat, tgt, rows


def _reductions(logits, target, cls_weights, num_classes,
                threshold=0.5, interpret=False, focal=False,
                alpha=0.5, gamma=2.0):
    c = num_classes
    nc_pad = max(_round_up(c, 128), 128)
    flat, tgt, rows = _flatten(logits, target)
    w = jnp.asarray(cls_weights, jnp.float32).reshape(1, c)
    out = pl.pallas_call(
        _reduce_kernel(c, nc_pad, threshold, focal, alpha, gamma),
        out_shape=jax.ShapeDtypeStruct((6, nc_pad), jnp.float32),
        grid=(flat.shape[0] // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, nc_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, tgt, w)
    s_wnll, s_w = out[0, 0], out[0, 1]
    tp, psum, tsum = out[1, :c], out[2, :c], out[3, :c]
    tpt, ptsum = out[4, :c], out[5, :c]
    return s_wnll, s_w, tp, psum, tsum, tpt, ptsum


def _dice_pieces(tp, psum, tsum, beta=1.0, smooth=1e-5):
    b2 = beta * beta
    fp = psum - tp
    fn = tsum - tp
    denom = (1 + b2) * tp + b2 * fn + fp + smooth
    score = ((1 + b2) * tp + smooth) / denom
    return score, fp, fn, denom


def ce_dice_loss_grad(logits, target, cls_weights, num_classes: int,
                      with_dice: bool = True, interpret: bool = False,
                      use_focal: bool = False, alpha: float = 0.5,
                      gamma: float = 2.0):
    """Fused (CE-or-focal + dice) loss with custom gradient; also returns
    f_score.

    Equivalent to ``ce_loss(...) + dice_loss(...)`` (or, with
    ``use_focal``, ``focal_loss(...) + dice_loss(...)`` — the competition
    recipe, reference nets/unet_training.py:21-36) and ``f_score(...)``
    from train/losses.py for same-resolution logits, without ever
    materializing softmax/one-hot tensors in HBM.
    """
    # _flatten stores targets as int8 with c+1 as the padding sentinel;
    # beyond int8 range the cast would silently wrap into wrong losses.
    if num_classes + 1 > 127:
        raise ValueError(
            f"fused loss kernel supports num_classes <= 126 (int8 target "
            f"encoding with sentinel num_classes+1); got {num_classes}. "
            f"Use train/losses.py for more classes.")
    # CPU has no Mosaic lowering — interpret mode keeps the kernel
    # drivable under the virtual-device mesh tests
    return _ce_dice(logits, target,
                    tuple(np.asarray(cls_weights, np.float32).tolist()),
                    num_classes, with_dice,
                    interpret or jax.default_backend() == "cpu",
                    use_focal, float(alpha), float(gamma))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _ce_dice(logits, target, cls_weights, num_classes, with_dice, interpret,
             focal, alpha, gamma):
    loss, fs, _ = _fwd_impl(logits, target, cls_weights, num_classes,
                            with_dice, interpret, focal, alpha, gamma)
    return loss, fs


def _fwd_impl(logits, target, cls_weights, num_classes, with_dice, interpret,
              focal=False, alpha=0.5, gamma=2.0):
    c = num_classes
    s_wnll, s_w, tp, psum, tsum, tpt, ptsum = _reductions(
        logits, target, cls_weights, c, interpret=interpret, focal=focal,
        alpha=alpha, gamma=gamma)
    if focal:
        n, h, wd, _ = logits.shape
        loss_ce = s_wnll / float(n * h * wd)
    else:
        loss_ce = s_wnll / jnp.maximum(s_w, 1e-12)
    score, fp, fn, denom = _dice_pieces(tp, psum, tsum)
    loss_dice = (1.0 - jnp.mean(score)) if with_dice else 0.0
    # f_score (threshold 0.5)
    fpt = ptsum - tpt
    fnt = tsum - tpt
    fscore = jnp.mean((2 * tpt + 1e-5) / (2 * tpt + fnt + fpt + 1e-5))
    return loss_ce + loss_dice, fscore, (s_w, tp, fp, fn, denom, score)


def _vjp_fwd(logits, target, cls_weights, num_classes, with_dice,
             interpret, focal, alpha, gamma):
    loss, fs, resid = _fwd_impl(logits, target, cls_weights, num_classes,
                                with_dice, interpret, focal, alpha, gamma)
    return (loss, fs), (logits, target, resid)


def _dice_coefs(score, denom, c, gl, with_dice):
    """Per-class coefficients of the dice gradient wrt probs:
    dL/dprobs[p, k] = A_k·onehot + B_k, already scaled by the loss
    cotangent ``gl``.

    Algebra: score_c = ((1+b2) tp + s) / denom with
    denom = (1+b2) tp + b2 fn + fp + s.  Substituting fn = tsum - tp and
    fp = psum - tp: denom = b2·tsum + psum + s — no tp!  So with
    num = score·denom: d score/d tp = (1+b2)/denom and
    d score/d psum = -num/denom²; loss_dice = 1 - mean(score)."""
    b2 = 1.0
    num = score * denom
    dsc_dtp = (1.0 + b2) / denom
    dsc_dpsum = -num / (denom * denom)
    A = (-dsc_dtp / c) * gl            # coefficient on onehot (per class)
    B = (-dsc_dpsum / c) * gl          # coefficient on plain probs
    if not with_dice:
        A = jnp.zeros_like(A)
        B = jnp.zeros_like(B)
    return A, B


def _vjp_bwd(cls_weights, num_classes, with_dice, interpret, focal, alpha,
             gamma, res, g):
    logits, target, (s_w, tp, fp, fn, denom, score) = res
    gl, _ = g  # f_score is treated as a metric (no gradient)
    c = num_classes
    A, B = _dice_coefs(score, denom, c, gl, with_dice)

    nc = num_classes
    flat, tgt, rows = _flatten(logits, target)
    w = jnp.asarray(cls_weights, jnp.float32).reshape(1, nc)
    dt = logits.dtype
    if focal:
        n, h, wd, _ = logits.shape
        inv = gl / float(n * h * wd)
    else:
        inv = gl / jnp.maximum(s_w, 1e-12)
    dlog = pl.pallas_call(
        _grad_kernel(nc, dt, focal, alpha, gamma),
        out_shape=jax.ShapeDtypeStruct((flat.shape[0], nc), dt),
        grid=(flat.shape[0] // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, nc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, nc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, tgt, w, A.reshape(1, nc), B.reshape(1, nc),
      jnp.asarray(inv, jnp.float32).reshape(1, 1))
    n, h, wd, _ = logits.shape
    dlog = dlog[:rows].reshape(n, h, wd, nc)
    return dlog, None


_ce_dice.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Fused final-conv + loss: the 1×1 classifier head runs INSIDE the loss
# kernels, so the (B, H, W, num_classes) logit map never exists in HBM.
# ---------------------------------------------------------------------------
#
# Round-3 train-step profiling (512px, batch 8, v5e): the XLA final-conv +
# loss region costs ~17 ms/step — the 1×1 conv fwd (1.6 ms), a logits
# relayout copy into the loss kernel's layout (1.6), the label reshape
# (1.6), the two loss custom-calls (6.6), the dlogits relayout back (1.6),
# the conv dgrad (2.3) and wgrad (1.4).  All of it is HBM-bound shuffling
# of (8,512,512,21) tensors.  Fusing the head into the loss passes reads
# the (·, 64) FEATURE map instead (same bytes as the logits), computes
# logits per 8192-row block in VMEM, and accumulates dW/db in-kernel across
# the sequential grid — one feature read fwd, one read + one dfeat write
# bwd.
#
# The feature map may arrive NATURAL (B, H, W, Cf) or column-PAIRED
# (B, H, W/2, 2·Cf) from the fused decoder (kernels/decoder_fuse.py):
# reshape(-1, Cf) yields the identical row order either way (pairing packs
# adjacent columns, so (w2, p) lexicographic == w), which is what lets the
# paired training path feed this kernel with zero relayout.

_FBLK = 8192


def _final_reduce_kernel(c, nc_pad, threshold, dt):
    def kernel(f_ref, tgt_ref, w_ref, wf_ref, b_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        f = f_ref[...]                                    # (B, Cf) dt
        # mirror nn.Conv bf16 numerics: f32-accumulated matmul cast to the
        # compute dtype, bias added there, then promoted for the softmax
        x = jnp.dot(f, wf_ref[...],
                    preferred_element_type=jnp.float32).astype(dt)
        x = (x + b_ref[...].astype(dt)).astype(jnp.float32)
        t = tgt_ref[...].astype(jnp.int32)
        out_ref[...] += _reduce_body(x, t, w_ref[...], c, nc_pad, threshold)

    return kernel


def _final_grad_kernel(c, cf, dt):
    def kernel(f_ref, tgt_ref, w_ref, wf_ref, b_ref, coefA_ref, coefB_ref,
               scal_ref, dfeat_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        f = f_ref[...]                                    # (B, Cf) dt
        x = jnp.dot(f, wf_ref[...],
                    preferred_element_type=jnp.float32).astype(dt)
        x = (x + b_ref[...].astype(dt)).astype(jnp.float32)
        t = tgt_ref[...].astype(jnp.int32)
        dlog = _grad_body(x, t, w_ref[...], coefA_ref[...], coefB_ref[...],
                          scal_ref[0, 0], c)              # (B, C) f32

        # dfeat = dlog @ Wᵀ  (contract the class dim)
        dfeat_ref[...] = jax.lax.dot_general(
            dlog, wf_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ()))).astype(dt)
        # dW += fᵀ @ dlog ; db += Σ dlog — f32 accumulation in the output
        # block across the sequential grid
        dw = jax.lax.dot_general(
            f.astype(jnp.float32), dlog, (((0,), (0,)), ((), ())))  # (Cf, C)
        db = jnp.sum(dlog, axis=0, keepdims=True)                   # (1, C)
        pad_c = acc_ref.shape[1] - dw.shape[1]
        block = jnp.concatenate([dw, db], axis=0)
        block = jnp.pad(block, ((0, acc_ref.shape[0] - cf - 1),
                                (0, pad_c)))
        acc_ref[...] += block

    return kernel


def _flatten_feats(feats, cf, target, c):
    rows_total = int(np.prod(feats.shape[:-1])) * (feats.shape[-1] // cf)
    flat = feats.reshape(rows_total, cf)
    tgt = target.reshape(rows_total, 1).astype(jnp.int8)
    pad = (-rows_total) % _FBLK
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        tgt = jnp.pad(tgt, ((0, pad), (0, 0)), constant_values=c + 1)
    return flat, tgt, rows_total


# -- paired-native variant ---------------------------------------------------
#
# When the feature map arrives column-PAIRED (last dim == 2·Cf) the kernels
# consume it as (rows/2, 2Cf) blocks DIRECTLY — for a (B, H, W/2, 2Cf)
# {3,2,1,0} buffer that flat view is a pure bitcast (full 128-lane tiles),
# where the natural (rows, Cf) view would be a half-lane repack copy.  The
# classifier runs as ONE block-diagonal matmul (2Cf, 2c) producing both
# pixels' logits side by side; softmax/CE/dice reductions use masked-half
# lane arithmetic (no in-kernel lane slicing, which Mosaic restricts).
# Per-class sums come out as (·, 2c) rows whose halves the host folds.
# Net: half the rows, full lanes — ~2× less VPU work and HBM traffic than
# the natural path on the same pixels.

_FBLK2 = 4096


def _half_arrays(x_shape, c):
    lane = jax.lax.broadcasted_iota(jnp.int32, x_shape, 1)
    half = (lane >= c).astype(jnp.int32)
    ci = lane - half * c
    return lane, half, ci


def _half_reduce(v, half, which):
    return jnp.sum(jnp.where(half == which, v, 0.0), axis=-1, keepdims=True)


def _paired_pieces(x, te, to, w2, c):
    """Shared per-block paired math: per-half softmax + one-hot masks.

    x (B2, 2c) f32 holds both pixels' logits side by side; te/to are the
    even/odd targets (B2, 1) int32."""
    lane, half, ci = _half_arrays(x.shape, c)
    t = jnp.where(half == 0, te, to)                  # (B2, 2c)
    onehot = (ci == t).astype(jnp.float32)
    valid = (t < c).astype(jnp.float32)
    real = (t <= c).astype(jnp.float32)
    neg = jnp.float32(-1e30)
    m1 = jnp.max(jnp.where(half == 0, x, neg), axis=-1, keepdims=True)
    m2 = jnp.max(jnp.where(half == 1, x, neg), axis=-1, keepdims=True)
    m = jnp.where(half == 0, m1, m2)
    ex = jnp.exp(x - m)
    s1 = _half_reduce(ex, half, 0)
    s2 = _half_reduce(ex, half, 1)
    s = jnp.where(half == 0, s1, s2)
    logp = x - m - jnp.log(s)
    probs = ex / s
    return half, onehot, valid, real, logp, probs


def _final_reduce_kernel_p(c, nc_pad, threshold, dt):
    def kernel(f_ref, tgt_ref, w2_ref, wfb_ref, b2_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        f = f_ref[...]                                    # (B2, 2Cf) dt
        x = jnp.dot(f, wfb_ref[...],
                    preferred_element_type=jnp.float32).astype(dt)
        x = (x + b2_ref[...].astype(dt)).astype(jnp.float32)
        tgt = tgt_ref[...].astype(jnp.int32)              # (B2, 2) int8
        te, to = tgt[:, :1], tgt[:, 1:2]
        w2 = w2_ref[...]
        half, onehot, valid, real, logp, probs = _paired_pieces(
            x, te, to, w2, c)
        # w_pix·nll == Σ_lane onehot·w·(−logp) (one-hot selects lane t)
        pt = (probs > threshold).astype(jnp.float32) * real

        def cpad(v):
            return jnp.pad(v, ((0, 0), (0, nc_pad - v.shape[-1])))

        scal = jnp.concatenate([
            jnp.sum(onehot * w2 * (-logp) * valid).reshape(1, 1),
            jnp.sum(onehot * w2 * valid).reshape(1, 1)], axis=1)
        row = jnp.concatenate([
            cpad(scal),
            cpad(jnp.sum(probs * onehot, axis=0, keepdims=True)),
            cpad(jnp.sum(probs * real, axis=0, keepdims=True)),
            cpad(jnp.sum(onehot, axis=0, keepdims=True)),
            cpad(jnp.sum(pt * onehot, axis=0, keepdims=True)),
            cpad(jnp.sum(pt, axis=0, keepdims=True)),
        ], axis=0)
        out_ref[...] += row

    return kernel


def _final_grad_kernel_p(c, cf, dt):
    def kernel(f_ref, tgt_ref, w2_ref, wfb_ref, b2_ref,
               coefA2_ref, coefB2_ref, scal_ref, dfeat_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        f = f_ref[...]
        x = jnp.dot(f, wfb_ref[...],
                    preferred_element_type=jnp.float32).astype(dt)
        x = (x + b2_ref[...].astype(dt)).astype(jnp.float32)
        tgt = tgt_ref[...].astype(jnp.int32)              # (B2, 2) int8
        te, to = tgt[:, :1], tgt[:, 1:2]
        w2 = w2_ref[...]
        half, onehot, valid, real, logp, probs = _paired_pieces(
            x, te, to, w2, c)
        # per-pixel CE weight w[t]·valid, broadcast back to the half's lanes
        wp = onehot * w2 * valid
        wp1 = _half_reduce(wp, half, 0)
        wp2 = _half_reduce(wp, half, 1)
        w_pix = jnp.where(half == 0, wp1, wp2) * valid
        g_ce = w_pix * (probs - onehot) * scal_ref[0, 0]
        dldp = coefA2_ref[...] * onehot + coefB2_ref[...]
        dp = dldp * probs
        i1 = _half_reduce(dp, half, 0)
        i2 = _half_reduce(dp, half, 1)
        inner = jnp.where(half == 0, i1, i2)
        g_dice = probs * (dldp - inner)
        dlog = (g_ce + g_dice) * real                     # (B2, 2c) f32

        # dfeat = dlog @ blockdiag(W)ᵀ → (B2, 2Cf) paired
        dfeat_ref[...] = jax.lax.dot_general(
            dlog, wfb_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ()))).astype(dt)
        dw = jax.lax.dot_general(
            f.astype(jnp.float32), dlog, (((0,), (0,)), ((), ())))
        db = jnp.sum(dlog, axis=0, keepdims=True)
        block = jnp.concatenate([dw, db], axis=0)         # (2Cf+1, 2c)
        block = jnp.pad(block, ((0, acc_ref.shape[0] - 2 * cf - 1),
                                (0, acc_ref.shape[1] - block.shape[1])))
        acc_ref[...] += block

    return kernel


def _flatten_feats_paired(feats, cf, target, c):
    rows2 = int(np.prod(feats.shape[:-1]))            # pixel pairs
    flat = feats.reshape(rows2, 2 * cf)
    # ONE (rows, 2) int8 operand; the kernels slice the halves in-VMEM.
    # A host-side split wrote two more lane-padded (rows, 1) s8 arrays
    # (128x their logical size) — ~0.8 ms/step at 512px/bs8
    tgt2 = target.reshape(rows2, 2).astype(jnp.int8)
    pad = (-rows2) % _FBLK2
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        tgt2 = jnp.pad(tgt2, ((0, pad), (0, 0)), constant_values=c + 1)
    return flat, tgt2, rows2


def _block_diag_w(wf, dt):
    cf, c = wf.shape
    z = jnp.zeros_like(wf)
    return jnp.concatenate([
        jnp.concatenate([wf, z], axis=1),
        jnp.concatenate([z, wf], axis=1)], axis=0).astype(dt)  # (2Cf, 2c)


def final_ce_dice_loss_grad(feats, kernel, bias, target, cls_weights,
                            num_classes: int, with_dice: bool = True,
                            interpret: bool = False):
    """Fused (1×1 final conv + CE + dice) loss with custom gradient.

    Equivalent to ``conv1x1(feats, kernel, bias)`` → ``ce_dice_loss_grad``
    without materializing the logit map; the VJP yields (dfeats, dkernel,
    dbias).  ``feats`` may be natural (B, H, W, Cf) or column-paired
    (B, H, W/2, 2·Cf); ``kernel`` is (1, 1, Cf, C) HWIO (or (Cf, C)).
    Also returns f_score as a metric (no gradient).

    Reference semantics: nets/unet.py:58 (final 1×1 conv) composed with
    nets/unet_training.py:9-19 (CE_Loss), :38-56 (Dice_loss) and
    utils/utils_metrics.py:12-31 (f_score).
    """
    if num_classes + 1 > 127:
        raise ValueError(
            f"fused loss kernel supports num_classes <= 126; got "
            f"{num_classes}. Use train/losses.py for more classes.")
    # CPU has no Mosaic lowering — interpret mode keeps the kernel
    # drivable under the virtual-device mesh tests
    return _final_ce_dice(feats, kernel, bias, target,
                          tuple(np.asarray(cls_weights, np.float32).tolist()),
                          num_classes, with_dice,
                          interpret or jax.default_backend() == "cpu")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _final_ce_dice(feats, kernel, bias, target, cls_weights, num_classes,
                   with_dice, interpret):
    loss, fs, _ = _final_fwd_impl(feats, kernel, bias, target, cls_weights,
                                  num_classes, with_dice, interpret)
    return loss, fs


def _final_fwd_impl(feats, kernel, bias, target, cls_weights, num_classes,
                    with_dice, interpret):
    c = num_classes
    nc_pad = max(_round_up(c, 128), 128)
    wf = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    cf = wf.shape[0]
    w = jnp.asarray(cls_weights, jnp.float32).reshape(1, c)
    if feats.shape[-1] == 2 * cf:
        return _final_fwd_paired(feats, wf, bias, target, w, c, nc_pad, cf,
                                 with_dice, interpret)
    flat, tgt, rows = _flatten_feats(feats, cf, target, c)
    out = pl.pallas_call(
        _final_reduce_kernel(c, nc_pad, 0.5, feats.dtype),
        out_shape=jax.ShapeDtypeStruct((6, nc_pad), jnp.float32),
        grid=(flat.shape[0] // _FBLK,),
        in_specs=[
            pl.BlockSpec((_FBLK, cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FBLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cf, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, nc_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, tgt, w, wf, bias.reshape(1, c))
    s_wnll, s_w = out[0, 0], out[0, 1]
    tp, psum, tsum = out[1, :c], out[2, :c], out[3, :c]
    tpt, ptsum = out[4, :c], out[5, :c]
    loss_ce = s_wnll / jnp.maximum(s_w, 1e-12)
    score, fp, fn, denom = _dice_pieces(tp, psum, tsum)
    loss_dice = (1.0 - jnp.mean(score)) if with_dice else 0.0
    fpt = ptsum - tpt
    fnt = tsum - tpt
    fscore = jnp.mean((2 * tpt + 1e-5) / (2 * tpt + fnt + fpt + 1e-5))
    return loss_ce + loss_dice, fscore, (s_w, denom, score)


def _final_fwd_paired(feats, wf, bias, target, w, c, nc_pad, cf,
                      with_dice, interpret):
    dt = feats.dtype
    flat, tgt2, rows2 = _flatten_feats_paired(feats, cf, target, c)
    w2 = jnp.concatenate([w, w], axis=1)              # (1, 2c)
    wfb = _block_diag_w(wf, dt)
    b2 = jnp.concatenate([bias, bias]).reshape(1, 2 * c)
    out = pl.pallas_call(
        _final_reduce_kernel_p(c, nc_pad, 0.5, dt),
        out_shape=jax.ShapeDtypeStruct((6, nc_pad), jnp.float32),
        grid=(flat.shape[0] // _FBLK2,),
        in_specs=[
            pl.BlockSpec((_FBLK2, 2 * cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FBLK2, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cf, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, nc_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, tgt2, w2, wfb, b2)
    s_wnll, s_w = out[0, 0], out[0, 1]

    def fold(row):                                    # halves → per-class
        return row[:c] + row[c:2 * c]

    tp, psum, tsum = fold(out[1]), fold(out[2]), fold(out[3])
    tpt, ptsum = fold(out[4]), fold(out[5])
    loss_ce = s_wnll / jnp.maximum(s_w, 1e-12)
    score, fp, fn, denom = _dice_pieces(tp, psum, tsum)
    loss_dice = (1.0 - jnp.mean(score)) if with_dice else 0.0
    fpt = ptsum - tpt
    fnt = tsum - tpt
    fscore = jnp.mean((2 * tpt + 1e-5) / (2 * tpt + fnt + fpt + 1e-5))
    return loss_ce + loss_dice, fscore, (s_w, denom, score)


def _final_vjp_fwd(feats, kernel, bias, target, cls_weights, num_classes,
                   with_dice, interpret):
    loss, fs, resid = _final_fwd_impl(feats, kernel, bias, target,
                                      cls_weights, num_classes, with_dice,
                                      interpret)
    return (loss, fs), (feats, kernel, bias, target, resid)


def _final_vjp_bwd(cls_weights, num_classes, with_dice, interpret, res, g):
    feats, kernel, bias, target, (s_w, denom, score) = res
    gl, _ = g
    c = num_classes
    nc_pad = max(_round_up(c, 128), 128)
    A, B = _dice_coefs(score, denom, c, gl, with_dice)

    wf = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    cf = wf.shape[0]
    w = jnp.asarray(cls_weights, jnp.float32).reshape(1, c)
    if feats.shape[-1] == 2 * cf:
        return _final_vjp_bwd_paired(feats, kernel, bias, target, wf, w, c,
                                     nc_pad, cf, s_w, A, B, gl, interpret)
    flat, tgt, rows = _flatten_feats(feats, cf, target, c)
    dt = feats.dtype
    # acc rows: Cf of dW, 1 of db, padded to a sublane multiple
    acc_rows = _round_up(cf + 1, 8)
    dfeat, acc = pl.pallas_call(
        _final_grad_kernel(c, cf, dt),
        out_shape=(
            jax.ShapeDtypeStruct((flat.shape[0], cf), dt),
            jax.ShapeDtypeStruct((acc_rows, nc_pad), jnp.float32),
        ),
        grid=(flat.shape[0] // _FBLK,),
        in_specs=[
            pl.BlockSpec((_FBLK, cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FBLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cf, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((_FBLK, cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((acc_rows, nc_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, tgt, w, wf, bias.reshape(1, c), A.reshape(1, c),
      B.reshape(1, c), (gl / jnp.maximum(s_w, 1e-12)).reshape(1, 1))
    dfeat = dfeat[:rows].reshape(feats.shape)
    dw = acc[:cf, :c].reshape(kernel.shape).astype(kernel.dtype)
    db = acc[cf, :c].reshape(bias.shape).astype(bias.dtype)
    return dfeat, dw, db, None


def _final_vjp_bwd_paired(feats, kernel, bias, target, wf, w, c, nc_pad,
                          cf, s_w, A, B, gl, interpret):
    dt = feats.dtype
    flat, tgt2, rows2 = _flatten_feats_paired(feats, cf, target, c)
    w2 = jnp.concatenate([w, w], axis=1)
    wfb = _block_diag_w(wf, dt)
    b2 = jnp.concatenate([bias, bias]).reshape(1, 2 * c)
    A2 = jnp.concatenate([A, A]).reshape(1, 2 * c)
    B2 = jnp.concatenate([B, B]).reshape(1, 2 * c)
    acc_rows = _round_up(2 * cf + 1, 8)
    acc_cols = max(_round_up(2 * c, 128), 128)
    dfeat, acc = pl.pallas_call(
        _final_grad_kernel_p(c, cf, dt),
        out_shape=(
            jax.ShapeDtypeStruct((flat.shape[0], 2 * cf), dt),
            jax.ShapeDtypeStruct((acc_rows, acc_cols), jnp.float32),
        ),
        grid=(flat.shape[0] // _FBLK2,),
        in_specs=[
            pl.BlockSpec((_FBLK2, 2 * cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FBLK2, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cf, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((_FBLK2, 2 * cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((acc_rows, acc_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, tgt2, w2, wfb, b2, A2, B2,
      (gl / jnp.maximum(s_w, 1e-12)).reshape(1, 1))
    dfeat = dfeat[:rows2].reshape(feats.shape)
    # fold the block-diagonal accumulator: half-1 block + half-2 block
    dw = (acc[:cf, :c] + acc[cf:2 * cf, c:2 * c]
          ).reshape(kernel.shape).astype(kernel.dtype)
    db = (acc[2 * cf, :c] + acc[2 * cf, c:2 * c]
          ).reshape(bias.shape).astype(bias.dtype)
    return dfeat, dw, db, None


_final_ce_dice.defvjp(_final_vjp_fwd, _final_vjp_bwd)
