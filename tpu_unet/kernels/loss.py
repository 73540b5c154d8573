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
    # out-of-range labels (e.g. a raw 255 VOC border) map to the ignore
    # class c, exactly as the reference pipeline does
    # (utils/dataloader.py:43 png[png >= num_classes] = num_classes) —
    # ignored by CE, but still counted in the dice/f_score prob sums.
    # Without this, the int8 cast would wrap 255 to -1.
    target = jnp.minimum(target, num_classes)
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


# -- paired-native, class-TRANSPOSED variant ---------------------------------
#
# When the feature map arrives column-PAIRED (last dim == 2·Cf) the kernels
# consume it as (rows/2, 2Cf) blocks DIRECTLY — for a (B, H, W/2, 2Cf)
# {3,2,1,0} buffer that flat view is a pure bitcast (full 128-lane tiles).
#
# Round-3 profiling of the previous paired variant (logits as (rows, 2c)
# with the softmax/CE/dice math on 42-of-128 lanes) showed it at ~27% of
# its floor: 5.6 ms/step fwd+bwd at 512px/bs8, almost all VPU passes at
# 33% lane occupancy, plus a 0.8 ms lane-padded (rows, 2) s8 target
# reshape.  This variant TRANSPOSES the classes onto sublanes:
#
#   xT = Wst · fᵀ  — ONE stacked matmul per block producing (2·cp, R):
#        rows [0, cp) are the even pixel's class logits, rows [cp, 2cp)
#        the odd pixel's (cp = num_classes rounded up to the 8-sublane
#        tile).  Every elementwise pass then runs on (48, R) at ~88%
#        sublane occupancy with R = 8192 full lanes; softmax reductions
#        are short sublane trees instead of 128-lane trees; log and the
#        reciprocal run on (1, R) row vectors only.
#
# Targets arrive as two DENSE (nblk, R) s8 operands (even/odd pixels,
# host-sliced) — no lane-padded (rows, 2) operand, so the 0.8 ms padded
# reshape disappears.  The backward needs just three stacked matmuls
# (logit recompute, dfeat, dW) — K/N = 2cp is one MXU tile either way,
# so stacking even|odd halves halves the matmul count vs block-diagonal.

_FBLKT = 8192


def _tp_pieces(x, te, to, cp, c, threshold):
    """Shared per-block transposed math on x (2cp, R) f32.

    Returns (onehot, valid, real, pt, logp, probs) all (2cp, R) f32 —
    padding rows (class index >= c) carry exact zeros in onehot/probs."""
    R = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    half_o = row >= cp
    cls = row - jnp.where(half_o, cp, 0)
    rowvalid = cls < c
    t = jnp.where(half_o, jnp.broadcast_to(to, x.shape),
                  jnp.broadcast_to(te, x.shape))
    onehot = ((cls == t) & rowvalid).astype(jnp.float32)
    valid = (t < c).astype(jnp.float32)
    real = (t <= c).astype(jnp.float32)
    neg = jnp.float32(-1e30)
    xm = jnp.where(rowvalid, x, neg)

    def per_half(v, red):
        a = red(v[:cp], axis=0, keepdims=True)
        b = red(v[cp:], axis=0, keepdims=True)
        return jnp.concatenate([jnp.broadcast_to(a, (cp, R)),
                                jnp.broadcast_to(b, (cp, R))], axis=0)

    m = per_half(xm, jnp.max)
    ex = jnp.where(rowvalid, jnp.exp(x - m), 0.0)
    # the transcendental/divide tail runs on (1, R) rows only
    s_e = jnp.sum(ex[:cp], axis=0, keepdims=True)
    s_o = jnp.sum(ex[cp:], axis=0, keepdims=True)
    logs = jnp.concatenate([
        jnp.broadcast_to(jnp.log(s_e), (cp, R)),
        jnp.broadcast_to(jnp.log(s_o), (cp, R))], axis=0)
    sinv = jnp.concatenate([
        jnp.broadcast_to(1.0 / s_e, (cp, R)),
        jnp.broadcast_to(1.0 / s_o, (cp, R))], axis=0)
    logp = x - m - logs
    probs = ex * sinv
    pt = (probs > threshold).astype(jnp.float32) * real
    return onehot, valid, real, pt, logp, probs, per_half


def _final_reduce_kernel_pt(c, cp, threshold, dt):
    def kernel(te_ref, to_ref, wst_ref, bcol_ref, f_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        f = f_ref[...]                                    # (R, 2Cf) dt
        x = jax.lax.dot_general(
            wst_ref[...], f, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (2cp, R)
        x = x + bcol_ref[...]
        te = te_ref[0].astype(jnp.int32)                  # (1, R)
        to = to_ref[0].astype(jnp.int32)
        onehot, valid, real, pt, logp, probs, _ = _tp_pieces(
            x, te, to, cp, c, threshold)

        def lsum(v):                                      # (2cp,R) → (cp,1)
            t2 = jnp.sum(v, axis=1, keepdims=True)
            return t2[:cp] + t2[cp:]

        row7 = jnp.concatenate([
            lsum(onehot * (-logp) * valid),               # per-class nll
            lsum(onehot * valid),                         # per-class count
            lsum(probs * onehot),                         # tp
            lsum(probs * real),                           # psum
            lsum(onehot),                                 # tsum
            lsum(pt * onehot),                            # tpt
            lsum(pt),                                     # ptsum
        ], axis=1)                                        # (cp, 7)
        out_ref[...] += jnp.pad(
            row7, ((0, 0), (0, out_ref.shape[1] - row7.shape[1])))

    return kernel


def _final_grad_kernel_pt(c, cp, cf, acc_rows, dt):
    def kernel(te_ref, to_ref, wst_ref, bcol_ref, wcol_ref,
               coefA_ref, coefB_ref, scal_ref, f_ref, dfeat_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        f = f_ref[...]                                    # (R, 2Cf) dt
        x = jax.lax.dot_general(
            wst_ref[...], f, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (2cp, R)
        x = x + bcol_ref[...]
        te = te_ref[0].astype(jnp.int32)
        to = to_ref[0].astype(jnp.int32)
        onehot, valid, real, pt, logp, probs, per_half = _tp_pieces(
            x, te, to, cp, c, 0.5)
        # per-pixel CE weight w[target]·valid: the one-hot row selects it,
        # then the per-half column sum broadcasts it back to all classes
        w_pix = per_half(onehot * wcol_ref[...], jnp.sum) * valid
        g_ce = w_pix * (probs - onehot) * scal_ref[0, 0]
        dldp = coefA_ref[...] * onehot + coefB_ref[...]
        dp = dldp * probs
        inner = per_half(dp, jnp.sum)
        g_dice = probs * (dldp - inner)
        dlog = ((g_ce + g_dice) * real).astype(dt)        # (2cp, R)

        # dfeat (R, 2Cf) and dW (2Cf, 2cp) as stacked full-K matmuls
        dfeat_ref[...] = jax.lax.dot_general(
            dlog, wst_ref[...], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        dw = jax.lax.dot_general(
            f, dlog, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (2Cf, 2cp)
        dbcol = jnp.sum(dlog.astype(jnp.float32), axis=1, keepdims=True)
        block = jnp.concatenate([
            jnp.pad(dw, ((0, acc_rows - 2 * cf), (0, 0))),
            jnp.pad(dbcol, ((0, acc_rows - 2 * cp), (0, 0)))], axis=1)
        acc_ref[...] += jnp.pad(
            block, ((0, 0), (0, acc_ref.shape[1] - block.shape[1])))

    return kernel


def _flatten_feats_pt(feats, cf, target, c):
    """Paired feature flat view + DENSE even/odd target operands.

    Returns (flat (rowsp, 2Cf), te (nblk, R) s8, to (nblk, R) s8, rows2).

    The even/odd split runs as ONE MXU selection matmul: the flat target
    (rows, W) bf16 times a constant (W, W) 0/1 matrix whose left half
    gathers even columns and right half odd columns.  Class ids are ≤ 127
    (asserted by the public entry), hence exact in bf16, and each output
    is a single selected term — exact.  The two lane-strided s8 slices
    this replaces ran at ~0.26 ms each at 512px/bs8 (s8 (4,1)-packed
    tiles make stride-2 element gathers sublane-serial); the matmul + two
    tile-aligned lane slices compile to ~0.03 ms.  Out-of-range labels
    were clamped to the ignore class c at the public entry (reference
    semantics, utils/dataloader.py:43); the min with c+1 here is only a
    guard against int8 wrap for internal callers."""
    rows2 = int(np.prod(feats.shape[:-1]))            # pixel pairs
    flat = feats.reshape(rows2, 2 * cf)
    w = target.shape[-1]
    if w % 2 or w % 128:
        # odd/short widths (tests, tiny shapes): plain strided slices
        tfl = target.reshape(2 * rows2)
        te = jax.lax.slice(tfl, (0,), (2 * rows2 - 1,), (2,))
        to = jax.lax.slice(tfl, (1,), (2 * rows2,), (2,))
        te = jnp.minimum(te, c + 1).astype(jnp.int8)
        to = jnp.minimum(to, c + 1).astype(jnp.int8)
    else:
        half = w // 2
        sel = np.zeros((w, w), np.float32)
        sel[np.arange(0, w, 2), np.arange(half)] = 1.0
        sel[np.arange(1, w, 2), half + np.arange(half)] = 1.0
        t2d = jnp.minimum(target.reshape(-1, w), c + 1).astype(jnp.bfloat16)
        eo = jax.lax.dot_general(
            t2d, jnp.asarray(sel, jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (rows, [E|O])
        te = eo[:, :half].astype(jnp.int8).reshape(rows2)
        to = eo[:, half:].astype(jnp.int8).reshape(rows2)
    pad = (-rows2) % _FBLKT
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        te = jnp.pad(te, (0, pad), constant_values=c + 1)
        to = jnp.pad(to, (0, pad), constant_values=c + 1)
    nblk = flat.shape[0] // _FBLKT
    # (nblk, 1, R): the only blockable layout for a per-block row vector —
    # a 2D (nblk, R) array would need a (1, R) block, which violates the
    # 8-sublane block rule; with the singleton middle dim the block's
    # last-two dims equal/divide the array's (1, R % 128 == 0)
    return (flat, te.reshape(nblk, 1, _FBLKT), to.reshape(nblk, 1, _FBLKT),
            rows2)


def _stacked_w(wf, cp, dt):
    """(Cf, c) → (2Cf, 2cp): columns [0, cp) classify the EVEN pixel from
    feature rows [0, Cf), columns [cp, 2cp) the ODD pixel from rows
    [Cf, 2Cf); class columns c..cp-1 are zero."""
    cf, c = wf.shape
    z = jnp.zeros((cf, cp), wf.dtype)
    wp = jnp.pad(wf, ((0, 0), (0, cp - c)))
    return jnp.concatenate([
        jnp.concatenate([wp, z], axis=1),
        jnp.concatenate([z, wp], axis=1)], axis=0).astype(dt)  # (2Cf, 2cp)


def _col2(v, cp, c, dtype=jnp.float32):
    """Per-class row vector (c,) → stacked column (2cp, 1)."""
    vp = jnp.pad(v.reshape(-1).astype(dtype), (0, cp - c))
    return jnp.concatenate([vp, vp]).reshape(2 * cp, 1)


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
    # out-of-range labels → ignore class c, matching the reference
    # (utils/dataloader.py:43); see ce_dice_loss_grad
    target = jnp.minimum(target, num_classes)
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
    cp = _round_up(c, 8)
    flat, te2, to2, rows2 = _flatten_feats_pt(feats, cf, target, c)
    wst = _stacked_w(wf, cp, dt)                      # (2Cf, 2cp)
    bcol = _col2(bias, cp, c)                         # (2cp, 1) f32
    out = pl.pallas_call(
        _final_reduce_kernel_pt(c, cp, 0.5, dt),
        out_shape=jax.ShapeDtypeStruct((cp, 128), jnp.float32),
        grid=(flat.shape[0] // _FBLKT,),
        in_specs=[
            pl.BlockSpec((1, 1, _FBLKT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _FBLKT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cf, 2 * cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FBLKT, 2 * cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cp, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(te2, to2, wst, bcol, flat)
    nll, cnt = out[:c, 0], out[:c, 1]
    tp, psum, tsum = out[:c, 2], out[:c, 3], out[:c, 4]
    tpt, ptsum = out[:c, 5], out[:c, 6]
    wv = w.reshape(-1)
    s_wnll = jnp.sum(wv * nll)
    s_w = jnp.sum(wv * cnt)
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
    cp = _round_up(c, 8)
    flat, te2, to2, rows2 = _flatten_feats_pt(feats, cf, target, c)
    wst = _stacked_w(wf, cp, dt)
    bcol = _col2(bias, cp, c)
    wcol = _col2(w, cp, c)
    Acol = _col2(A, cp, c)
    Bcol = _col2(B, cp, c)
    acc_rows = _round_up(max(2 * cf, 2 * cp), 8)
    acc_cols = max(_round_up(2 * cp + 1, 128), 128)
    dfeat, acc = pl.pallas_call(
        _final_grad_kernel_pt(c, cp, cf, acc_rows, dt),
        out_shape=(
            jax.ShapeDtypeStruct((flat.shape[0], 2 * cf), dt),
            jax.ShapeDtypeStruct((acc_rows, acc_cols), jnp.float32),
        ),
        grid=(flat.shape[0] // _FBLKT,),
        in_specs=[
            pl.BlockSpec((1, 1, _FBLKT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _FBLKT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cf, 2 * cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((_FBLKT, 2 * cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_FBLKT, 2 * cf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((acc_rows, acc_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(te2, to2, wst, bcol, wcol, Acol, Bcol,
      (gl / jnp.maximum(s_w, 1e-12)).reshape(1, 1), flat)
    dfeat = dfeat[:rows2].reshape(feats.shape)
    # fold the stacked accumulator: even block + odd block
    dw = (acc[:cf, :c] + acc[cf:2 * cf, cp:cp + c]
          ).reshape(kernel.shape).astype(kernel.dtype)
    db = (acc[:c, 2 * cp] + acc[cp:cp + c, 2 * cp]
          ).reshape(bias.shape).astype(bias.dtype)
    return dfeat, dw, db, None


_final_ce_dice.defvjp(_final_vjp_fwd, _final_vjp_bwd)
