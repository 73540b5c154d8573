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


def _reduce_kernel(c, nc_pad, threshold):
    def kernel(logits_ref, tgt_ref, w_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        x = logits_ref[...].astype(jnp.float32)          # (B, C)
        t = tgt_ref[...].astype(jnp.int32)                # (B, 1) int8
        logp = jax.nn.log_softmax(x, axis=-1)
        probs = jnp.exp(logp)
        ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        onehot = (ci == t).astype(jnp.float32)            # ignore → all-zero
        valid = (t < c).astype(jnp.float32)               # (B, 1)
        # real pixels (incl. ignored, which DO count in dice fp per the
        # reference) vs padding rows (tgt = c + 1), which must not
        real = (t <= c).astype(jnp.float32)
        w_pix = jnp.sum(onehot * w_ref[...], axis=-1, keepdims=True) * valid
        nll = -jnp.sum(logp * onehot, axis=-1, keepdims=True)
        pt = (probs > threshold).astype(jnp.float32) * real

        def cpad(v):  # (1, C) → (1, nc_pad)
            return jnp.pad(v, ((0, 0), (0, nc_pad - v.shape[-1])))

        scal = jnp.concatenate([jnp.sum(w_pix * nll).reshape(1, 1),
                                jnp.sum(w_pix).reshape(1, 1)], axis=1)
        row = jnp.concatenate([
            cpad(scal),                                               # wnll,w
            cpad(jnp.sum(probs * onehot, axis=0, keepdims=True)),     # tp
            cpad(jnp.sum(probs * real, axis=0, keepdims=True)),       # psum
            cpad(jnp.sum(onehot, axis=0, keepdims=True)),             # tsum
            cpad(jnp.sum(pt * onehot, axis=0, keepdims=True)),        # tp@th
            cpad(jnp.sum(pt, axis=0, keepdims=True)),                 # pos@th
        ], axis=0)                                                    # (6,·)
        out_ref[...] += row

    return kernel


def _grad_kernel(c, dt):
    def kernel(logits_ref, tgt_ref, w_ref, coefA_ref, coefB_ref,
               scal_ref, dlog_ref):
        x = logits_ref[...].astype(jnp.float32)
        t = tgt_ref[...].astype(jnp.int32)
        probs = jax.nn.softmax(x, axis=-1)
        ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        onehot = (ci == t).astype(jnp.float32)
        valid = (t < c).astype(jnp.float32)
        w_pix = jnp.sum(onehot * w_ref[...], axis=-1, keepdims=True) * valid

        inv_sw = scal_ref[0, 0]
        g_ce = w_pix * (probs - onehot) * inv_sw

        # dice: dL/dprobs[p,c] = A_c * onehot + B_c; through softmax:
        # dlogits = probs * (dLdp - sum_c dLdp * probs)
        dldp = coefA_ref[...] * onehot + coefB_ref[...]
        inner = jnp.sum(dldp * probs, axis=-1, keepdims=True)
        g_dice = probs * (dldp - inner)

        dlog_ref[...] = (g_ce + g_dice).astype(dt)

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
                threshold=0.5, interpret=False):
    c = num_classes
    nc_pad = max(_round_up(c, 128), 128)
    flat, tgt, rows = _flatten(logits, target)
    w = jnp.asarray(cls_weights, jnp.float32).reshape(1, c)
    out = pl.pallas_call(
        _reduce_kernel(c, nc_pad, threshold),
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
                      with_dice: bool = True, interpret: bool = False):
    """Fused (CE + dice) loss with custom gradient; also returns f_score.

    Equivalent to ``ce_loss(...) + dice_loss(...)`` and ``f_score(...)``
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
    return _ce_dice(logits, target,
                    tuple(np.asarray(cls_weights, np.float32).tolist()),
                    num_classes, with_dice, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _ce_dice(logits, target, cls_weights, num_classes, with_dice, interpret):
    loss, fs, _ = _fwd_impl(logits, target, cls_weights, num_classes,
                            with_dice, interpret)
    return loss, fs


def _fwd_impl(logits, target, cls_weights, num_classes, with_dice, interpret):
    c = num_classes
    s_wnll, s_w, tp, psum, tsum, tpt, ptsum = _reductions(
        logits, target, cls_weights, c, interpret=interpret)
    loss_ce = s_wnll / jnp.maximum(s_w, 1e-12)
    score, fp, fn, denom = _dice_pieces(tp, psum, tsum)
    loss_dice = (1.0 - jnp.mean(score)) if with_dice else 0.0
    # f_score (threshold 0.5)
    fpt = ptsum - tpt
    fnt = tsum - tpt
    fscore = jnp.mean((2 * tpt + 1e-5) / (2 * tpt + fnt + fpt + 1e-5))
    return loss_ce + loss_dice, fscore, (s_w, tp, fp, fn, denom, score)


def _vjp_fwd(logits, target, cls_weights, num_classes, with_dice,
             interpret):
    loss, fs, resid = _fwd_impl(logits, target, cls_weights, num_classes,
                                with_dice, interpret)
    return (loss, fs), (logits, target, resid)


def _vjp_bwd(cls_weights, num_classes, with_dice, interpret, res, g):
    logits, target, (s_w, tp, fp, fn, denom, score) = res
    gl, _ = g  # f_score is treated as a metric (no gradient)
    c = num_classes

    # dice coefficient algebra: score_c = ((1+b2) tp + s) / denom with
    # denom = (1+b2) tp + b2 fn + fp + s.  For probs[p, k]:
    #   d tp_k = onehot_k ;  d fp_k = 1 - onehot_k ;  d fn_k = 0 - onehot_k
    # wait: fn = tsum - tp → d fn_k/d probs = -onehot_k... via tp only.
    # d score_k = [(1+b2) d tp * denom - ((1+b2) d tp + d fp) * num]/denom^2
    # with num = (1+b2) tp + s = score * denom:
    #   onehot part: (1+b2)(1 - score)/denom + score/denom  ... derived:
    b2 = 1.0
    num = score * denom
    # d score / d tp  (fn decreases as tp increases with tsum fixed;
    # fp decreases as tp increases with psum fixed — but tp, fp, fn are
    # independent functions of probs; use the chain rule on (tp, psum):
    # score = ((1+b2)tp + s) / (b2*tsum + psum + tp*(1+b2-b2-1) + s)
    #       = ((1+b2)tp + s) / (b2*tsum + psum + s)   [denominator has no tp!]
    # since (1+b2)tp + b2(tsum-tp) + (psum-tp) = b2*tsum + psum + tp(1+b2-b2-1)
    # = b2*tsum + psum.  So d score/d tp = (1+b2)/denom and
    # d score/d psum = -num/denom².
    dsc_dtp = (1.0 + b2) / denom
    dsc_dpsum = -num / (denom * denom)
    # loss_dice = 1 - mean(score):  dL/dtp_c = -dsc_dtp/c ; dL/dpsum_c = ...
    A = (-dsc_dtp / c) * gl            # coefficient on onehot (per class)
    B = (-dsc_dpsum / c) * gl          # coefficient on plain probs
    if not with_dice:
        A = jnp.zeros_like(A)
        B = jnp.zeros_like(B)

    nc = num_classes
    flat, tgt, rows = _flatten(logits, target)
    w = jnp.asarray(cls_weights, jnp.float32).reshape(1, nc)
    dt = logits.dtype
    dlog = pl.pallas_call(
        _grad_kernel(nc, dt),
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
      (gl / jnp.maximum(s_w, 1e-12)).reshape(1, 1))
    n, h, wd, _ = logits.shape
    dlog = dlog[:rows].reshape(n, h, wd, nc)
    return dlog, None


_ce_dice.defvjp(_vjp_fwd, _vjp_bwd)
