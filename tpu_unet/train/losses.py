"""Segmentation losses — exact math parity with the reference.

Parity targets (reference: nets/unet_training.py):
- ce_loss    :9-19   weighted pixel CE with ignore_index = num_classes
                     (the VOC white-border class)
- focal_loss :21-36  α=0.5, γ=2 focal on top of weighted per-pixel CE
- dice_loss  :38-56  soft dice vs one-hot (last one-hot channel = ignore,
                     dropped), β=1, smooth=1e-5
- f_score    utils/utils_metrics.py:12-31 (thresholded train-time dice)

Conventions: logits are NHWC (N,H,W,C); ``target`` is an int map (N,H,W)
with values in [0, num_classes] where ``num_classes`` marks ignored pixels;
``onehot`` is (N,H,W,C+1) with the extra last channel for the ignore class.
If logits' spatial size differs from the target's, logits are bilinear-
resized (align_corners=True) first, as in the reference.

torch's weighted CE normalizes the mean by the *sum of weights* of the
contributing pixels, not the pixel count — matched here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_unet.nn.resize import resize_bilinear


def _match_size(logits, spatial):
    if logits.shape[1:3] != tuple(spatial):
        logits = resize_bilinear(logits, spatial, align_corners=True)
    return logits


def _per_pixel_weighted_ce(logits, target, cls_weights, num_classes):
    """Returns (per-pixel weighted NLL, per-pixel weight) with ignored
    pixels carrying weight 0.

    TPU note: implemented with one-hot reductions, not gathers — the
    take_along_axis / table-lookup formulation lowered to per-pixel
    dynamic-gathers costing 46 ms/step at 512px batch 8 (22% of the whole
    train step, seen in the device trace); the one-hot compare+reduce is
    pure VPU.
    """
    logits = _match_size(logits, target.shape[1:3])
    logits = logits.astype(jnp.float32)
    valid = target < num_classes
    t = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
    nll = -(logp * onehot).sum(axis=-1)
    w = (onehot @ jnp.asarray(cls_weights, jnp.float32)) \
        * valid.astype(jnp.float32)
    return nll * w, w


def ce_loss(logits, target, cls_weights, num_classes: int = 21):
    """Weighted cross-entropy (reference: nets/unet_training.py:9-19)."""
    wnll, w = _per_pixel_weighted_ce(logits, target, cls_weights, num_classes)
    return jnp.sum(wnll) / jnp.maximum(jnp.sum(w), 1e-12)


def focal_loss(logits, target, cls_weights, num_classes: int = 21,
               alpha: float = 0.5, gamma: float = 2.0):
    """Focal loss (reference: nets/unet_training.py:21-36).

    Faithful subtlety: the reference computes per-pixel weighted CE with
    reduction='none' (ignored pixels → 0), then ``pt = exp(-ce)`` and takes
    the mean over *all* pixels including ignored ones (where the term is
    ``-(1-1)^γ·0 = 0``), so the denominator is the full pixel count.
    """
    wnll, _ = _per_pixel_weighted_ce(logits, target, cls_weights, num_classes)
    logpt = -wnll
    pt = jnp.exp(logpt)
    logpt = logpt * alpha
    loss = -((1.0 - pt) ** gamma) * logpt
    return jnp.mean(loss)


def dice_loss(logits, onehot, beta: float = 1.0, smooth: float = 1e-5):
    """Soft-dice vs one-hot labels (reference: nets/unet_training.py:38-56).
    ``onehot`` is (N,H,W,C+1); its last channel (ignore) is dropped."""
    logits = _match_size(logits, onehot.shape[1:3]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    n = probs.shape[0]
    probs = probs.reshape(n, -1, probs.shape[-1])
    target = onehot.reshape(n, -1, onehot.shape[-1])[..., :-1]

    tp = jnp.sum(target * probs, axis=(0, 1))
    fp = jnp.sum(probs, axis=(0, 1)) - tp
    fn = jnp.sum(target, axis=(0, 1)) - tp
    b2 = beta ** 2
    score = ((1 + b2) * tp + smooth) / ((1 + b2) * tp + b2 * fn + fp + smooth)
    return 1.0 - jnp.mean(score)


def f_score(logits, onehot, beta: float = 1.0, smooth: float = 1e-5,
            threshold: float = 0.5):
    """Train-time thresholded dice metric (reference: utils/utils_metrics.py:12-31)."""
    logits = _match_size(logits, onehot.shape[1:3]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    n = probs.shape[0]
    probs = (probs.reshape(n, -1, probs.shape[-1]) > threshold).astype(jnp.float32)
    target = onehot.reshape(n, -1, onehot.shape[-1])[..., :-1]

    tp = jnp.sum(target * probs, axis=(0, 1))
    fp = jnp.sum(probs, axis=(0, 1)) - tp
    fn = jnp.sum(target, axis=(0, 1)) - tp
    b2 = beta ** 2
    score = ((1 + b2) * tp + smooth) / ((1 + b2) * tp + b2 * fn + fp + smooth)
    return jnp.mean(score)


def deep_supervision_loss(outputs, target, onehot, cls_weights,
                          num_classes: int, use_focal: bool = False,
                          use_dice: bool = False,
                          aux_weights=(1.0, 0.4, 0.3, 0.2)):
    """Weighted main+aux loss for deep-supervision models.

    The reference *intends* this but ships a broken import
    (dataB-train_Supervision.py:23 calls a nonexistent
    fit_one_epoch_use_wandb_Supervision) — this is the reinvention
    SURVEY.md §7 step 5 calls for: main output at weight 1.0, aux heads
    at decaying weights, each with the same CE/focal(+dice) recipe.
    """
    if not isinstance(outputs, (tuple, list)):
        outputs = (outputs,)
    total = 0.0
    for out, w in zip(outputs, aux_weights):
        base = (focal_loss if use_focal else ce_loss)(
            out, target, cls_weights, num_classes)
        if use_dice:
            base = base + dice_loss(out, onehot)
        total = total + w * base
    return total
