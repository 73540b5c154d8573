"""Device-side confusion-matrix mIoU evaluation.

Parity target: utils/utils_metrics.py:34-126 — ``fast_hist`` via
``bincount(n·a+b).reshape(n,n)`` plus the IoU/PA/Precision reductions.

TPU-native design: the per-image histogram is a one-hot matmul
(``one_hot(gt)ᵀ @ one_hot(pred)``) — an MXU contraction instead of the
host-side numpy bincount loop (get_miou.py:74-95) — so whole-dataset
evaluation streams through a single jitted accumulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# f32 accumulation is exact up to 2^24 per cell; chunk the pixel axis so a
# single huge image (e.g. 6000×4000, mostly one class) cannot silently
# saturate a cell, and accumulate chunk results in int64 on host
_CHUNK = 1 << 22


def _hist_chunk(gt, pred, num_classes: int):
    valid = (gt >= 0) & (gt < num_classes)
    g = jnp.where(valid, gt, num_classes)
    og = jax.nn.one_hot(g, num_classes + 1, dtype=jnp.float32)[:, :num_classes]
    op = jax.nn.one_hot(jnp.clip(pred, 0, num_classes - 1), num_classes,
                        dtype=jnp.float32)
    return jnp.einsum("pc,pk->ck", og, op).astype(jnp.int32)


def confusion_matrix(gt, pred, num_classes: int):
    """Confusion matrix over flat int arrays; rows = gt, cols = pred.
    Pixels with gt outside [0, num_classes) are ignored
    (reference: utils/utils_metrics.py:34-43)."""
    gt = jnp.asarray(gt).reshape(-1)
    pred = jnp.asarray(pred).reshape(-1)
    n = gt.shape[0]
    if n <= _CHUNK:
        return _hist_chunk(gt, pred, num_classes)
    hist = np.zeros((num_classes, num_classes), np.int64)
    for s in range(0, n, _CHUNK):
        hist += np.asarray(
            _hist_chunk(gt[s:s + _CHUNK], pred[s:s + _CHUNK], num_classes),
            np.int64)
    return hist


def per_class_iou(hist):
    hist = np.asarray(hist, np.float64)
    denom = np.maximum(hist.sum(1) + hist.sum(0) - np.diag(hist), 1)
    return np.diag(hist) / denom


def per_class_pa_recall(hist):
    hist = np.asarray(hist, np.float64)
    return np.diag(hist) / np.maximum(hist.sum(1), 1)


def per_class_precision(hist):
    hist = np.asarray(hist, np.float64)
    return np.diag(hist) / np.maximum(hist.sum(0), 1)


def per_accuracy(hist):
    hist = np.asarray(hist, np.float64)
    return np.diag(hist).sum() / np.maximum(hist.sum(), 1)


def compute_miou_from_hist(hist, name_classes=None, verbose: bool = True):
    """Summary dict matching compute_mIoU's printout
    (reference: utils/utils_metrics.py:97-126)."""
    ious = per_class_iou(hist)
    recalls = per_class_pa_recall(hist)
    precisions = per_class_precision(hist)
    acc = per_accuracy(hist)
    result = {
        "per_class_iou": ious,
        "per_class_recall": recalls,
        "per_class_precision": precisions,
        "miou": float(np.nanmean(ious)),
        "mpa": float(np.nanmean(recalls)),
        "accuracy": float(acc),
    }
    if verbose:
        names = name_classes or [str(i) for i in range(len(ious))]
        for n, i, r, p in zip(names, ious, recalls, precisions):
            print(f"===> {n}:\tIou-{100 * i:.2f}; Recall-{100 * r:.2f}; "
                  f"Precision-{100 * p:.2f}")
        print(f"===> mIoU: {100 * result['miou']:.2f}; "
              f"mPA: {100 * result['mpa']:.2f}; "
              f"Accuracy: {100 * result['accuracy']:.2f}")
    return result
