"""Offline evaluation driver — the get_miou.py counterpart.

Parity target: get_miou.py:17-65 + utils/utils_metrics.py:57-126.  The
reference writes per-image prediction PNGs then re-reads the pairs on host;
here the confusion matrix accumulates directly on device, with optional PNG
dumping for byte-compatibility with the reference workflow (miou_mode 1).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from tpu_unet.eval.metrics import compute_miou_from_hist, confusion_matrix


def evaluate(wrapper, ids: Sequence[str], gt_dir: str, num_classes: int,
             name_classes: Optional[Sequence[str]] = None,
             image_dir: Optional[str] = None, image_ext: str = ".jpg",
             pred_dir: Optional[str] = None, verbose: bool = True):
    """Run wrapper.get_miou_png over ``ids``, accumulate the device-side
    confusion matrix vs the GT PNGs, return the metric summary."""
    if pred_dir:
        os.makedirs(pred_dir, exist_ok=True)
    hist = np.zeros((num_classes, num_classes), np.int64)
    skipped = 0
    for name in ids:
        img = Image.open(os.path.join(image_dir, name + image_ext))
        pred = wrapper.get_miou_png(img)
        if pred_dir:
            pred.save(os.path.join(pred_dir, name + ".png"))
        gt = np.asarray(Image.open(os.path.join(gt_dir, name + ".png")))
        pr = np.asarray(pred)
        if gt.shape != pr.shape:
            # size-mismatch skip (reference: utils/utils_metrics.py:85-90)
            skipped += 1
            continue
        hist += np.asarray(confusion_matrix(gt, pr, num_classes))
    if verbose and skipped:
        print(f"skipped {skipped} size-mismatched pairs")
    return compute_miou_from_hist(hist, name_classes, verbose)


def evaluate_npy(pred_dir: str, gt_dir: str, num_classes: int,
                 name_classes=None, verbose: bool = True):
    """mIoU over prediction_%06d.npy / ground_truth_%06d.npy dumps — the
    competition format (reference: utils/utils_metrics.py:134-203)."""
    import glob

    hist = np.zeros((num_classes, num_classes), np.int64)
    preds = sorted(glob.glob(os.path.join(pred_dir, "prediction_*.npy")))
    for p in preds:
        idx = os.path.basename(p)[len("prediction_"):-len(".npy")]
        g = os.path.join(gt_dir, f"ground_truth_{idx}.npy")
        if not os.path.exists(g):
            continue
        pred = np.load(p)
        gt = np.load(g)
        if pred.shape != gt.shape:
            continue
        hist += np.asarray(confusion_matrix(gt, pred, num_classes))
    return compute_miou_from_hist(hist, name_classes, verbose)


def show_results(result: dict, out_dir: str, name_classes=None,
                 foreground_only: bool = True):
    """Bar plots + confusion CSV (reference: utils/utils_metrics.py:238-265).
    ``foreground_only`` replicates the reference's title averaging classes
    1..n-1 only (:241-243)."""
    os.makedirs(out_dir, exist_ok=True)
    ious = result["per_class_iou"]
    title_miou = np.nanmean(ious[1:]) if foreground_only and len(ious) > 1 \
        else result["miou"]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        names = name_classes or [str(i) for i in range(len(ious))]
        for key, vals in (("mIoU", ious),
                          ("mPA_Recall", result["per_class_recall"]),
                          ("Precision", result["per_class_precision"])):
            plt.figure()
            plt.barh(range(len(vals)), [100 * v for v in vals])
            plt.yticks(range(len(vals)), names)
            plt.title(f"{key} = {100 * title_miou:.2f}%" if key == "mIoU"
                      else key)
            plt.tight_layout()
            plt.savefig(os.path.join(out_dir, f"{key}.png"))
            plt.close("all")
    except Exception:
        pass
    np.savetxt(os.path.join(out_dir, "confusion_matrix.csv"),
               np.asarray(result.get("hist", [[0]])), fmt="%d", delimiter=",")
    return title_miou
