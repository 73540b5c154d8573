"""Competition export — the results__exported.py counterpart.

Parity target: "results__exported .py":14-195 — baseline vs custom model:
param counts, FPS via timed get_miou_png loop, per-image .npy prediction/GT
dumps, mIoU over the dumps, metrics dict written to 关键指标数据文档.txt.
"""
from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from tpu_unet.eval.metrics import confusion_matrix, per_class_iou
from tpu_unet.models.registry import count_params


def calculate_fps(wrapper, image: Image.Image, iters: int = 100) -> float:
    """Timed get_miou_png loop (reference: results__exported .py:48-55)."""
    wrapper.get_miou_png(image)  # warmup
    t0 = time.time()
    for _ in range(iters):
        wrapper.get_miou_png(image)
    return iters / (time.time() - t0)


def export_results(models: dict, ids: Sequence[str], image_dir: str,
                   gt_dir: str, num_classes: int, out_dir: str,
                   image_ext: str = ".jpg", fps_iters: int = 100,
                   save_npy: bool = True):
    """``models``: {'UNet': wrapper, 'OursModel': wrapper}.  Writes per-model
    prediction_%06d.npy / ground_truth_%06d.npy dumps plus the metrics dict
    (reference: results__exported .py:58-186)."""
    os.makedirs(out_dir, exist_ok=True)
    metrics = {}
    for mname, wrapper in models.items():
        hist = np.zeros((num_classes, num_classes), np.int64)
        npy_dir = os.path.join(out_dir, mname)
        if save_npy:
            os.makedirs(npy_dir, exist_ok=True)
        first_img = None
        for i, name in enumerate(ids):
            img = Image.open(os.path.join(image_dir, name + image_ext))
            if first_img is None:
                first_img = img
            pred = np.asarray(wrapper.get_miou_png(img))
            gt = np.asarray(Image.open(os.path.join(gt_dir, name + ".png")))
            if save_npy:
                np.save(os.path.join(npy_dir, f"prediction_{i:06d}.npy"), pred)
                np.save(os.path.join(npy_dir, f"ground_truth_{i:06d}.npy"), gt)
            if gt.shape == pred.shape:
                hist += np.asarray(confusion_matrix(gt, pred, num_classes))
        ious = per_class_iou(hist)
        fg = ious[1:]  # competition metric: foreground classes only
        entry = {f"Class{c}_IoU": float(ious[c]) for c in range(1, num_classes)}
        entry["mIoU"] = float(np.nanmean(fg))
        entry["FPS"] = calculate_fps(wrapper, first_img, fps_iters)
        entry["Parameters"] = count_params(wrapper.variables)
        metrics[mname] = entry
    with open(os.path.join(out_dir, "关键指标数据文档.txt"), "w",
              encoding="utf-8") as f:
        f.write(repr(metrics))
    return metrics


def pack_submission(src_dir: str, out_path: str) -> str:
    """Archive the submission artifacts (the output.py counterpart,
    reference: output.py:1-37 — py7zr there; zip here, no extra deps)."""
    import shutil

    base, ext = os.path.splitext(out_path)
    fmt = {".zip": "zip", ".tar": "tar", ".gz": "gztar"}.get(ext, "zip")
    archive = shutil.make_archive(base, fmt, src_dir)
    print(f"packed {src_dir} -> {archive}")
    return archive


def check_nan_in_npy(npy_dir: str) -> int:
    """NaN audit over prediction dumps (reference: check_nan_in_npy.py:4-22)."""
    bad = 0
    for fname in sorted(os.listdir(npy_dir)):
        if fname.endswith(".npy"):
            arr = np.load(os.path.join(npy_dir, fname))
            if np.isnan(arr.astype(np.float64)).any():
                print(f"NaN found in {fname}")
                bad += 1
    print(f"{bad} files with NaN")
    return bad
