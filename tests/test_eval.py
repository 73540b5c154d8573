"""Evaluation metric golden tests vs the reference's numpy math
(utils/utils_metrics.py:34-126)."""
import numpy as np
import pytest

from tpu_unet.eval.metrics import (compute_miou_from_hist, confusion_matrix,
                                   per_accuracy, per_class_iou,
                                   per_class_pa_recall, per_class_precision)


def _ref_fast_hist(a, b, n):
    k = (a >= 0) & (a < n)
    return np.bincount(n * a[k].astype(int) + b[k],
                       minlength=n ** 2).reshape(n, n)


def test_confusion_matrix_matches_reference_bincount():
    rng = np.random.RandomState(0)
    n = 4
    gt = rng.randint(0, n + 1, size=1000)   # includes ignore value n
    pred = rng.randint(0, n, size=1000)
    ours = np.asarray(confusion_matrix(gt, pred, n))
    ref = _ref_fast_hist(gt, pred, n)
    np.testing.assert_array_equal(ours, ref)


def test_iou_reductions_match_reference():
    rng = np.random.RandomState(1)
    hist = rng.randint(0, 100, size=(5, 5)).astype(np.int64)
    ious = per_class_iou(hist)
    ref_iou = np.diag(hist) / np.maximum(
        hist.sum(1) + hist.sum(0) - np.diag(hist), 1)
    np.testing.assert_allclose(ious, ref_iou)
    np.testing.assert_allclose(per_class_pa_recall(hist),
                               np.diag(hist) / np.maximum(hist.sum(1), 1))
    np.testing.assert_allclose(per_class_precision(hist),
                               np.diag(hist) / np.maximum(hist.sum(0), 1))
    np.testing.assert_allclose(per_accuracy(hist),
                               np.diag(hist).sum() / hist.sum())


def test_compute_miou_summary():
    hist = np.diag([10, 20, 30])
    res = compute_miou_from_hist(hist, ["a", "b", "c"], verbose=False)
    assert res["miou"] == pytest.approx(1.0)
    assert res["accuracy"] == pytest.approx(1.0)


def test_perfect_and_worst_case():
    gt = np.array([0, 1, 2, 3] * 10)
    ours = np.asarray(confusion_matrix(gt, gt, 4))
    assert np.trace(ours) == 40
    res = compute_miou_from_hist(ours, verbose=False)
    assert res["miou"] == pytest.approx(1.0)
