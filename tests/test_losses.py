"""Loss/schedule golden tests vs torch reference math
(reference: nets/unet_training.py — pure math, ideal for exact tests)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tpu_unet.train.losses import (ce_loss, dice_loss, f_score,  # noqa: E402
                                   focal_loss)
from tpu_unet.train.schedules import adaptive_lr, get_lr_scheduler  # noqa: E402

NC = 4


def _data(seed=0, n=2, h=8, w=8, with_ignore=True):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, h, w, NC).astype("float32")
    hi = NC + 1 if with_ignore else NC
    target = rng.randint(0, hi, size=(n, h, w)).astype("int32")
    onehot = np.eye(NC + 1, dtype="float32")[target]
    weights = np.array([1.0, 15.0, 1.5, 2.0], "float32")
    return logits, target, onehot, weights


def _torch_ce(logits, target, weights):
    t_in = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    t_tg = torch.from_numpy(target.astype("int64"))
    c = t_in.shape[1]
    flat = t_in.permute(0, 2, 3, 1).reshape(-1, c)
    return torch.nn.CrossEntropyLoss(
        weight=torch.from_numpy(weights), ignore_index=NC)(flat, t_tg.view(-1))


def test_ce_loss_matches_torch():
    logits, target, onehot, weights = _data()
    ours = float(ce_loss(logits, target, weights, NC))
    ref = float(_torch_ce(logits, target, weights))
    assert abs(ours - ref) < 1e-5


def test_focal_loss_matches_torch():
    logits, target, onehot, weights = _data()
    t_in = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    t_tg = torch.from_numpy(target.astype("int64"))
    c = t_in.shape[1]
    flat = t_in.permute(0, 2, 3, 1).reshape(-1, c)
    logpt = -torch.nn.CrossEntropyLoss(
        weight=torch.from_numpy(weights), ignore_index=NC,
        reduction="none")(flat, t_tg.view(-1))
    pt = torch.exp(logpt)
    ref = float((-((1 - pt) ** 2) * (logpt * 0.5)).mean())
    ours = float(focal_loss(logits, target, weights, NC))
    assert abs(ours - ref) < 1e-6


def test_dice_loss_matches_torch():
    logits, target, onehot, weights = _data()
    t_in = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    t_oh = torch.from_numpy(onehot)
    n, c = t_in.shape[0], t_in.shape[1]
    probs = torch.softmax(t_in.permute(0, 2, 3, 1).reshape(n, -1, c), -1)
    tgt = t_oh.view(n, -1, NC + 1)
    tp = torch.sum(tgt[..., :-1] * probs, dim=[0, 1])
    fp = torch.sum(probs, dim=[0, 1]) - tp
    fn = torch.sum(tgt[..., :-1], dim=[0, 1]) - tp
    score = (2 * tp + 1e-5) / (2 * tp + fn + fp + 1e-5)
    ref = float(1 - score.mean())
    ours = float(dice_loss(logits, onehot))
    assert abs(ours - ref) < 1e-6


def test_f_score_matches_torch():
    logits, target, onehot, weights = _data()
    t_in = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    t_oh = torch.from_numpy(onehot)
    n, c = t_in.shape[0], t_in.shape[1]
    probs = torch.softmax(t_in.permute(0, 2, 3, 1).reshape(n, -1, c), -1)
    probs = torch.gt(probs, 0.5).float()
    tgt = t_oh.view(n, -1, NC + 1)
    tp = torch.sum(tgt[..., :-1] * probs, dim=[0, 1])
    fp = torch.sum(probs, dim=[0, 1]) - tp
    fn = torch.sum(tgt[..., :-1], dim=[0, 1]) - tp
    ref = float(((2 * tp + 1e-5) / (2 * tp + fn + fp + 1e-5)).mean())
    ours = float(f_score(logits, onehot))
    assert abs(ours - ref) < 1e-6


def test_loss_resizes_mismatched_logits():
    """Losses must bilinear-resize (align_corners) logits to label size
    (reference: nets/unet_training.py:12-13) — exercised by the lightweight
    model whose raw logits are at half resolution."""
    logits, target, onehot, weights = _data(h=4, w=4)
    big_target = np.zeros((2, 8, 8), "int32")
    val = float(ce_loss(logits, big_target, weights, NC))
    assert np.isfinite(val)


# ---------------------------------------------------------------------------
# LR schedules (reference: nets/unet_training.py:78-108, train.py:393-397)
# ---------------------------------------------------------------------------

def _ref_scheduler(lr_decay_type, lr, min_lr, total):
    import math
    from functools import partial

    def yolox_warm_cos_lr(lr, min_lr, total_iters, warmup_total_iters,
                          warmup_lr_start, no_aug_iter, iters):
        if iters <= warmup_total_iters:
            return (lr - warmup_lr_start) * pow(
                iters / float(warmup_total_iters), 2) + warmup_lr_start
        if iters >= total_iters - no_aug_iter:
            return min_lr
        return min_lr + 0.5 * (lr - min_lr) * (1.0 + math.cos(
            math.pi * (iters - warmup_total_iters)
            / (total_iters - warmup_total_iters - no_aug_iter)))

    def step_lr(lr, decay_rate, step_size, iters):
        return lr * decay_rate ** (iters // step_size)

    if lr_decay_type == "cos":
        w = min(max(0.05 * total, 1), 3)
        ws = max(0.1 * lr, 1e-6)
        na = min(max(0.05 * total, 1), 15)
        return partial(yolox_warm_cos_lr, lr, min_lr, total, w, ws, na)
    decay = (min_lr / lr) ** (1 / 9)
    return partial(step_lr, lr, decay, total / 10)


@pytest.mark.parametrize("kind", ["cos", "step"])
@pytest.mark.parametrize("total", [50, 100, 400])
def test_lr_schedule_parity(kind, total):
    lr, min_lr = 1e-2, 1e-4
    ours = get_lr_scheduler(kind, lr, min_lr, total)
    ref = _ref_scheduler(kind, lr, min_lr, total)
    for e in range(total):
        assert abs(ours(e) - ref(e)) < 1e-12, (kind, total, e)


def test_adaptive_lr():
    # adam: clipped to 1e-4 both sides (train.py:393-395)
    i, m = adaptive_lr(1e-4, 1e-6, 16, "adam")
    assert (i, round(m, 12)) == (1e-4, 1e-6)
    i, m = adaptive_lr(1e-4, 1e-6, 4, "adam")
    assert i == 1e-4  # clipped up to lr_limit_min
    i, m = adaptive_lr(1e-2, 1e-4, 32, "sgd")
    assert i == min(max(2 * 1e-2, 5e-4), 1e-1)
