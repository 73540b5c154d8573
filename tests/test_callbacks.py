"""LossHistory + MIoUEvalCallback tests."""
import os

import numpy as np
import pytest
from PIL import Image

from tpu_unet.train.callbacks import LossHistory, MIoUEvalCallback


def test_loss_history_files(tmp_path):
    lh = LossHistory(str(tmp_path))
    for e, (tl, vl) in enumerate([(1.0, 1.2), (0.8, 1.0), (0.7, 0.9)]):
        lh.append(e, tl, vl)
    files = os.listdir(lh.log_dir)
    assert "epoch_loss.txt" in files and "epoch_val_loss.txt" in files
    losses = [float(x) for x in
              open(os.path.join(lh.log_dir, "epoch_loss.txt"))]
    assert losses == [1.0, 0.8, 0.7]


class _FakeDataset:
    def __init__(self, n=4, nc=3, hw=16):
        rng = np.random.RandomState(0)
        self.items = [
            (rng.randint(0, 255, (hw, hw, 3)).astype("uint8"),
             rng.randint(0, nc, (hw, hw)).astype("int32"))
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i, epoch=0):
        return self.items[i]


def test_miou_eval_callback(tmp_path):
    ds = _FakeDataset()

    def perfect_predict(img):
        # cheat: return the GT of the matching sample
        for im, lbl in ds.items:
            if np.array_equal(im, img):
                return lbl
        raise AssertionError

    cb = MIoUEvalCallback(perfect_predict, ds, 3, str(tmp_path), period=2)
    assert cb.on_epoch_end(0) is None          # period 2 → skip epoch 0
    miou = cb.on_epoch_end(1)
    assert miou == pytest.approx(1.0)
    assert os.path.exists(os.path.join(str(tmp_path), "epoch_miou.txt"))
