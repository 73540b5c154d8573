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


def test_miou_eval_callback_curve_pngs(tmp_path):
    """Per-class IoU curve PNGs (reference: utils/callbacks.py:464-498)."""
    ds = _FakeDataset()

    def predict_zero(img):
        return np.zeros(img.shape[:2], np.int32)

    cb = MIoUEvalCallback(predict_zero, ds, 3, str(tmp_path), period=1,
                          name_classes=["bg", "a", "b"])
    cb.on_epoch_end(0)
    cb.on_epoch_end(1)
    assert os.path.exists(os.path.join(str(tmp_path), "epoch_miou.png"))
    assert os.path.exists(os.path.join(str(tmp_path), "epoch_class_iou.png"))
    assert len(cb.class_ious) == 2 and cb.class_ious[0].shape == (3,)


def test_miou_eval_callback_model_based(tmp_path):
    """The fit()-wired path: model + per-epoch variables, no predict_fn."""
    from tpu_unet.models.registry import build_model, init_model

    ds = _FakeDataset(n=2, nc=4, hw=16)
    model = build_model("ultralight", 4)
    variables = init_model(model, (16, 16))
    cb = MIoUEvalCallback(dataset=ds, num_classes=4, log_dir=str(tmp_path),
                          period=1, model=model)
    miou = cb.on_epoch_end(0, variables)
    assert miou is not None and 0.0 <= miou <= 1.0
    with pytest.raises(ValueError, match="variables"):
        cb.on_epoch_end(1)
    with pytest.raises(ValueError, match="predict_fn or model"):
        MIoUEvalCallback(dataset=ds, num_classes=4, log_dir=str(tmp_path))


def test_miou_eval_callback_batched_matches_per_image(tmp_path):
    """Batched model path (VERDICT r2 next #8): a 30-image set processes in
    ≤2 batches and the accumulated hist (hence mIoU) is identical to a
    per-image predict_fn evaluation of the same model."""
    from tpu_unet.models.registry import build_model, init_model

    ds = _FakeDataset(n=30, nc=4, hw=16)
    model = build_model("ultralight", 4)
    variables = init_model(model, (16, 16))

    cb = MIoUEvalCallback(dataset=ds, num_classes=4,
                          log_dir=str(tmp_path / "b"), period=1,
                          model=model, batch_size=16)
    miou_batched = cb.on_epoch_end(0, variables)
    assert cb.batches_run == 2, cb.batches_run

    import jax
    import jax.numpy as jnp

    def per_image_predict(img):
        logits = model.apply(variables,
                             jnp.asarray(img[None], jnp.float32) / 255.0,
                             False)
        return np.asarray(jnp.argmax(logits, -1))[0]

    cb_ref = MIoUEvalCallback(per_image_predict, ds, 4,
                              str(tmp_path / "p"), period=1)
    miou_ref = cb_ref.on_epoch_end(0)
    assert miou_batched == pytest.approx(miou_ref, abs=1e-12)
    np.testing.assert_array_equal(np.asarray(cb.class_ious[0]),
                                  np.asarray(cb_ref.class_ious[0]))
