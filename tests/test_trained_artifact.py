"""The committed trained medical model must actually segment: held-out
mIoU ≥ 0.70 through the public wrapper (trained on-TPU by
examples/train_medical.py — living proof the training stack learns)."""
import os

import numpy as np
import pytest
from PIL import Image

MED = "/root/reference/Medical_Datasets"
CKPT = os.path.join(os.path.dirname(__file__), "..", "examples",
                    "medical_ultralight.msgpack")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(MED) and os.path.exists(CKPT)),
    reason="medical data or trained artifact absent")


def test_trained_medical_model_miou():
    from tpu_unet.eval.metrics import confusion_matrix, per_class_iou
    from tpu_unet.infer.wrapper import Unet

    ids = sorted((p.split(".")[0] for p in os.listdir(f"{MED}/Images")),
                 key=int)[24:]
    u = Unet(model="ultralight", num_classes=2, input_shape=[256, 256],
             model_path=CKPT)
    hist = np.zeros((2, 2), np.int64)
    for i in ids:
        pred = np.asarray(u.get_miou_png(Image.open(f"{MED}/Images/{i}.png")))
        gt = (np.asarray(Image.open(f"{MED}/Labels/{i}.png")) <= 127.5
              ).astype(np.int32)
        hist += np.asarray(confusion_matrix(gt, pred, 2))
    ious = per_class_iou(hist)
    assert ious.mean() >= 0.70, ious
