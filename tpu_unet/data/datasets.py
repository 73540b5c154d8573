"""Dataset readers: VOC / medical / steel-defect.

Parity targets:
- VOCSegDataset      utils/dataloader.py:14-137 (VOC2012/JPEGImages +
                     SegmentationClass; png[png>=nc]=nc; one-hot nc+1)
- MedicalSegDataset  utils/dataloader_medical.py:12-136 (Images/ + Labels/;
                     label binarize: pixel ≤ 127.5 → class 1)
- DefectSegDataset   utils/dataloader_defect.py:12-135 (DataB layout)

TPU-native deviation (same semantics, less host↔device traffic): samples
carry the uint8 image and the int label map; /255 normalization and one-hot
expansion happen on device inside the jitted step instead of in the collate
fn (reference: utils/dataloader.py:40-52, 230-241).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image

from tpu_unet.data import transforms as T


def read_split(path: str):
    """Read a VOC-style split file of image ids (reference: train.py:355-358)."""
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


class _SegDataset:
    """Common read → augment → label-encode path."""

    image_dir: str
    label_dir: str
    image_ext: str = ".jpg"
    heavy: bool = False   # albumentations-equivalent suite instead of VOC aug

    def __init__(self, ids, input_shape, num_classes, train: bool,
                 dataset_path: str, seed: int = 11):
        self.ids = list(ids)
        self.input_shape = tuple(input_shape)
        self.num_classes = num_classes
        self.train = train
        self.dataset_path = dataset_path
        self.seed = seed

    def __len__(self):
        return len(self.ids)

    def _paths(self, name):
        return (os.path.join(self.dataset_path, self.image_dir, name + self.image_ext),
                os.path.join(self.dataset_path, self.label_dir, name + ".png"))

    def _encode_label(self, png: np.ndarray) -> np.ndarray:
        png = png.copy()
        png[png >= self.num_classes] = self.num_classes
        return png.astype(np.int32)

    def __getitem__(self, index: int, epoch: int = 0):
        name = self.ids[index]
        img_path, lbl_path = self._paths(name)
        image = T.cvt_rgb(Image.open(img_path))
        label = Image.open(lbl_path)
        rng = np.random.RandomState(
            (self.seed * 1_000_003 + epoch * 10_007 + index) % (2**31))

        if self.train and not self.heavy:
            img, lbl = T.random_voc_aug(image, label, self.input_shape, rng)
        else:
            im, lb = T.letterbox_pair(image, label, self.input_shape)
            img, lbl = np.array(im, np.uint8), np.array(lb, np.uint8)
            if self.train and self.heavy:
                img, lbl = T.heavy_aug(img, lbl, rng)

        return img, self._encode_label(lbl)


class VOCSegDataset(_SegDataset):
    image_dir = "VOC2012/JPEGImages"
    label_dir = "VOC2012/SegmentationClass"


class VOC2007SegDataset(_SegDataset):
    image_dir = "VOC2007/JPEGImages"
    label_dir = "VOC2007/SegmentationClass"


class DefectSegDataset(_SegDataset):
    """Steel-defect DataB (reference: utils/dataloader_defect.py:32-33)."""
    image_dir = "DataB/JPEGImages"
    label_dir = "DataB/SegmentationClass"


class HeavyAugDataset(VOCSegDataset):
    """UltraLightweightUnetDataset counterpart (utils/dataloader.py:143-226)
    — letterbox + the heavy augmentation suite.  The reference applied the
    transforms in eval too and skipped the image resize (both bugs,
    SURVEY.md §7 'quirks to NOT replicate'); here aug is train-only and both
    image and label are letterboxed."""
    heavy = True


class MedicalSegDataset(_SegDataset):
    """Medical cell dataset (reference: utils/dataloader_medical.py:32-47):
    Images/{id}.png + Labels/{id}.png, label ≤ 127.5 → class 1."""
    image_dir = "Images"
    label_dir = "Labels"
    image_ext = ".png"

    def _encode_label(self, png: np.ndarray) -> np.ndarray:
        out = np.zeros_like(png, dtype=np.int32)
        out[png <= 127.5] = 1
        return out
