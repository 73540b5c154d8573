"""Checkpoint → resume → inference roundtrip through the public surfaces."""
import os

import numpy as np
import pytest
from PIL import Image

MEDICAL = "/root/reference/Medical_Datasets"
pytestmark = pytest.mark.skipif(not os.path.isdir(MEDICAL),
                                reason="medical data absent")


def _tiny_cfg(tmp_path, **over):
    from tpu_unet.configs.presets import get_preset

    return get_preset(
        "medical", model="ultralight", input_shape=(64, 64),
        pretrained_backbone=False, freeze_train=False, freeze_epoch=0,
        unfreeze_epoch=1, freeze_batch_size=8, unfreeze_batch_size=8,
        save_dir=str(tmp_path), save_period=1, eval_flag=False,
        num_workers=2, dataset_path=MEDICAL, **over)


def test_fit_save_resume_and_wrapper_load(tmp_path):
    from tpu_unet.train.fit import fit

    ids = sorted((p.split(".")[0] for p in os.listdir(f"{MEDICAL}/Images")),
                 key=int)
    cfg = _tiny_cfg(tmp_path)
    fit(cfg, ids[:16], [], base_dir="/", max_steps_per_epoch=1,
        verbose=True)
    ckpt = os.path.join(str(tmp_path), "last_epoch_weights.msgpack")
    assert os.path.exists(ckpt)

    # resume: second fit loads the checkpoint (reference: train.py:288-302)
    cfg2 = _tiny_cfg(tmp_path, model_path=ckpt, init_epoch=0)
    fit(cfg2, ids[:16], [], base_dir="/", max_steps_per_epoch=1,
        verbose=False)

    # the saved checkpoint serves through the public inference wrapper
    from tpu_unet.infer.wrapper import Unet

    u = Unet(model="ultralight", num_classes=2, input_shape=[64, 64],
             model_path=ckpt)
    img = Image.open(f"{MEDICAL}/Images/0.png")
    mask = np.asarray(u.get_miou_png(img))
    assert mask.shape[::-1] == img.size
    assert set(np.unique(mask)) <= {0, 1}
