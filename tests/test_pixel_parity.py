"""Pixel-identical mask parity on the BUNDLED reference weights + images —
the BASELINE.json acceptance criterion, as a committed test.

Two real checkpoints ship with the reference:
- model_data/result_model/*.pth → UltraLightweightUnet_large_optimized
  (the competition submission model)
- Projects/dataB/best_epoch_weights_.pth → OptimizedBalancedSegWithFPN
"""
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

REF = "/root/reference"
CKPT_ULTRA = os.path.join(
    REF, "model_data/result_model",
    "best_UltraLightweightUnet large optimized_newest.pth")
CKPT_FPN = os.path.join(REF, "Projects/dataB/best_epoch_weights_.pth")
IMAGES = ["In_1.jpg", "Pa_1.jpg", "Sc_1.jpg", "In_100.jpg"]

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT_ULTRA),
                                reason="bundled reference weights absent")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))


def _inputs():
    from tpu_unet.data.transforms import cvt_rgb, letterbox_pair

    for name in IMAGES:
        p = os.path.join(REF, "img", name)
        if not os.path.exists(p):
            continue
        image = cvt_rgb(Image.open(p))
        boxed, _ = letterbox_pair(image, Image.new("L", image.size),
                                  (256, 256))
        yield name, np.asarray(boxed, np.float32)[None] / 255.0


def _agreement(flax_name, ckpt, torch_model):
    from tpu_unet.infer.convert import convert_pth
    from tpu_unet.models.registry import build_model

    variables = convert_pth(ckpt, flax_name)
    model = build_model(flax_name, 4)
    torch_model.load_state_dict(
        torch.load(ckpt, map_location="cpu", weights_only=True))
    torch_model.eval()
    worst = 1.0
    for name, x in _inputs():
        ours = np.asarray(model.apply(variables, x, False)).argmax(-1)[0]
        with torch.no_grad():
            ty = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        if isinstance(ty, tuple):
            ty = ty[0]
        theirs = ty.numpy().transpose(0, 2, 3, 1).argmax(-1)[0]
        worst = min(worst, float((ours == theirs).mean()))
    return worst


def test_competition_model_pixel_identical():
    from nets.UltraLightweightUnet_large_optimized import (
        UltraLightweightUnet_large_optimized as TU)

    assert _agreement("ultralight_large_optimized", CKPT_ULTRA,
                      TU(num_classes=4)) == 1.0


@pytest.mark.skipif(not os.path.exists(CKPT_FPN), reason="dataB ckpt absent")
def test_datab_fpn_model_pixel_identical():
    from nets.SegNets import OptimizedBalancedSegWithFPN as TU

    assert _agreement("balancedseg_fpn", CKPT_FPN, TU(num_classes=4)) == 1.0


def test_submit_result_model_pixel_identical():
    ckpt = os.path.join(REF, "Submit_result/model.pth")
    if not os.path.exists(ckpt):
        pytest.skip("Submit_result/model.pth absent")
    from nets.UltraLightweightUnet_large_optimized import (
        UltraLightweightUnet_large_optimized as TU)

    assert _agreement("ultralight_large_optimized", ckpt,
                      TU(num_classes=4)) == 1.0
