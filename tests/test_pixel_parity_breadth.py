"""Pixel-parity breadth (VERDICT r1 Missing #6): 512px cases, ≥20 images,
detect_image render-byte parity vs the reference's own wrapper code, and
the medical path via the converter inverse (flax→torch roundtrip).

The oracle for render bytes is the reference's bundled
UltraLightweightUnet_large_optimized_config.py Unet class running the same
checkpoint on CPU — its detect_image (mix_type 0/1/2) byte-for-byte.
"""
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

REF = "/root/reference"
CKPT = os.path.join(REF, "model_data/result_model",
                    "best_UltraLightweightUnet large optimized_newest.pth")
pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="bundled reference weights absent")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

# 21 probe crops spanning all three defect classes
IMAGES = ([f"In_{i}.jpg" for i in (1, 10, 100, 101, 102, 103, 104)]
          + [f"Pa_{i}.jpg" for i in (1, 10, 100, 101, 102, 103, 104)]
          + [f"Sc_{i}.jpg" for i in (1, 10, 100, 101, 102, 103, 104)])


def _model_pair(size):
    from tpu_unet.infer.convert import convert_pth
    from tpu_unet.models.registry import build_model

    from nets.UltraLightweightUnet_large_optimized import (
        UltraLightweightUnet_large_optimized as TU)

    variables = convert_pth(CKPT, "ultralight_large_optimized")
    model = build_model("ultralight_large_optimized", 4)
    tm = TU(num_classes=4)
    tm.load_state_dict(torch.load(CKPT, map_location="cpu",
                                  weights_only=True))
    tm.eval()
    return model, variables, tm


def _mask_agreement(model, variables, tm, size, names):
    from tpu_unet.data.transforms import cvt_rgb, letterbox_pair

    worst, n = 1.0, 0
    for name in names:
        p = os.path.join(REF, "img", name)
        if not os.path.exists(p):
            continue
        image = cvt_rgb(Image.open(p))
        boxed, _ = letterbox_pair(image, Image.new("L", image.size),
                                  (size, size))
        x = np.asarray(boxed, np.float32)[None] / 255.0
        ours = np.asarray(model.apply(variables, x, False)).argmax(-1)[0]
        with torch.no_grad():
            theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))
                        ).numpy().transpose(0, 2, 3, 1).argmax(-1)[0]
        worst = min(worst, float((ours == theirs).mean()))
        n += 1
    return worst, n


def test_512px_pixel_identical():
    """No 512px case existed in round 1 — the BASELINE.md headline shape."""
    model, variables, tm = _model_pair(512)
    worst, n = _mask_agreement(model, variables, tm, 512, IMAGES[:6])
    assert n >= 6
    assert worst == 1.0


def test_breadth_21_images_256px():
    model, variables, tm = _model_pair(256)
    worst, n = _mask_agreement(model, variables, tm, 256, IMAGES)
    assert n >= 20
    assert worst == 1.0


@pytest.mark.parametrize("mix_type", [0, 1, 2])
def test_detect_image_render_bytes(mix_type):
    """Byte parity of the full detect_image render (palette+blend /
    palette / background-removal) vs the reference's own wrapper
    (UltraLightweightUnet_large_optimized_config.py, unet.py:101-203)."""
    import importlib

    ref_mod = importlib.import_module(
        "UltraLightweightUnet_large_optimized_config")
    ref_u = ref_mod.Unet(model_path=CKPT, num_classes=4,
                         input_shape=[256, 256], mix_type=mix_type,
                         cuda=False)

    from tpu_unet.infer.wrapper import Unet

    ours_u = Unet(model="ultralight_large_optimized", model_path=CKPT,
                  num_classes=4, input_shape=[256, 256], mix_type=mix_type)

    for name in ("In_1.jpg", "Pa_1.jpg", "Sc_1.jpg"):
        img = Image.open(os.path.join(REF, "img", name))
        theirs = np.asarray(ref_u.detect_image(img.copy()))
        ours = np.asarray(ours_u.detect_image(img.copy()))
        assert theirs.shape == ours.shape
        agree = float((theirs == ours).mean())
        assert agree == 1.0, f"{name} mix{mix_type}: byte agreement {agree}"


def test_medical_selftrained_roundtrip():
    """Medical-path parity via the converter INVERSE: the self-trained
    flax checkpoint is exported to a torch state_dict, loaded into the
    reference UltraLightweightUnet, and must produce identical masks on
    the bundled medical images."""
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "medical_ultralight.msgpack")
    med = os.path.join(REF, "Medical_Datasets", "Images")
    if not (os.path.exists(art) and os.path.isdir(med)):
        pytest.skip("artifact or medical data absent")

    from nets.UltraLightweightUnet import UltraLightweightUnet as TU

    from tpu_unet.data.transforms import cvt_rgb, letterbox_pair
    from tpu_unet.infer.convert import export_state_dict
    from tpu_unet.models.registry import build_model
    from tpu_unet.train.checkpoint import load_variables

    variables = load_variables(art)
    tm = TU(num_classes=2)
    template = {k: v.numpy() for k, v in tm.state_dict().items()}
    sd = export_state_dict(variables, "ultralight", template)
    tm.load_state_dict({k: (torch.from_numpy(np.ascontiguousarray(v))
                            if np.ndim(v) else torch.tensor(int(v)))
                        for k, v in sd.items()}, strict=True)
    tm.eval()
    model = build_model("ultralight", 2)

    names = sorted(os.listdir(med))[:5]
    for name in names:
        image = cvt_rgb(Image.open(os.path.join(med, name)))
        boxed, _ = letterbox_pair(image, Image.new("L", image.size),
                                  (256, 256))
        x = np.asarray(boxed, np.float32)[None] / 255.0
        ours = np.asarray(model.apply(variables, x, False)).argmax(-1)[0]
        with torch.no_grad():
            theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))
                        ).numpy().transpose(0, 2, 3, 1).argmax(-1)[0]
        assert (ours == theirs).mean() == 1.0, name
    assert len(names) >= 5


def test_export_pth_file_roundtrip(tmp_path):
    """export_pth output re-ingests through convert_pth bit-exactly."""
    from nets.UltraLightweightUnet_large_optimized import (
        UltraLightweightUnet_large_optimized as TU)

    from tpu_unet.infer.convert import convert_pth, export_pth

    variables = convert_pth(CKPT, "ultralight_large_optimized")
    template = {k: v.numpy() for k, v in TU(num_classes=4).state_dict().items()}
    out = tmp_path / "roundtrip.pth"
    export_pth(variables, "ultralight_large_optimized", template, str(out))
    again = convert_pth(str(out), "ultralight_large_optimized")

    flat1 = jax_flat(variables)
    flat2 = jax_flat(again)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(np.asarray(flat1[k]),
                                      np.asarray(flat2[k]), err_msg=k)


def jax_flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(jax_flat(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = v
    return out
