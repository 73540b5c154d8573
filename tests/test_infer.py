"""Inference wrapper tests: the reference `_defaults` public API surface,
driven against bundled reference artifacts when present."""
import os

import numpy as np
import pytest
from PIL import Image

from tpu_unet.infer.wrapper import Unet

CKPT = ("/root/reference/model_data/result_model/"
        "best_UltraLightweightUnet large optimized_newest.pth")
IMG_DIR = "/root/reference/img"

has_ref = os.path.exists(CKPT) and os.path.isdir(IMG_DIR)


def test_defaults_api_surface():
    for key in ("model_path", "num_classes", "backbone", "input_shape",
                "mix_type", "cuda"):
        assert key in Unet._defaults
    assert Unet.get_defaults("num_classes") == Unet._defaults["num_classes"]
    assert "Unrecognized" in Unet.get_defaults("bogus")


@pytest.mark.skipif(not has_ref, reason="bundled reference artifacts absent")
def test_detect_image_modes_and_miou_png():
    u = Unet(model_path=CKPT, model="ultralight_large_optimized",
             num_classes=4, input_shape=[64, 64])
    img = Image.open(os.path.join(IMG_DIR, "In_1.jpg"))
    for mix in (0, 1, 2):
        u.mix_type = mix
        out = u.detect_image(img)
        assert out.size == img.size
        assert out.mode == "RGB"
    png = u.get_miou_png(img)
    assert png.size == img.size
    assert png.mode == "L"
    assert set(np.unique(np.asarray(png))) <= {0, 1, 2, 3}
    # count table path
    u.mix_type = 0
    u.detect_image(img, count=True, name_classes=["bg", "In", "Pa", "Sc"])


@pytest.mark.skipif(not has_ref, reason="bundled reference artifacts absent")
def test_get_fps_and_batch_infer():
    u = Unet(model_path=CKPT, model="ultralight_large_optimized",
             num_classes=4, input_shape=[64, 64])
    img = Image.open(os.path.join(IMG_DIR, "In_1.jpg"))
    tact = u.get_FPS(img, test_interval=3)
    assert tact > 0
    batch = np.random.RandomState(0).randint(
        0, 255, size=(4, 64, 64, 3)).astype("uint8")
    masks = u.batch_infer(batch)
    assert masks.shape == (4, 64, 64)


def test_wrapper_without_checkpoint():
    u = Unet(model="traditional", num_classes=4, input_shape=[32, 32],
             model_path="")
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (40, 50, 3)).astype("uint8"))
    out = u.detect_image(img)
    assert out.size == img.size


def test_wrapper_checkpoint_mismatch_message(tmp_path):
    if not has_ref:
        pytest.skip("no bundled ckpt")
    with pytest.raises(ValueError, match="does not match model"):
        Unet(model_path=CKPT, model="traditional", num_classes=4,
             input_shape=[32, 32])


def test_stablehlo_export_roundtrip(tmp_path):
    u = Unet(model="ultralight", num_classes=4, input_shape=[32, 32],
             model_path="")
    path = str(tmp_path / "model.stablehlo")
    u.convert_to_export(path)
    from tpu_unet.tools.export import load_stablehlo

    fn = load_stablehlo(path)
    x = np.zeros((1, 32, 32, 3), np.float32)
    probs = np.asarray(fn(x))
    assert probs.shape == (1, 32, 32, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


@pytest.mark.skipif(not has_ref, reason="bundled reference artifacts absent")
def test_device_mask_path_matches_host_path():
    """The device-side crop+argmax single-image path (uint8 mask D2H)
    must produce EXACTLY the host path's mask at input resolution —
    per-pixel argmax commutes with softmax, so this is an identity, not
    an approximation (reference protocol: unet.py:205-258)."""
    u = Unet(model_path=CKPT, model="ultralight_large_optimized",
             num_classes=4, input_shape=[64, 64])
    img = Image.open(os.path.join(IMG_DIR, "In_1.jpg"))

    dev_mask, _ = u._device_mask_for(img)
    pr, _ = u._probs_for(img)           # host path: cropped prob map
    host_mask = pr.argmax(axis=-1)
    assert dev_mask.dtype == np.uint8
    np.testing.assert_array_equal(dev_mask.astype(np.int64), host_mask)

    # fast rendering flags drive end-to-end
    out = u.detect_image(img, fast=True)
    assert out.size == img.size and out.mode == "RGB"
    png = u.get_miou_png(img, fast=True)
    assert png.size == img.size and png.mode == "L"

    # both get_FPS protocols run
    assert u.get_FPS(img, 2) > 0
    assert u.get_FPS(img, 2, full_d2h=True) > 0
