"""The public fast-serving path (paired head + fused final/argmax tail)
must produce the SAME masks as the plain forward — so the throughput
bench.py commits is the throughput `Unet.batch_infer` users get.

Reference anchor: the batch serving pipeline unet.py:298-344 /
predict.py:166-178.  On CPU the Pallas kernels run in interpret mode; the
identity assertion is exact (same dtype, same math, different fusion).
"""
import numpy as np
import pytest

from tpu_unet.core import fusion


@pytest.fixture(autouse=True)
def _reset_switches():
    yield
    fusion.set_fused_decoder(None)
    fusion.set_fused_tail256(None)


def _wrapper(model):
    from tpu_unet.infer.wrapper import Unet

    return Unet(model=model, num_classes=21, input_shape=[64, 64],
                model_path="")


@pytest.mark.parametrize("model", ["unet_vgg", "unet_resnet50"])
def test_fast_serving_masks_match_plain(model):
    imgs = np.random.RandomState(0).randint(
        0, 255, size=(2, 64, 64, 3)).astype(np.uint8)

    fusion.set_fused_decoder(False)
    u = _wrapper(model)
    plain = u.batch_infer(imgs)

    fusion.set_fused_decoder(True)  # forces the paired fast path (interpret)
    u.generate()                    # rebuild serving graphs under the switch
    # same weights: generate() with empty model_path re-inits identically
    fast = u.batch_infer(imgs)

    assert fast.shape == plain.shape == (2, 64, 64)
    mismatch = (fast != plain).mean()
    assert mismatch == 0.0, f"mask mismatch rate {mismatch:.2%}"


def test_serving_step_hist_consistency():
    """serving_step (the bench.py entry) must agree with batch_infer and
    produce a full-coverage histogram."""
    imgs = np.random.RandomState(1).randint(
        0, 255, size=(2, 64, 64, 3)).astype(np.uint8)
    u = _wrapper("unet_vgg")
    fn, variables = u.serving_step()
    masks, hist = fn(variables, imgs)
    masks, hist = np.asarray(masks), np.asarray(hist)
    assert hist.shape == (2, 21)
    assert hist.sum() == 2 * 64 * 64
    np.testing.assert_array_equal(masks.astype(np.int32),
                                  u.batch_infer(imgs))
    # histogram actually counts the mask's classes
    for i in range(2):
        np.testing.assert_array_equal(
            hist[i], np.bincount(masks[i].ravel(), minlength=21))


@pytest.mark.parametrize("model", ["traditional", "ultralight_large_optimized"])
def test_fused_tail256_masks_match_plain(model):
    """The natural-layout fused serving tail (final 1×1 conv + argmax +
    histogram in one Pallas pass) for the 256px competition families must
    reproduce the plain path's masks exactly (reference tail:
    results__exported .py:48-55)."""
    imgs = np.random.RandomState(3).randint(
        0, 255, size=(2, 64, 64, 3)).astype(np.uint8)

    fusion.set_fused_tail256(False)
    u = _wrapper(model)
    plain = u.batch_infer(imgs)

    fusion.set_fused_tail256(True)
    u.generate()  # rebuild serving graphs under the switch (same weights)
    fast = u.batch_infer(imgs)
    fusion.set_fused_tail256(None)

    assert fast.shape == plain.shape == (2, 64, 64)
    mismatch = (fast != plain).mean()
    assert mismatch == 0.0, f"mask mismatch rate {mismatch:.2%}"
