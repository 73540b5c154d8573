"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_unet.kernels.postprocess import fused_argmax_mask, fused_mask_palette
from tpu_unet.kernels.preprocess import normalize_images


def test_fused_argmax_matches_jnp():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 16, 16, 21).astype("float32")
    ours = np.asarray(fused_argmax_mask(jnp.asarray(logits), interpret=True))
    ref = logits.argmax(-1)
    np.testing.assert_array_equal(ours, ref)


def test_fused_palette_blend():
    rng = np.random.RandomState(1)
    mask = rng.randint(0, 4, size=(1, 16, 16)).astype("int32")
    img = rng.randint(0, 255, size=(1, 16, 16, 3)).astype("uint8")
    colors = [(0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0)]
    out = np.asarray(fused_mask_palette(jnp.asarray(mask), jnp.asarray(img),
                                        colors, alpha=0.7, interpret=True))
    seg = np.asarray(colors, np.uint8)[mask[0]]
    ref = np.round(img[0].astype(np.float64) * 0.3
                   + seg.astype(np.float64) * 0.7)
    assert out.shape == (1, 16, 16, 3)
    assert np.abs(out[0].astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_normalize_images():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, size=(2, 8, 8, 3)).astype("uint8")
    out = np.asarray(normalize_images(jnp.asarray(imgs), interpret=True))
    np.testing.assert_allclose(out, imgs.astype("float32") / 255.0,
                               rtol=1e-6)


def test_fused_final_argmax_matches_reference():
    from tpu_unet.kernels.postprocess import fused_final_argmax

    rng = np.random.RandomState(3)
    feat = rng.randn(2, 8, 8, 64).astype("float32")
    kern = rng.randn(1, 1, 64, 21).astype("float32")
    bias = rng.randn(21).astype("float32")
    ours = np.asarray(fused_final_argmax(
        jnp.asarray(feat), jnp.asarray(kern), jnp.asarray(bias),
        interpret=True))
    ref = (feat @ kern.reshape(64, 21) + bias).argmax(-1)
    np.testing.assert_array_equal(ours, ref)


def test_fused_final_argmax_hist():
    from tpu_unet.kernels.postprocess import fused_final_argmax_hist

    rng = np.random.RandomState(4)
    feat = rng.randn(2, 32, 32, 64).astype("float32")
    kern = rng.randn(1, 1, 64, 21).astype("float32")
    bias = rng.randn(21).astype("float32")
    masks, hist = fused_final_argmax_hist(
        jnp.asarray(feat), jnp.asarray(kern), jnp.asarray(bias), 21,
        interpret=True)
    masks, hist = np.asarray(masks), np.asarray(hist)
    ref = (feat @ kern.reshape(64, 21) + bias).argmax(-1)
    np.testing.assert_array_equal(masks, ref)
    ref_hist = np.stack([(ref[i][..., None] == np.arange(21)).sum((0, 1))
                         for i in range(2)])
    np.testing.assert_array_equal(hist, ref_hist)
    # fallback path (odd sizes)
    m2, h2 = fused_final_argmax_hist(
        jnp.asarray(feat[:, :10, :10]), jnp.asarray(kern),
        jnp.asarray(bias), 21, interpret=True)
    assert np.asarray(m2).shape == (2, 10, 10)
    assert np.asarray(h2).sum() == 200


def test_quantization_roundtrip():
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.tools.quantization import (quantization_report,
                                             quantize_variables,
                                             quantized_apply)

    m = build_model("ultralight", 4)
    v = init_model(m, (32, 32))
    rep = quantization_report(v)
    assert rep["ratio"] < 0.55      # conv weights dominate → near 4x shrink
    bundle = quantize_variables(v)
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype("float32")
    qy = np.asarray(quantized_apply(m, bundle, x))
    fy = np.asarray(m.apply(v, x, False))
    # int8 weights: outputs close but not identical
    assert qy.shape == fy.shape
    assert np.abs(qy - fy).mean() < 0.2


def test_paired_head_and_tail_match_standard_path():
    """paired_head Unet + fused_final_argmax_hist_paired == standard logits
    argmax/histogram (the serving path bench.py drives)."""
    from tpu_unet.kernels.postprocess import fused_final_argmax_hist_paired
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.models.unet import Unet

    model = build_model("unet_vgg", 21)
    variables = init_model(model, (64, 64))
    pm = Unet(num_classes=21, backbone="vgg", paired_head=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype("float32"))

    ref_mask = np.asarray(jnp.argmax(model.apply(variables, x, False), -1))
    feats = pm.apply(variables, x, False)
    assert feats.shape == (2, 64, 32, 128)
    masks, hist = fused_final_argmax_hist_paired(
        feats, variables["params"]["final"]["kernel"],
        variables["params"]["final"]["bias"], 21, interpret=True)
    np.testing.assert_array_equal(np.asarray(masks), ref_mask)
    classes = np.arange(21)
    ref_hist = (ref_mask[..., None] == classes).sum(axis=(1, 2))
    np.testing.assert_array_equal(np.asarray(hist).astype(int), ref_hist)


def test_paired_head_upconv_matches_standard_path():
    """self_net/resnet-style paired head (fused up_conv head emitting
    paired) + fused tail == standard logits argmax (the resnet50 serving
    path bench.py drives)."""
    from tpu_unet.core import fusion
    from tpu_unet.kernels.postprocess import fused_final_argmax_hist_paired
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.models.unet import Unet

    model = build_model("self_net", 21)
    variables = init_model(model, (32, 32))
    pm = Unet(num_classes=21, backbone="vgg", force_up_conv=True,
              paired_head=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3)
                    .astype("float32"))

    fusion.set_fused_decoder(True)
    try:
        ref_mask = np.asarray(
            jnp.argmax(model.apply(variables, x, False), -1))
        feats = pm.apply(variables, x, False)
        assert feats.shape == (1, 64, 32, 128), feats.shape
        masks, hist = fused_final_argmax_hist_paired(
            feats, variables["params"]["final"]["kernel"],
            variables["params"]["final"]["bias"], 21, interpret=True)
    finally:
        fusion.set_fused_decoder(None)
    np.testing.assert_array_equal(np.asarray(masks), ref_mask)
