"""Exactness tests for the fused VGG stem (tpu_unet/kernels/stem.py) —
interpret mode on CPU.

Reference semantics: nets/vgg.py:26-31 features[0:4] + the stage-2 pool.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.stem import fused_vgg_stem_impl, reference_vgg_stem

RNG = np.random.RandomState(3)


def _case(B, H, W, F):
    x = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32))
    k11 = jnp.asarray((RNG.randn(3, 3, 3, F) * 0.2).astype(np.float32))
    b11 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k12 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.2).astype(np.float32))
    b12 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    return x, k11, b11, k12, b12


@pytest.mark.parametrize("shape", [(1, 32, 32, 8), (2, 16, 20, 16),
                                   (1, 48, 64, 8)])
def test_stem_matches_reference(shape):
    args = _case(*shape)
    H = shape[1]
    ref_skip, ref_pool = reference_vgg_stem(*args)
    out = jax.jit(fused_vgg_stem_impl)(*args)
    assert out is not None
    skip, pool = out
    # the skip comes back in the decoder's pre-padded layout: 8 lead +
    # 8 tail rows around the data
    assert skip.shape[1] == H + 16
    np.testing.assert_allclose(np.asarray(skip[:, 8:8 + H]),
                               np.asarray(ref_skip), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool),
                               rtol=1e-5, atol=1e-5)


def test_vgg16_fused_stem_flag_equivalence():
    """VGG16(fused_stem=True) == VGG16() feature-for-feature (feat1 in the
    paired layout), with an identical parameter tree."""
    from tpu_unet.core.fusion import set_fused_decoder
    from tpu_unet.models.backbones import VGG16

    x = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32))
    ref = VGG16()
    v = ref.init(jax.random.PRNGKey(0), x)
    fused = VGG16(fused_stem=True)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    feats_ref = ref.apply(v, x)
    try:
        set_fused_decoder(True)  # stem kernel active (interpret on CPU)
        feats_fused = fused.apply(v, x)
    finally:
        set_fused_decoder(None)
    B, H, W, C = feats_ref[0].shape
    np.testing.assert_allclose(
        np.asarray(feats_fused[0][:, 8:8 + H]),
        np.asarray(feats_ref[0].reshape(B, H, W // 2, 2 * C)),
        rtol=1e-5, atol=1e-5)
    for a, b in zip(feats_fused[1:], feats_ref[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_paired_pipeline_with_prepadded_skip():
    """Whole fused serving pipeline on CPU interpret: stem kernel emitting
    the pre-padded skip -> paired decoder stage consuming it -> mask parity
    with the plain XLA path."""
    from tpu_unet.core.fusion import set_fused_decoder
    from tpu_unet.kernels.postprocess import fused_final_argmax_hist_paired
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.models.unet import Unet

    model = build_model("unet_vgg", 21)
    variables = init_model(model, (64, 64))
    pm = Unet(num_classes=21, backbone="vgg", paired_head=True)
    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))

    ref_mask = np.asarray(jnp.argmax(model.apply(variables, x, False), -1))
    try:
        set_fused_decoder(True)
        feats = pm.apply(variables, x, False)
    finally:
        set_fused_decoder(None)
    assert feats.shape == (1, 64, 32, 128)
    masks, _ = fused_final_argmax_hist_paired(
        feats, variables["params"]["final"]["kernel"],
        variables["params"]["final"]["bias"], 21, interpret=True)
    np.testing.assert_array_equal(np.asarray(masks), ref_mask)


def test_stem_uint8_input_scale_matches_reference():
    """Raw-uint8 serving path: the stem converts in-VMEM and folds the
    1/255 normalize into its packed conv1_1 weights (bench.py feeds the
    uint8 batch straight into the model)."""
    from tpu_unet.kernels.stem import fused_vgg_stem_impl

    x8 = jnp.asarray(RNG.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))
    k11 = jnp.asarray((RNG.randn(3, 3, 3, 64) * 0.1).astype(np.float32))
    b11 = jnp.asarray((RNG.randn(64) * 0.1).astype(np.float32))
    k12 = jnp.asarray((RNG.randn(3, 3, 64, 64) * 0.1).astype(np.float32))
    b12 = jnp.asarray((RNG.randn(64) * 0.1).astype(np.float32))

    skip_f, pool_f = fused_vgg_stem_impl(
        x8, k11, b11, k12, b12, prepad_skip=False, input_scale=1 / 255.0)
    xf = x8.astype(jnp.float32) / 255.0
    skip_r, pool_r = reference_vgg_stem(xf, k11, b11, k12, b12)
    np.testing.assert_allclose(np.asarray(skip_f), np.asarray(skip_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool_f), np.asarray(pool_r),
                               rtol=1e-5, atol=1e-5)


def test_unet_uint8_input_scale_end_to_end():
    """Unet(input_scale=1/255) on a raw uint8 batch matches the normalized
    float forward on every backbone path (fused kernels off on CPU: this
    exercises the up-front scaling fallbacks)."""
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.models.unet import Unet

    model = build_model("unet_vgg", 21)
    variables = init_model(model, (64, 64))
    x8 = jnp.asarray(RNG.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8))
    # uint8 inputs normalize in bfloat16 (serving precision) on the
    # non-kernel paths — compare against the same quantization
    xn = x8.astype(jnp.bfloat16) * jnp.asarray(1 / 255.0, jnp.bfloat16)
    ref = model.apply(variables, xn, False)
    m8 = Unet(num_classes=21, backbone="vgg", input_scale=1 / 255.0)
    out = m8.apply(variables, x8, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
