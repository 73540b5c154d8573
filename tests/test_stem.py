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
    ref_skip, ref_pool = reference_vgg_stem(*args)
    out = jax.jit(fused_vgg_stem_impl)(*args)
    assert out is not None
    skip, pool = out
    np.testing.assert_allclose(np.asarray(skip), np.asarray(ref_skip),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool),
                               rtol=1e-5, atol=1e-5)


def test_vgg16_fused_stem_flag_equivalence():
    """VGG16(fused_stem=True) == VGG16() feature-for-feature (feat1 in the
    paired layout), with an identical parameter tree."""
    from tpu_unet.models.backbones import VGG16

    x = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32))
    ref = VGG16()
    v = ref.init(jax.random.PRNGKey(0), x)
    fused = VGG16(fused_stem=True)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    feats_ref = ref.apply(v, x)
    feats_fused = fused.apply(v, x)
    B, H, W, C = feats_ref[0].shape
    np.testing.assert_allclose(
        np.asarray(feats_fused[0]),
        np.asarray(feats_ref[0].reshape(B, H, W // 2, 2 * C)),
        rtol=1e-5, atol=1e-5)
    for a, b in zip(feats_fused[1:], feats_ref[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
