"""Exactness tests for the fused VGG encoder block (kernels/encoder.py) —
interpret mode on CPU vs the XLA reference composition."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_unet.kernels.encoder import fused_vgg_block_impl, reference_vgg_block


def _case(B, H, W, chans, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, chans[0]).astype(np.float32))
    ks = [jnp.asarray(0.1 * rng.randn(3, 3, ci, co).astype(np.float32))
          for ci, co in zip(chans[:-1], chans[1:])]
    bs = [jnp.asarray(0.1 * rng.randn(co).astype(np.float32))
          for co in chans[1:]]
    return x, ks, bs


@pytest.mark.parametrize("shape,label", [
    # (B, H, W, [C, F1, ...]) — miniature versions of VGG blocks 2-5
    ((1, 16, 128, [64, 128, 128]), "block2-im2col"),
    ((2, 32, 128, [128, 256, 256, 256]), "block3"),
    ((1, 16, 128, [256, 512, 512, 512]), "block4"),
    ((1, 8, 128, [512, 512, 512, 512]), "block5"),
])
def test_fused_block_matches_reference(shape, label):
    B, H, W, chans = shape
    x, ks, bs = _case(B, H, W, chans)
    skip_ref, pool_ref = reference_vgg_block(x, ks, bs, pool=True)
    out = fused_vgg_block_impl(x, ks, bs, pool=True, block_rows=8)
    assert out is not None, "kernel unexpectedly fell back"
    skip, pooled = out
    # chained f32 convs compound accumulation-order differences (matmul
    # split per ky/kx vs XLA's fused conv): up to ~5e-4 absolute at
    # activation magnitude ~70 for the 512-channel 3-conv chain
    np.testing.assert_allclose(np.asarray(skip), np.asarray(skip_ref),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pool_ref),
                               rtol=1e-4, atol=2e-3)


def test_fused_block_no_pool():
    x, ks, bs = _case(1, 8, 128, [512, 512, 512, 512])
    skip_ref, _ = reference_vgg_block(x, ks, bs, pool=False)
    out = fused_vgg_block_impl(x, ks, bs, pool=False, block_rows=8)
    assert out is not None
    skip, pooled = out
    assert pooled is None
    np.testing.assert_allclose(np.asarray(skip), np.asarray(skip_ref),
                               rtol=1e-4, atol=2e-3)


def test_fused_block_fallback_on_bad_shapes():
    # untileable H → clean fallback, not a crash
    x, ks, bs = _case(1, 12, 128, [64, 128, 128])
    assert fused_vgg_block_impl(x, ks, bs) is None
    # non-lane-aligned F likewise
    x, ks, bs = _case(1, 16, 128, [64, 96, 96])
    assert fused_vgg_block_impl(x, ks, bs) is None


def test_fused_block_real_widths():
    """The real 512px block-4/5 widths (W=64/32) must not fall back."""
    x, ks, bs = _case(1, 16, 64, [256, 512, 512, 512])
    out = fused_vgg_block_impl(x, ks, bs, pool=True, block_rows=8)
    assert out is not None
    ref_skip, ref_pool = reference_vgg_block(x, ks, bs, pool=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref_skip),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref_pool),
                               rtol=1e-4, atol=2e-3)


def _to_p8(t, nan_boundary=True):
    """Natural (B, H, ...) → P8 buffer (B, H+16, ...) with poisoned
    boundary blocks (proves consumers mask uninitialized rows)."""
    B, H = t.shape[:2]
    fill = np.nan if nan_boundary else 0.0
    buf = np.full((B, H + 16) + t.shape[2:], fill, np.asarray(t).dtype)
    buf[:, 8:8 + H] = np.asarray(t)
    return jnp.asarray(buf)


def test_fused_block_prepad_chain():
    """P8 chaining: prepad input (uninitialized boundary blocks) +
    prepadded skip/pool outputs match the natural-layout reference."""
    B, H, W, chans = 1, 32, 128, [64, 128, 128]
    x, ks, bs = _case(B, H, W, chans)
    skip_ref, pool_ref = reference_vgg_block(x, ks, bs, pool=True)

    out = fused_vgg_block_impl(_to_p8(x), ks, bs, pool=True,
                               prepad_in=True, prepad_skip=True,
                               prepad_pool=True)
    assert out is not None, "prepad chain unexpectedly fell back"
    skip_p8, pool_p8 = out
    assert skip_p8.shape == (B, H + 16, W, chans[-1])
    assert pool_p8.shape == (B, H // 2 + 16, W // 2, chans[-1])
    np.testing.assert_allclose(np.asarray(skip_p8[:, 8:8 + H]),
                               np.asarray(skip_ref), rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pool_p8[:, 8:8 + H // 2]),
                               np.asarray(pool_ref), rtol=1e-4, atol=2e-3)


def test_fused_block_prepad_in_only_3conv():
    B, H, W, chans = 1, 16, 64, [128, 256, 256, 256]
    x, ks, bs = _case(B, H, W, chans)
    skip_ref, pool_ref = reference_vgg_block(x, ks, bs, pool=True)
    out = fused_vgg_block_impl(_to_p8(x), ks, bs, pool=True,
                               prepad_in=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(skip_ref),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(pool_ref),
                               rtol=1e-4, atol=2e-3)
