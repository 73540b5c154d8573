"""Exactness tests for the fused Pallas decoder stage
(tpu_unet/kernels/decoder_fuse.py) — interpret mode on CPU.

Reference semantics: nets/unet.py:16-22 (unetUp: ×2 align-corners bilinear
upsample, concat [skip, up], two 3×3 conv+ReLU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.decoder_fuse import (
    _fused_unetup_fwd_impl, fused_unetup, reference_unetup)

RNG = np.random.RandomState(7)


def _case(B, H, W, Cs, Cx, F):
    skip = jnp.asarray(RNG.randn(B, 2 * H, 2 * W, Cs).astype(np.float32))
    x = jnp.asarray(RNG.randn(B, H, W, Cx).astype(np.float32))
    k1 = jnp.asarray((RNG.randn(3, 3, Cs + Cx, F) * 0.1).astype(np.float32))
    b1 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k2 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.1).astype(np.float32))
    b2 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    return skip, x, k1, b1, k2, b2


@pytest.mark.parametrize("shape,mode", [
    ((2, 16, 16, 8, 16, 8), "paired"),
    ((1, 8, 8, 8, 8, 16), "paired"),
    ((2, 32, 16, 16, 8, 64), "paired"),
    ((1, 8, 8, 8, 16, 128), "unpaired"),
    ((1, 16, 8, 16, 32, 256), "unpaired"),
    # Cx % 128 == 0 → the in-kernel MXU H-lerp path
    ((1, 8, 8, 8, 128, 8), "paired-mxu"),
    ((1, 8, 8, 8, 128, 128), "unpaired-mxu"),
])
def test_fused_matches_reference(shape, mode):
    args = _case(*shape)
    ref = reference_unetup(*args)
    out = _fused_unetup_fwd_impl(*args)
    assert out is not None, "kernel unexpectedly fell back"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference_grads():
    args = _case(1, 8, 8, 8, 8, 8)

    def loss_f(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g_ref = jax.grad(loss_f(reference_unetup), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_fus = jax.grad(loss_f(fused_unetup), argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_unetup_module_fused_flag_equivalence():
    """UnetUp through the module API: fused on == fused off (and the param
    tree keeps the nn.Conv-compatible conv1/conv2 kernel+bias names)."""
    import flax.linen as nn

    from tpu_unet.core.fusion import set_fused_decoder
    from tpu_unet.nn.blocks import UnetUp

    mod = UnetUp(16)
    skip = jnp.asarray(RNG.randn(1, 16, 16, 8).astype(np.float32))
    x = jnp.asarray(RNG.randn(1, 8, 8, 12).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), skip, x)
    params = variables["params"]
    assert set(params) == {"conv1", "conv2"}
    assert params["conv1"]["kernel"].shape == (3, 3, 20, 16)
    assert params["conv1"]["bias"].shape == (16,)

    try:
        set_fused_decoder(False)
        y_ref = mod.apply(variables, skip, x)
        set_fused_decoder(True)
        y_fused = mod.apply(variables, skip, x)
    finally:
        set_fused_decoder(None)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_train_vjp_matches_reference_grads():
    """fused_unetup_train (kernel-saved residuals, manual conv-transpose
    backward) matches reference autodiff grads — both kernel modes."""
    from tpu_unet.kernels.decoder_fuse import fused_unetup_train

    for shape in [(2, 16, 16, 8, 16, 8), (1, 8, 8, 8, 16, 128)]:
        args = _case(*shape)

        def loss_f(fn):
            return lambda *a: jnp.mean(fn(*a) ** 2)

        g_ref = jax.grad(loss_f(reference_unetup),
                         argnums=tuple(range(6)))(*args)
        g_tr = jax.grad(loss_f(fused_unetup_train),
                        argnums=tuple(range(6)))(*args)
        for a, b in zip(g_ref, g_tr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape", [
    (1, 8, 8, 128, 128, 128),   # wide plane-paired path (F >= 128)
    (2, 8, 8, 128, 256, 128),   # stage-2-like channel ratios
])
def test_wide_plane_paired_matches_reference(shape):
    """The F >= 128 plane-paired kernel (_wide_kernel) must match the XLA
    reference exactly — dense + separate full-lane edge matmuls, skip
    pair fold, natural output interleave."""
    B, H, W, Cs, Cx, F = shape
    skip = jnp.asarray(RNG.randn(B, 2 * H, 2 * W, Cs).astype(np.float32))
    x = jnp.asarray(RNG.randn(B, H, W, Cx).astype(np.float32))
    k1 = jnp.asarray((RNG.randn(3, 3, Cs + Cx, F) * 0.05).astype(np.float32))
    b1 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k2 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.05).astype(np.float32))
    b2 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2)
    assert out is not None
    ref = reference_unetup(skip, x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [
    (1, 8, 8, 128, 256, 128),   # stage-2-like channel ratios
    (1, 16, 4, 256, 512, 256),  # stage-3-like
    (2, 8, 6, 128, 128, 128),   # odd W exercises the column edges
])
def test_wide_lowres_up_matches_reference(shape):
    """The low-res up-half decomposition (_wide_kernel_lowres) must match
    the XLA reference exactly: the per-row/per-column lerp scalars
    commute with the channel contraction, so the reassociated math is
    the same function."""
    from tpu_unet.core import fusion

    B, H, W, Cs, Cx, F = shape
    skip = jnp.asarray(RNG.randn(B, 2 * H, 2 * W, Cs).astype(np.float32))
    x = jnp.asarray(RNG.randn(B, H, W, Cx).astype(np.float32))
    k1 = jnp.asarray((RNG.randn(3, 3, Cs + Cx, F) * 0.05).astype(np.float32))
    b1 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k2 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.05).astype(np.float32))
    b2 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    fusion.set_lowres_up(True)
    try:
        out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2)
    finally:
        fusion.set_lowres_up(None)
    assert out is not None
    ref = reference_unetup(skip, x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [
    (1, 8, 8, 64, 128, 64),     # up1-like (paired path, F < 128)
    (2, 8, 6, 64, 128, 64),
])
def test_paired_lowres_up_matches_reference(shape):
    """The paired low-res variant (_paired_kernel_lowres, duplicated
    [kx|kx] weight blocks + lane-blocked coefficients) must match the
    XLA reference exactly."""
    from tpu_unet.core import fusion

    B, H, W, Cs, Cx, F = shape
    skip = jnp.asarray(RNG.randn(B, 2 * H, 2 * W, Cs).astype(np.float32))
    x = jnp.asarray(RNG.randn(B, H, W, Cx).astype(np.float32))
    k1 = jnp.asarray((RNG.randn(3, 3, Cs + Cx, F) * 0.05).astype(np.float32))
    b1 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k2 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.05).astype(np.float32))
    b2 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    fusion.set_lowres_up(True)
    try:
        out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2)
    finally:
        fusion.set_lowres_up(None)
    assert out is not None
    ref = reference_unetup(skip, x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
