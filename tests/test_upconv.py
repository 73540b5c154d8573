"""Exactness + grad tests for the fused up_conv head (kernels/upconv.py),
interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.upconv import (fused_upconv, fused_upconv_train,
                                     reference_upconv)

RNG = np.random.RandomState(5)


def _case(B, H, W, Cx, F):
    x = jnp.asarray(RNG.randn(B, H, W, Cx).astype(np.float32))
    k1 = jnp.asarray((RNG.randn(3, 3, Cx, F) * 0.1).astype(np.float32))
    b1 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k2 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.1).astype(np.float32))
    b2 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    return x, k1, b1, k2, b2


@pytest.mark.parametrize("shape", [(1, 8, 8, 16, 8), (2, 8, 16, 8, 16)])
def test_upconv_forward_matches_reference(shape):
    args = _case(*shape)
    out = fused_upconv(*args)
    ref = reference_upconv(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [(1, 8, 8, 16, 8), (2, 8, 16, 8, 16)])
def test_upconv_train_vjp_matches_autodiff(shape):
    args = _case(*shape)

    def loss_ref(*a):
        return jnp.sum(reference_upconv(*a) ** 2)

    def loss_fus(*a):
        return jnp.sum(fused_upconv_train(*a) ** 2)  # pair reshape sum-inv

    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    g_fus = jax.grad(loss_fus, argnums=tuple(range(5)))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=f"grad argnum {i}")


def test_upconv_paired_train_head_end_to_end():
    """self_net (vgg + forced up_conv head): with the fused switches on,
    the head emits the PAIRED feature map; loss + param grads through the
    fused final-conv loss must match the natural XLA composition."""
    from tpu_unet.core import fusion
    from tpu_unet.kernels.loss import final_ce_dice_loss_grad
    from tpu_unet.models.unet import Unet
    from tpu_unet.train.losses import ce_loss, dice_loss

    model = Unet(num_classes=4, backbone="vgg", force_up_conv=True)
    feat_model = model.clone(features_out=True)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(RNG.rand(1, 16, 16, 3).astype(np.float32))
    target = jnp.asarray(RNG.randint(0, 4, (1, 32, 32)).astype(np.int32))
    onehot = jax.nn.one_hot(target, 5, dtype=jnp.float32)
    cw = (1.0, 1.0, 1.0, 1.0)
    variables = model.init(key, x, False)
    params = variables["params"]

    def loss_nat(p):
        out = model.apply({"params": p}, x, True, rngs={"dropout": key})
        return ce_loss(out, target, cw, 4) + dice_loss(out, onehot)

    def loss_paired(p):
        feats = feat_model.apply({"params": p}, x, True,
                                 rngs={"dropout": key})
        assert feats.shape == (1, 32, 16, 128), feats.shape
        loss, _ = final_ce_dice_loss_grad(
            feats, p["final"]["kernel"], p["final"]["bias"], target, cw, 4,
            with_dice=True, interpret=True)
        return loss

    fusion.set_fused_decoder(False)
    fusion.set_paired_train(False)
    try:
        l_ref, g_ref = jax.value_and_grad(loss_nat)(params)
        fusion.set_fused_decoder(True)
        fusion.set_paired_train(True)
        l_fus, g_fus = jax.value_and_grad(loss_paired)(params)
    finally:
        fusion.set_fused_decoder(None)
        fusion.set_paired_train(None)

    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=2e-5)
    for path in (("up_conv_1", "kernel"), ("up_conv_3", "bias"),
                 ("up_concat1", "conv1", "kernel"), ("final", "kernel")):
        a, b = g_ref, g_fus
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4,
            err_msg="/".join(path))
