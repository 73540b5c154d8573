"""Exactness tests for the fused Pallas loss (tpu_unet/kernels/loss.py) —
interpret mode on CPU, against the jnp reference implementations that are
themselves golden-tested vs torch (tests/test_losses.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.loss import ce_dice_loss_grad
from tpu_unet.train.losses import ce_loss, dice_loss, f_score

RNG = np.random.RandomState(11)


def _case(n, h, w, c, uniform_w=False):
    logits = jnp.asarray(RNG.randn(n, h, w, c).astype(np.float32))
    # include ignored pixels (value == c)
    target = jnp.asarray(RNG.randint(0, c + 1, (n, h, w)).astype(np.int32))
    cw = tuple([1.0] * c if uniform_w
               else (1.0 + 0.1 * np.arange(c)).tolist())
    onehot = jax.nn.one_hot(target, c + 1, dtype=jnp.float32)
    return logits, target, cw, onehot


@pytest.mark.parametrize("shape,with_dice", [
    ((2, 32, 32, 21), True),
    ((1, 16, 24, 4), True),
    ((2, 32, 32, 21), False),
])
def test_fused_loss_matches_reference(shape, with_dice):
    n, h, w, c = shape
    logits, target, cw, onehot = _case(n, h, w, c)
    ref = ce_loss(logits, target, cw, c)
    if with_dice:
        ref = ref + dice_loss(logits, onehot)
    ref_fs = f_score(logits, onehot)
    loss, fs = ce_dice_loss_grad(logits, target, cw, c,
                                 with_dice=with_dice, interpret=True)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    np.testing.assert_allclose(float(fs), float(ref_fs), rtol=1e-5)


def test_fused_loss_grad_matches_autodiff():
    logits, target, cw, onehot = _case(2, 32, 32, 21)

    def l_ref(lg):
        return ce_loss(lg, target, cw, 21) + dice_loss(lg, onehot)

    def l_fus(lg):
        return ce_dice_loss_grad(lg, target, cw, 21, interpret=True)[0]

    g_ref = jax.grad(l_ref)(logits)
    g_fus = jax.grad(l_fus)(logits)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-9)


def test_fused_loss_bf16_logits():
    logits, target, cw, onehot = _case(1, 32, 32, 21, uniform_w=True)
    lb = logits.astype(jnp.bfloat16)
    loss, fs = ce_dice_loss_grad(lb, target, cw, 21, interpret=True)
    ref = ce_loss(logits, target, cw, 21) + dice_loss(logits, onehot)
    assert abs(float(loss) - float(ref)) < 0.02
    g = jax.grad(lambda x: ce_dice_loss_grad(
        x, target, cw, 21, interpret=True)[0])(lb)
    assert g.dtype == jnp.bfloat16 and bool(jnp.all(jnp.isfinite(
        g.astype(jnp.float32))))


def test_fused_focal_dice_matches_jnp():
    """Focal mode: loss and gradient must match focal_loss + dice_loss
    from train/losses.py (the competition recipe)."""
    from tpu_unet.kernels.loss import ce_dice_loss_grad
    from tpu_unet.train.losses import dice_loss, focal_loss

    rng = np.random.RandomState(9)
    n, h, w, c = 2, 16, 16, 4
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32) * 2)
    target = jnp.asarray(rng.randint(0, c + 1, (n, h, w)).astype(np.int32))
    onehot = jax.nn.one_hot(target, c + 1, dtype=jnp.float32)
    cw = (1.0, 1.3, 0.7, 1.1)

    def ref(lg):
        return (focal_loss(lg, target, cw, c)
                + dice_loss(lg, onehot))

    def fus(lg):
        return ce_dice_loss_grad(lg, target, cw, c, with_dice=True,
                                 interpret=True, use_focal=True)[0]

    l_ref, g_ref = jax.value_and_grad(ref)(logits)
    l_fus, g_fus = jax.value_and_grad(fus)(logits)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-6)


def test_fused_focal_only_matches_jnp():
    from tpu_unet.kernels.loss import ce_dice_loss_grad
    from tpu_unet.train.losses import focal_loss

    rng = np.random.RandomState(10)
    n, h, w, c = 1, 16, 16, 21
    logits = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    target = jnp.asarray(rng.randint(0, c + 1, (n, h, w)).astype(np.int32))
    cw = tuple([1.0] * c)

    l_ref, g_ref = jax.value_and_grad(
        lambda lg: focal_loss(lg, target, cw, c))(logits)
    l_fus, g_fus = jax.value_and_grad(
        lambda lg: ce_dice_loss_grad(lg, target, cw, c, with_dice=False,
                                     interpret=True, use_focal=True)[0]
    )(logits)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-6)
