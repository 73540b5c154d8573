"""Exactness tests for the fused final-conv + loss kernel
(tpu_unet/kernels/loss.py::final_ce_dice_loss_grad) — interpret mode on
CPU, against the conv1x1 → jnp-loss composition (itself golden-tested vs
torch in tests/test_losses.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.loss import final_ce_dice_loss_grad
from tpu_unet.train.losses import ce_loss, dice_loss, f_score

RNG = np.random.RandomState(7)


def _case(n, h, w, cf, c):
    feats = jnp.asarray(RNG.randn(n, h, w, cf).astype(np.float32))
    kernel = jnp.asarray((RNG.randn(1, 1, cf, c) * 0.1).astype(np.float32))
    bias = jnp.asarray((RNG.randn(c) * 0.1).astype(np.float32))
    target = jnp.asarray(RNG.randint(0, c + 1, (n, h, w)).astype(np.int32))
    cw = tuple((1.0 + 0.1 * np.arange(c)).tolist())
    onehot = jax.nn.one_hot(target, c + 1, dtype=jnp.float32)
    return feats, kernel, bias, target, cw, onehot


def _conv1x1(feats, kernel, bias):
    return jnp.einsum("nhwi,io->nhwo", feats,
                      kernel.reshape(kernel.shape[-2], -1)) + bias


@pytest.mark.parametrize("shape,with_dice", [
    ((2, 16, 16, 64, 21), True),
    ((1, 8, 16, 16, 4), True),
    ((2, 16, 16, 64, 21), False),
])
def test_final_loss_matches_composition(shape, with_dice):
    n, h, w, cf, c = shape
    feats, kernel, bias, target, cw, onehot = _case(n, h, w, cf, c)
    logits = _conv1x1(feats, kernel, bias)
    ref = ce_loss(logits, target, cw, c)
    if with_dice:
        ref = ref + dice_loss(logits, onehot)
    ref_fs = f_score(logits, onehot)
    loss, fs = final_ce_dice_loss_grad(feats, kernel, bias, target, cw, c,
                                       with_dice=with_dice, interpret=True)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    np.testing.assert_allclose(float(fs), float(ref_fs), rtol=1e-5)


def test_final_loss_grads_match_autodiff():
    feats, kernel, bias, target, cw, onehot = _case(2, 16, 16, 64, 21)

    def l_ref(f, k, b):
        lg = _conv1x1(f, k, b)
        return ce_loss(lg, target, cw, 21) + dice_loss(lg, onehot)

    def l_fus(f, k, b):
        return final_ce_dice_loss_grad(f, k, b, target, cw, 21,
                                       interpret=True)[0]

    g_ref = jax.grad(l_ref, argnums=(0, 1, 2))(feats, kernel, bias)
    g_fus = jax.grad(l_fus, argnums=(0, 1, 2))(feats, kernel, bias)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-7,
                                   err_msg=f"grad argnum {i}")


@pytest.mark.parametrize("shape", [
    (1, 8, 16, 16, 4),
    (2, 16, 16, 64, 21),
    # W % 128 == 0 exercises the MXU selection-matmul even/odd split
    # (loss.py::_flatten_feats_pt) — the branch the production 512px
    # path takes; W=16 above hits the strided-slice fallback
    (1, 4, 128, 16, 21),
])
def test_final_loss_paired_feats_matches_natural(shape):
    """Column-paired feature input (B, H, W/2, 2·Cf) routes through the
    paired-native kernels and must match the natural layout (identical
    flat row order; summation order differs → tight tolerance)."""
    n, h, w, cf, c = shape
    feats, kernel, bias, target, cw, _ = _case(n, h, w, cf, c)
    paired = feats.reshape(n, h, w // 2, 2 * cf)

    l_nat, fs_nat = final_ce_dice_loss_grad(feats, kernel, bias, target,
                                            cw, c, interpret=True)
    l_par, fs_par = final_ce_dice_loss_grad(paired, kernel, bias, target,
                                            cw, c, interpret=True)
    np.testing.assert_allclose(float(l_par), float(l_nat), rtol=1e-5)
    np.testing.assert_allclose(float(fs_par), float(fs_nat), rtol=1e-5)

    args = dict(target=target)
    g_nat = jax.grad(lambda f, k, b: final_ce_dice_loss_grad(
        f, k, b, args["target"], cw, c, interpret=True)[0],
        argnums=(0, 1, 2))(feats, kernel, bias)
    g_par = jax.grad(lambda f, k, b: final_ce_dice_loss_grad(
        f, k, b, args["target"], cw, c, interpret=True)[0],
        argnums=(0, 1, 2))(paired, kernel, bias)
    for i, (a, b) in enumerate(zip(g_nat, g_par)):
        np.testing.assert_allclose(
            np.asarray(b).reshape(-1), np.asarray(a).reshape(-1),
            rtol=1e-4, atol=1e-8, err_msg=f"grad argnum {i}")


def test_final_loss_bf16_feats():
    feats, kernel, bias, target, cw, onehot = _case(1, 16, 16, 64, 21)
    feats16 = feats.astype(jnp.bfloat16)
    k16, b16 = kernel.astype(jnp.bfloat16), bias.astype(jnp.bfloat16)
    logits = (_conv1x1(feats16, k16, b16)).astype(jnp.float32)
    ref = ce_loss(logits, target, cw, 21) + dice_loss(logits, onehot)
    loss, _ = final_ce_dice_loss_grad(feats16, k16, b16, target, cw, 21,
                                      interpret=True)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-2)
    df, dk, db = jax.grad(lambda f, k, b: final_ce_dice_loss_grad(
        f, k, b, target, cw, 21, interpret=True)[0],
        argnums=(0, 1, 2))(feats16, k16, b16)
    assert df.dtype == jnp.bfloat16 and dk.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(df, np.float32)).all()


def test_out_of_range_labels_match_reference_clamp():
    """Raw out-of-range labels (e.g. VOC's 255 border) must behave as the
    reference's png[png >= num_classes] = num_classes (utils/
    dataloader.py:43): ignored by CE, but their softmax mass still counts
    in dice fp and f_score via the prob sums."""
    c = 21
    feats, kernel, bias, target, cw, _ = _case(1, 8, 16, 16, c)
    raw = np.asarray(target).copy()
    raw[0, :2] = 255  # un-preprocessed ignore pixels
    clamped = np.minimum(raw, c)
    l_raw, fs_raw = final_ce_dice_loss_grad(
        feats, kernel, bias, jnp.asarray(raw), cw, c, interpret=True)
    l_cl, fs_cl = final_ce_dice_loss_grad(
        feats, kernel, bias, jnp.asarray(clamped), cw, c, interpret=True)
    np.testing.assert_allclose(float(l_raw), float(l_cl), rtol=1e-6)
    np.testing.assert_allclose(float(fs_raw), float(fs_cl), rtol=1e-6)

    from tpu_unet.kernels.loss import ce_dice_loss_grad

    logits = _conv1x1(feats, kernel, bias)
    l2_raw, _ = ce_dice_loss_grad(logits, jnp.asarray(raw), cw, c,
                                  interpret=True)
    l2_cl, _ = ce_dice_loss_grad(logits, jnp.asarray(clamped), cw, c,
                                 interpret=True)
    np.testing.assert_allclose(float(l2_raw), float(l2_cl), rtol=1e-6)
