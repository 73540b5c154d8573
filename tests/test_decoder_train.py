"""Grad-exactness for the paired backward kernel (kernels/decoder_train.py):
fused_unetup_train's VJP vs jax autodiff of the XLA reference composition,
interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.decoder_fuse import (fused_unetup_train,
                                           reference_unetup)
from tpu_unet.kernels.decoder_train import fused_unetup_bwd_impl

RNG = np.random.RandomState(3)


def _case(B, H, W, Cs, Cx, F):
    skip = jnp.asarray(RNG.randn(B, 2 * H, 2 * W, Cs).astype(np.float32))
    x = jnp.asarray(RNG.randn(B, H, W, Cx).astype(np.float32))
    k1 = jnp.asarray((RNG.randn(3, 3, Cs + Cx, F) * 0.1).astype(np.float32))
    b1 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k2 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.1).astype(np.float32))
    b2 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    return skip, x, k1, b1, k2, b2


@pytest.mark.parametrize("shape", [
    (1, 8, 8, 8, 16, 8),
    (2, 8, 16, 4, 8, 16),
])
def test_train_vjp_matches_autodiff(shape):
    args = _case(*shape)

    def loss_f(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g_ref = jax.grad(loss_f(reference_unetup),
                     argnums=tuple(range(6)))(*args)
    g_fus = jax.grad(loss_f(fused_unetup_train),
                     argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=f"grad argnum {i}")


@pytest.mark.parametrize("shape", [
    (1, 8, 8, 8, 16, 8),
    (2, 8, 16, 4, 8, 16),
])
def test_train_paired_vjp_matches_autodiff(shape):
    """v2: the fully-paired train stage (paired output + in-kernel wgrads)
    must match autodiff of the natural composition exactly."""
    from tpu_unet.kernels.decoder_fuse import fused_unetup_train_paired

    args = _case(*shape)

    def loss_ref(*a):
        return jnp.sum(reference_unetup(*a) ** 2)

    def loss_fus(*a):
        out_p = fused_unetup_train_paired(*a)
        return jnp.sum(out_p ** 2)  # paired reshape is sum-invariant

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_fus = jax.grad(loss_fus, argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=f"grad argnum {i}")


def test_train_paired_forward_matches_reference():
    from tpu_unet.kernels.decoder_fuse import fused_unetup_train_paired

    args = _case(1, 8, 8, 8, 16, 8)
    out_ref = reference_unetup(*args)
    out_p = fused_unetup_train_paired(*args)
    n, h, w, f = out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out_p).reshape(n, h, w, f), np.asarray(out_ref),
        rtol=2e-4, atol=2e-4)


def test_bwd_impl_engages():
    """The paired bwd kernel must actually run for up1-like shapes (not
    silently fall back to the XLA VJP)."""
    args = _case(1, 8, 8, 8, 16, 8)
    skip, x, k1, b1, k2, b2 = args
    out = reference_unetup(*args)
    y1 = jnp.maximum(out * 0 + 1.0, 0)  # placeholder same-shape
    res = fused_unetup_bwd_impl(out, out, y1, k1, k2, skip.shape[-1],
                                block_rows=8)
    assert res is not None
    dskip, dups, g2, dz1 = res
    assert dskip.shape == skip.shape
    assert dups.shape == (x.shape[0], 2 * x.shape[1], 2 * x.shape[2],
                          x.shape[3])


def test_paired_train_head_end_to_end():
    """Full wiring: Unet(features_out) with the fused train switches on
    emits the PAIRED feature map; the fused final-conv+loss kernel consumes
    it and its paired cotangent drives the v2 backward.  Loss and a sample
    of parameter gradients must match the natural XLA composition."""
    from tpu_unet.core import fusion
    from tpu_unet.kernels.loss import final_ce_dice_loss_grad
    from tpu_unet.models.unet import Unet
    from tpu_unet.train.losses import ce_loss, dice_loss

    model = Unet(num_classes=4, backbone="vgg")
    feat_model = model.clone(features_out=True)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32))
    target = jnp.asarray(RNG.randint(0, 4, (1, 32, 32)).astype(np.int32))
    onehot = jax.nn.one_hot(target, 5, dtype=jnp.float32)
    cw = (1.0, 1.0, 1.0, 1.0)
    variables = model.init(key, x, False)
    params = variables["params"]

    def loss_nat(p):
        out = model.apply({"params": p}, x, True,
                          rngs={"dropout": key})
        return (ce_loss(out, target, cw, 4)
                + dice_loss(out, onehot))

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
    for path in (("final", "kernel"), ("up_concat1", "conv1", "kernel"),
                 ("up_concat1", "conv2", "bias"),
                 ("up_concat2", "conv1", "kernel"),
                 ("vgg", "features_0", "kernel")):
        a, b = g_ref, g_fus
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4,
            err_msg="/".join(path))


@pytest.mark.parametrize("shape", [
    (1, 8, 8, 128, 128, 128),    # minimal wide stage
    (1, 8, 8, 128, 256, 128),    # stage-2-like channel ratios
])
def test_train_wide_vjp_matches_autodiff(shape):
    """The wide (F >= 128) train stage — plane-paired forward + one-pass
    backward with in-kernel wgrads and upsample transpose — must match
    autodiff of the natural composition exactly."""
    from tpu_unet.kernels.decoder_fuse import fused_unetup_train_wide

    args = _case(*shape)

    def loss_ref(*a):
        return jnp.sum(reference_unetup(*a) ** 2)

    def loss_fus(*a):
        return jnp.sum(fused_unetup_train_wide(*a) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_fus = jax.grad(loss_fus, argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        a, b = np.asarray(a), np.asarray(b)
        # 128-channel f32 accumulations differ from autodiff only in
        # summation order; compare on the normalized infinity norm
        rel = np.abs(b - a).max() / (np.abs(a).max() + 1e-12)
        assert rel < 2e-5, f"grad argnum {i}: rel {rel}"


def test_train_wide_deep_stage_vjp():
    """up4-like deep stage (H <= 32, Cp >= 1024 scaled down): the wide
    train wrapper opts past the inference deep-gate; grads must stay
    exact."""
    from tpu_unet.kernels.decoder_fuse import fused_unetup_train_wide

    # scaled-down up4 topology (Cp >= 1024 is impractical in interpret;
    # the gate fires on H <= 32 which (1, 8, ...) satisfies via allow_deep)
    args = _case(1, 8, 8, 128, 128, 128)

    def loss_ref(*a):
        return jnp.mean(reference_unetup(*a) ** 2)

    def loss_fus(*a):
        return jnp.mean(fused_unetup_train_wide(*a) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(2, 4))(*args)
    g_fus = jax.grad(loss_fus, argnums=(2, 4))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(b - a).max() / (np.abs(a).max() + 1e-12)
        assert rel < 2e-5, f"grad {i}: rel {rel}"


def test_paired_lowres_bwd_matches_reference_grads():
    """The low-res PAIRED backward (the up1 stage,
    kernels/decoder_train.py::_bwd_kernel_paired_lowres) is grad-exact vs
    the XLA reference at up1-like lane shapes (2F and Cx 128-multiples)."""
    from tpu_unet.core import fusion
    from tpu_unet.kernels.decoder_fuse import (fused_unetup_train_paired,
                                               reference_unetup)

    rng = np.random.RandomState(11)
    for (B, H, W, Cs, Cx, F) in [(1, 8, 8, 64, 128, 64),
                                 (1, 24, 4, 64, 128, 64)]:
        skip = jnp.asarray(rng.randn(B, 2 * H, 2 * W, Cs).astype(np.float32))
        x = jnp.asarray(rng.randn(B, H, W, Cx).astype(np.float32))
        k1 = jnp.asarray((rng.randn(3, 3, Cs + Cx, F) * 0.05
                          ).astype(np.float32))
        b1 = jnp.asarray((rng.randn(F) * 0.05).astype(np.float32))
        k2 = jnp.asarray((rng.randn(3, 3, F, F) * 0.05).astype(np.float32))
        b2 = jnp.asarray((rng.randn(F) * 0.05).astype(np.float32))

        def loss(f):
            return lambda *a: jnp.sum(jnp.sin(f(*a) * 0.05))

        args = (skip, x, k1, b1, k2, b2)
        gr = jax.grad(loss(reference_unetup), argnums=tuple(range(6)))(*args)
        fusion.set_lowres_bwd_paired(True)
        try:
            gn = jax.grad(loss(fused_unetup_train_paired),
                          argnums=tuple(range(6)))(*args)
        finally:
            fusion.set_lowres_bwd_paired(None)
        for name, u, v in zip("dskip dx dk1 db1 dk2 db2".split(), gn, gr):
            scale = max(float(np.max(np.abs(np.asarray(v)))), 1.0)
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), rtol=5e-4,
                atol=5e-4 * scale, err_msg=f"paired lowres bwd grad {name}")


def test_wide_lowres_bwd_matches_reference_grads():
    """The low-res wide BACKWARD (opt-in: measured neutral-to-negative
    on v5e — see core/fusion.use_lowres_bwd) stays grad-exact vs the
    XLA reference."""
    from tpu_unet.core import fusion
    from tpu_unet.kernels.decoder_fuse import (fused_unetup_train_wide,
                                               reference_unetup)

    rng = np.random.RandomState(7)
    for (B, H, W, Cs, Cx, F) in [(1, 8, 8, 128, 256, 128),
                                 (1, 24, 4, 128, 256, 128)]:
        skip = jnp.asarray(rng.randn(B, 2 * H, 2 * W, Cs).astype(np.float32))
        x = jnp.asarray(rng.randn(B, H, W, Cx).astype(np.float32))
        k1 = jnp.asarray((rng.randn(3, 3, Cs + Cx, F) * 0.05
                          ).astype(np.float32))
        b1 = jnp.asarray((rng.randn(F) * 0.05).astype(np.float32))
        k2 = jnp.asarray((rng.randn(3, 3, F, F) * 0.05).astype(np.float32))
        b2 = jnp.asarray((rng.randn(F) * 0.05).astype(np.float32))

        def loss(f):
            return lambda *a: jnp.sum(jnp.sin(f(*a) * 0.05))

        args = (skip, x, k1, b1, k2, b2)
        gr = jax.grad(loss(reference_unetup), argnums=tuple(range(6)))(*args)
        fusion.set_lowres_up(True)
        fusion.set_lowres_bwd(True)
        try:
            gn = jax.grad(loss(fused_unetup_train_wide),
                          argnums=tuple(range(6)))(*args)
        finally:
            fusion.set_lowres_up(None)
            fusion.set_lowres_bwd(None)
        for name, u, v in zip("dskip dx dk1 db1 dk2 db2".split(), gn, gr):
            scale = max(float(np.max(np.abs(np.asarray(v)))), 1.0)
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), rtol=5e-4,
                atol=5e-4 * scale, err_msg=f"lowres bwd grad {name}")
