"""Grad-exactness for the deep-block (3/4/5) training kernel pair
(kernels/encoder3_train.py) vs jax autodiff of the XLA reference block,
interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.encoder3_train import (_ref_diff,
                                             fused_vgg_block3_train)

RNG = np.random.RandomState(13)


def _case(B, H, W, C, F):
    x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    ks = [jnp.asarray((RNG.randn(3, 3, c, F) * 0.05).astype(np.float32))
          for c in (C, F, F)]
    bs = [jnp.asarray((RNG.randn(F) * 0.05).astype(np.float32))
          for _ in range(3)]
    return x, ks, bs


def _flat(x, ks, bs):
    return (x, ks[0], bs[0], ks[1], bs[1], ks[2], bs[2])


@pytest.mark.parametrize("shape,pool", [
    ((1, 16, 8, 128, 128), True),
    ((2, 16, 6, 128, 128), True),     # odd-ish W exercises col edges
    ((1, 16, 8, 128, 128), False),    # block-5 mode (no pool)
    ((1, 32, 4, 128, 256), True),     # C != F (block-3 entry conv)
])
def test_block3_forward_matches_reference(shape, pool):
    x, ks, bs = _case(*shape)
    skip_r, pool_r = _ref_diff(*_flat(x, ks, bs), pool)
    skip_f, pool_f = fused_vgg_block3_train(x, ks, bs, pool=pool)
    np.testing.assert_allclose(np.asarray(skip_f), np.asarray(skip_r),
                               rtol=3e-4, atol=3e-4)
    if pool:
        np.testing.assert_allclose(np.asarray(pool_f), np.asarray(pool_r),
                                   rtol=3e-4, atol=3e-4)
    else:
        assert pool_f is None


@pytest.mark.parametrize("shape,pool", [
    ((1, 16, 8, 128, 128), True),
    ((1, 16, 8, 128, 128), False),
    ((1, 32, 4, 128, 256), True),
])
def test_block3_vjp_matches_autodiff(shape, pool):
    x, ks, bs = _case(*shape)

    def loss_fused(*args):
        s, p = fused_vgg_block3_train(
            args[0], [args[1], args[3], args[5]],
            [args[2], args[4], args[6]], pool=pool)
        t = jnp.sum(jnp.sin(s * 0.1))
        if p is not None:
            t = t + jnp.sum(jnp.cos(p * 0.1))
        return t

    def loss_ref(*args):
        s, p = _ref_diff(*args, pool)
        t = jnp.sum(jnp.sin(s * 0.1))
        if p is not None:
            t = t + jnp.sum(jnp.cos(p * 0.1))
        return t

    args = _flat(x, ks, bs)
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for name, u, v in zip("x k1 b1 k2 b2 k3 b3".split(), gf, gr):
        # f32 matmul-reassociation noise only: the kernel accumulates
        # wgrads across row tiles in a different order than autodiff, so
        # the tolerance scales with the gradient's magnitude
        scale = max(float(np.max(np.abs(np.asarray(v)))), 1.0)
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=5e-4, atol=5e-4 * scale,
            err_msg=f"grad mismatch for {name} (pool={pool})")


def test_block3_fallback_untileable():
    # H not divisible by 8 → XLA fallback, still differentiable
    x, ks, bs = _case(1, 12, 8, 128, 128)

    def loss(*args):
        s, p = fused_vgg_block3_train(
            args[0], [args[1], args[3], args[5]],
            [args[2], args[4], args[6]], pool=True)
        return jnp.sum(s * 0.01) + jnp.sum(p * 0.01)

    g = jax.grad(loss, argnums=(0, 1))(*_flat(x, ks, bs))
    assert all(np.isfinite(np.asarray(t)).all() for t in g)


def test_block3_first_max_pool_ties():
    # constant plateaus create 4-way pool ties; routing must match
    # XLA's select-and-scatter (first match in window row-major order)
    x, ks, bs = _case(1, 16, 8, 128, 128)
    x = jnp.round(x)  # quantize → many exact ties after convs of zeros
    ks = [jnp.zeros_like(k) for k in ks]  # all-zero convs → pure bias
    def loss_fused(x):
        s, p = fused_vgg_block3_train(x, ks, bs, pool=True)
        return jnp.sum(p * jnp.arange(p.size).reshape(p.shape))
    def loss_ref(x):
        s, p = _ref_diff(x, ks[0], bs[0], ks[1], bs[1], ks[2], bs[2], True)
        return jnp.sum(p * jnp.arange(p.size).reshape(p.shape))
    gf = jax.grad(loss_fused)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)
