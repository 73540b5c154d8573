"""Grad-exactness for the block-2 training kernel pair
(kernels/encoder_train.py) vs jax autodiff of the XLA reference block,
interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.encoder import reference_vgg_block
from tpu_unet.kernels.encoder_train import fused_vgg_block2_train

RNG = np.random.RandomState(11)


def _case(B, H, W2, C, F):
    x = jnp.asarray(RNG.randn(B, H, W2, C).astype(np.float32))
    k5 = jnp.asarray((RNG.randn(3, 3, C, F) * 0.1).astype(np.float32))
    b5 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k7 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.05).astype(np.float32))
    b7 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    return x, k5, b5, k7, b7


def _ref(x, k5, b5, k7, b7):
    return reference_vgg_block(x, [k5, k7], [b5, b7], pool=True)


@pytest.mark.parametrize("shape", [(1, 16, 8, 4, 128), (2, 16, 16, 64, 128)])
def test_block2_forward_matches_reference(shape):
    args = _case(*shape)
    skip_r, pool_r = _ref(*args)
    skip_f, pool_f = fused_vgg_block2_train(*args)
    np.testing.assert_allclose(np.asarray(skip_f), np.asarray(skip_r),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(pool_f), np.asarray(pool_r),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("shape", [(1, 16, 8, 4, 128), (2, 16, 16, 64, 128)])
def test_block2_vjp_matches_autodiff(shape):
    args = _case(*shape)

    def loss(fn):
        def f(*a):
            skip, pool = fn(*a)
            return jnp.mean(skip ** 2) + 2.0 * jnp.mean(pool ** 2)
        return f

    g_ref = jax.grad(loss(_ref), argnums=tuple(range(5)))(*args)
    g_fus = jax.grad(loss(fused_vgg_block2_train),
                     argnums=tuple(range(5)))(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(b - a).max() / (np.abs(a).max() + 1e-12)
        assert rel < 2e-5, f"grad argnum {i}: rel {rel}"


def test_block2_pool_ties_route_first():
    """Relu-zero ties must route like XLA's select-and-scatter."""
    x, k5, b5, k7, b7 = _case(1, 16, 8, 4, 128)
    b7 = b7 - 0.3

    def loss(fn):
        def f(k7_, b7_):
            skip, pool = fn(x, k5, b5, k7_, b7_)
            w = jnp.arange(pool.size, dtype=jnp.float32).reshape(pool.shape)
            return jnp.sum(pool * w) / pool.size
        return f

    g_ref = jax.grad(loss(_ref), argnums=(0, 1))(k7, b7)
    g_fus = jax.grad(loss(fused_vgg_block2_train), argnums=(0, 1))(k7, b7)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(b - a).max() / (np.abs(a).max() + 1e-12)
        assert rel < 2e-5, f"grad argnum {i}: rel {rel}"
