"""Grad-exactness for the training stem VJP (kernels/stem_train.py):
fused_vgg_stem_train's parameter gradients vs jax autodiff of the XLA
reference stem, interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.kernels.stem import reference_vgg_stem
from tpu_unet.kernels.stem_train import fused_vgg_stem_train

RNG = np.random.RandomState(7)


def _case(B, H, W, F):
    x = jnp.asarray(RNG.randn(B, H, W, 3).astype(np.float32))
    k11 = jnp.asarray((RNG.randn(3, 3, 3, F) * 0.2).astype(np.float32))
    b11 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    k12 = jnp.asarray((RNG.randn(3, 3, F, F) * 0.1).astype(np.float32))
    b12 = jnp.asarray((RNG.randn(F) * 0.1).astype(np.float32))
    return x, k11, b11, k12, b12


@pytest.mark.parametrize("shape", [(1, 16, 16, 8), (2, 32, 16, 8)])
def test_stem_train_forward_matches_reference(shape):
    args = _case(*shape)
    skip_r, pool_r = reference_vgg_stem(*args)
    skip_f, pool_f = fused_vgg_stem_train(*args)
    np.testing.assert_allclose(np.asarray(skip_f), np.asarray(skip_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pool_f), np.asarray(pool_r),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [(1, 16, 16, 8), (2, 32, 16, 8)])
def test_stem_train_param_grads_match_autodiff(shape):
    args = _case(*shape)

    def loss(fn):
        def f(k11, b11, k12, b12):
            skip, pool = fn(args[0], k11, b11, k12, b12)
            # asymmetric weights so every output position matters
            return (jnp.sum(skip ** 2) + 2.0 * jnp.sum(pool ** 2)
                    + jnp.sum(skip * 0.3) + jnp.sum(pool * 0.7))
        return f

    g_ref = jax.grad(loss(reference_vgg_stem),
                     argnums=(0, 1, 2, 3))(*args[1:])
    g_fus = jax.grad(loss(fused_vgg_stem_train),
                     argnums=(0, 1, 2, 3))(*args[1:])
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4,
            err_msg=f"grad argnum {i}")


def test_stem_train_pool_ties_route_first():
    """Relu zeros tie constantly in real nets; the first-max routing must
    match XLA's select-and-scatter exactly.  Force heavy ties with a
    negative-biased input."""
    x, k11, b11, k12, b12 = _case(1, 16, 16, 8)
    b12 = b12 - 0.5  # most activations clamp to zero → 2×2 all-zero ties

    def loss(fn):
        def f(k12_, b12_):
            skip, pool = fn(x, k11, b11, k12_, b12_)
            return jnp.sum(pool * jnp.arange(pool.size, dtype=jnp.float32)
                           .reshape(pool.shape))
        return f

    g_ref = jax.grad(loss(reference_vgg_stem), argnums=(0, 1))(k12, b12)
    g_fus = jax.grad(loss(fused_vgg_stem_train), argnums=(0, 1))(k12, b12)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4,
            err_msg=f"grad argnum {i}")
