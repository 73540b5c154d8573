"""Multi-device data-parallel SERVING (reference anchor: the reference
wraps inference in nn.DataParallel, unet.py:95; the north-star aggregate
is an 8-chip inference number).

`Unet.serving_step_sharded` shard_maps the public single-chip serving
step — including the fused Pallas fast path, running here in interpret
mode — over the batch axis of an 8-virtual-device mesh.  Masks must be
IDENTICAL to the single-device path: data-parallel serving has no
cross-device math.
"""
import jax
import numpy as np
import pytest

from tpu_unet.core import fusion
from tpu_unet.core.mesh import create_mesh


@pytest.fixture(autouse=True)
def _reset_switches():
    yield
    fusion.set_fused_decoder(None)


def _wrapper(model, shape=64):
    from tpu_unet.infer.wrapper import Unet

    return Unet(model=model, num_classes=21, input_shape=[shape, shape],
                model_path="")


def test_sharded_serving_masks_identical_plain():
    """Plain (XLA) serving path on the 8-device mesh."""
    mesh = create_mesh()
    n = mesh.shape["data"]
    assert n == 8, f"conftest should provide 8 virtual devices, got {n}"
    u = _wrapper("traditional")
    imgs = np.random.RandomState(0).randint(
        0, 255, size=(2 * n, 64, 64, 3)).astype(np.uint8)
    single = u.batch_infer(imgs)
    sharded = u.batch_infer_sharded(imgs, mesh)
    np.testing.assert_array_equal(sharded, single)


def test_sharded_serving_masks_identical_fused():
    """The FUSED fast path (paired head + Pallas final/argmax tail,
    interpret mode on CPU) under shard_map: each device runs the full
    kernel pipeline on its local shard."""
    mesh = create_mesh()
    n = mesh.shape["data"]
    fusion.set_fused_decoder(True)
    u = _wrapper("unet_vgg")
    imgs = np.random.RandomState(1).randint(
        0, 255, size=(n, 64, 64, 3)).astype(np.uint8)
    single = u.batch_infer(imgs)
    sharded = u.batch_infer_sharded(imgs, mesh)
    np.testing.assert_array_equal(sharded, single)


def test_sharded_serving_rejects_ragged_batch():
    mesh = create_mesh()
    u = _wrapper("traditional")
    imgs = np.zeros((3, 64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="not divisible"):
        u.batch_infer_sharded(imgs, mesh)


def test_sharded_serving_hist_aggregates():
    """The histogram output shards like the masks and sums to full
    coverage — the device-side mIoU accumulation path scales with the
    mesh."""
    mesh = create_mesh()
    n = mesh.shape["data"]
    u = _wrapper("traditional")
    fn, v_mesh = u.serving_step_sharded(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    imgs = jax.device_put(
        np.random.RandomState(2).randint(
            0, 255, size=(n, 64, 64, 3)).astype(np.uint8),
        NamedSharding(mesh, P("data")))
    masks, hist = fn(v_mesh, imgs)
    assert np.asarray(hist).shape == (n, 21)
    assert int(np.asarray(hist).sum()) == n * 64 * 64
