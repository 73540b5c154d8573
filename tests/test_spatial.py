"""Spatial-partitioning tests on the 8-device virtual mesh: a (data×space)
2-D mesh must produce numerically identical results to single-device
execution — GSPMD inserts the conv halo exchanges."""
import numpy as np
import pytest

import jax

from tpu_unet.models.registry import build_model, init_model
from tpu_unet.parallel.spatial import (create_2d_mesh, shard_batch_spatial,
                                       spatial_batch_sharding)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_spatial_forward_matches_unsharded(shape):
    model = build_model("traditional", 4)
    v = init_model(model, (32, 32))
    rng = np.random.RandomState(0)
    x = rng.rand(4, 32, 32, 3).astype("float32")

    ref = np.asarray(jax.jit(lambda v, x: model.apply(v, x, False))(v, x))

    mesh = create_2d_mesh(*shape)
    xs = jax.device_put(x, spatial_batch_sharding(mesh))
    out = np.asarray(jax.jit(lambda v, x: model.apply(v, x, False))(v, xs))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_spatial_train_step():
    from tpu_unet.core.mesh import replicate
    from tpu_unet.train.step import (StepConfig, create_train_state,
                                     make_optimizer, make_train_step)

    mesh = create_2d_mesh(2, 4)
    model = build_model("ultralight", 4)
    v = init_model(model, (32, 32), train=True)
    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1), use_dice=True)
    tx = make_optimizer("adam")
    state = replicate(create_train_state(model, v, tx), mesh)
    step = make_train_step(model, cfg)

    rng = np.random.RandomState(1)
    batch = shard_batch_spatial({
        "image": rng.randint(0, 255, (4, 32, 32, 3)).astype("uint8"),
        "label": rng.randint(0, 4, (4, 32, 32)).astype("int32"),
    }, mesh)
    state, m = step(state, batch, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_spatial_sharding_cuts_peak_memory():
    """The characterization artifact's CI anchor (SPATIAL_CHARACTERIZATION
    .md §1): XLA's compiled per-device peak temp memory for the H-sharded
    train step must be several times below the unsharded plan — the
    fits-in-HBM case for spatial partitioning."""
    from tpu_unet.tools.spatial_memory import compiled_peak_bytes

    un = compiled_peak_bytes("traditional", 4, (1024, 1024), space=1)
    sh = compiled_peak_bytes("traditional", 4, (1024, 1024), space=8)
    assert sh["temp_bytes"] * 4 < un["temp_bytes"], (un, sh)
