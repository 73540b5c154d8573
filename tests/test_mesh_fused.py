"""The fully-fused training step (stem + block2 + wide decoders + paired
up1 + fused final-conv loss, interpret mode) must partition correctly
under a data-sharded mesh: GSPMD splits every Pallas kernel along its
batch grid dimension, so the sharded step's loss and parameter updates
must match the unsharded XLA composition."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_unet.core import fusion
from tpu_unet.models.registry import build_model, init_model
from tpu_unet.train.step import (StepConfig, create_train_state,
                                 make_optimizer, make_train_step)


def test_fused_train_step_matches_under_mesh():
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-virtual-device CPU mesh")

    model = build_model("unet_vgg", 4)
    variables = init_model(model, (32, 32), train=True)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1), use_dice=True)
    tx = make_optimizer("adam")
    rng = np.random.RandomState(0)
    batch = {"image": rng.randint(0, 255, (8, 32, 32, 3)).astype(np.uint8),
             "label": rng.randint(0, 4, (8, 32, 32)).astype(np.int32)}

    def run(fused, sharded):
        fusion.set_fused_decoder(fused)
        fusion.set_paired_train(fused)
        fusion.set_fused_loss(fused)
        try:
            v = jax.tree_util.tree_map(jnp.asarray, host_vars)
            state = create_train_state(model, v, tx)
            step = make_train_step(model, cfg)
            if sharded:
                mesh = Mesh(np.array(jax.devices()[:8]).reshape(8),
                            ("data",))
                with mesh:
                    sb = {k: jax.device_put(
                        x, NamedSharding(mesh, P("data")))
                        for k, x in batch.items()}
                    st, m = step(state, sb, 1e-4, jax.random.PRNGKey(0))
                    return float(m["loss"]), st
            st, m = step(state,
                         {k: jax.device_put(x) for k, x in batch.items()},
                         1e-4, jax.random.PRNGKey(0))
            return float(m["loss"]), st
        finally:
            fusion.set_fused_decoder(None)
            fusion.set_paired_train(None)
            fusion.set_fused_loss(None)

    l_fs, st_fs = run(True, True)
    l_ref, st_ref = run(False, False)
    assert abs(l_fs - l_ref) < 1e-5, (l_fs, l_ref)
    for path in (("up_concat1", "conv1", "kernel"),
                 ("up_concat2", "conv1", "kernel"),
                 ("vgg", "features_0", "kernel"),
                 ("vgg", "features_5", "kernel"),
                 ("final", "kernel")):
        a, b = st_fs.params, st_ref.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg="/".join(path))


def test_fused_train_step_matches_under_spatial_mesh():
    """dp(4) x spatial(2): the fused step must stay correct when the
    image H axis is sharded too (GSPMD reshards around the kernels)."""
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from tpu_unet.parallel.spatial import create_2d_mesh, shard_batch_spatial

    model = build_model("unet_vgg", 4)
    variables = init_model(model, (32, 32), train=True)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1), use_dice=True)
    tx = make_optimizer("adam")
    rng = np.random.RandomState(0)
    batch = {"image": rng.randint(0, 255, (8, 32, 32, 3)).astype(np.uint8),
             "label": rng.randint(0, 4, (8, 32, 32)).astype(np.int32)}

    def run(fused):
        fusion.set_fused_decoder(fused)
        fusion.set_paired_train(fused)
        fusion.set_fused_loss(fused)
        try:
            v = jax.tree_util.tree_map(jnp.asarray, host_vars)
            state = create_train_state(model, v, tx)
            step = make_train_step(model, cfg)
            if fused:
                mesh = create_2d_mesh(4, 2)
                with mesh:
                    sb = shard_batch_spatial(batch, mesh)
                    _, m = step(state, sb, 1e-4, jax.random.PRNGKey(0))
                    return float(m["loss"])
            _, m = step(state,
                        {k: jax.device_put(x) for k, x in batch.items()},
                        1e-4, jax.random.PRNGKey(0))
            return float(m["loss"])
        finally:
            fusion.set_fused_decoder(None)
            fusion.set_paired_train(None)
            fusion.set_fused_loss(None)

    l_fs = run(True)
    l_ref = run(False)
    assert abs(l_fs - l_ref) < 1e-5, (l_fs, l_ref)
