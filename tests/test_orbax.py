"""Orbax checkpoint option roundtrip (multi-host/sharded-array path)."""
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")


def test_orbax_roundtrip(tmp_path):
    import jax

    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.train.checkpoint import load_any, save_orbax

    m = build_model("ultralight", 4)
    v = init_model(m, (32, 32))
    path = str(tmp_path / "ckpt_dir")
    save_orbax(path, v)
    loaded = load_any(path)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
