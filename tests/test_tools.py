"""Tooling tests: summary, annotation, checkpointing, predict drivers."""
import os

import numpy as np
import pytest
from PIL import Image

from tpu_unet.tools.annotation import audit_labels, generate_splits
from tpu_unet.tools.summary import summarize
from tpu_unet.train.checkpoint import (load_variables, partial_load,
                                       save_variables)


def test_summary_params_and_flops():
    res = summarize("ultralight", (64, 64), 4, verbose=False)
    assert res["params"] == 449_876
    assert res["flops"] > 1e6


def test_checkpoint_roundtrip(tmp_path):
    from tpu_unet.models.registry import build_model, init_model

    m = build_model("ultralight", 4)
    v = init_model(m, (32, 32))
    p = str(tmp_path / "ckpt.msgpack")
    save_variables(p, v)
    loaded = load_variables(p)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_load_shape_filter():
    tpl = {"a": {"kernel": np.zeros((3, 3))}, "b": {"kernel": np.zeros(4)}}
    src = {"a": {"kernel": np.ones((3, 3))}, "b": {"kernel": np.ones(5)},
           "c": {"kernel": np.ones(1)}}
    out = partial_load(tpl, src, verbose=False)
    assert out["a"]["kernel"].sum() == 9      # loaded
    assert out["b"]["kernel"].sum() == 0      # shape mismatch → kept template


def test_generate_splits_and_audit(tmp_path):
    seg = tmp_path / "seg"
    seg.mkdir()
    for i in range(10):
        arr = np.zeros((8, 8), np.uint8)
        arr[:4] = i % 3
        Image.fromarray(arr).save(seg / f"img{i}.png")
    splits = generate_splits(str(seg), str(tmp_path / "sets"), 1.0, 0.8)
    assert len(splits["train"]) == 8
    assert len(splits["val"]) == 2
    assert (tmp_path / "sets" / "train.txt").exists()
    counts = audit_labels(str(seg), splits["trainval"], 3)
    assert counts[:3].sum() == 10 * 64


def test_predict_dir(tmp_path):
    from tpu_unet.infer.wrapper import Unet
    from tpu_unet.tools.predict import predict_dir

    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3)).astype("uint8")
                        ).save(ind / f"x{i}.jpg")
    u = Unet(model="ultralight", num_classes=4, input_shape=[32, 32],
             model_path="")
    n = predict_dir(u, str(ind), str(outd), save_npy=True)
    assert n == 2
    files = sorted(os.listdir(outd))
    assert "seg_x0.jpg" in files and "seg_x0.npy" in files
