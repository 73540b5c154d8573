"""End-to-end training smoke over the fake 8-device mesh (SURVEY.md §4):
GSPMD data parallelism, global-batch BN (SyncBN), freeze/unfreeze, losses,
loader sharding — against the real bundled medical dataset when present."""
import dataclasses
import os

import numpy as np
import pytest

import jax

from tpu_unet.configs.presets import PRESETS, TrainConfig, get_preset
from tpu_unet.core.mesh import create_mesh, replicate, shard_batch
from tpu_unet.models.registry import build_model, init_model
from tpu_unet.train.step import (StepConfig, create_train_state,
                                 make_eval_step, make_optimizer,
                                 make_train_step)

MEDICAL = "/root/reference/Medical_Datasets"


def _rand_batch(rng, n=8, hw=32, nc=4):
    return {
        "image": rng.randint(0, 255, size=(n, hw, hw, 3)).astype("uint8"),
        "label": rng.randint(0, nc, size=(n, hw, hw)).astype("int32"),
    }


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8


@pytest.mark.parametrize("use_focal,use_dice", [(False, False), (True, True)])
def test_train_step_decreases_loss(use_focal, use_dice):
    mesh = create_mesh()
    model = build_model("ultralight", 4)
    variables = init_model(model, (32, 32), train=True)
    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1),
                     use_focal=use_focal, use_dice=use_dice)
    tx = make_optimizer("adam")
    state = replicate(create_train_state(model, variables, tx), mesh)
    step = make_train_step(model, cfg)
    rng = np.random.RandomState(0)
    batch = shard_batch(_rand_batch(rng), mesh)
    losses = []
    for i in range(8):
        state, m = step(state, batch, 1e-3, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_eval_step_and_bf16():
    mesh = create_mesh()
    model = build_model("traditional", 4)
    variables = init_model(model, (32, 32), train=True)
    import jax.numpy as jnp

    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1),
                     compute_dtype=jnp.bfloat16)
    tx = make_optimizer("sgd", momentum=0.9, weight_decay=1e-4)
    state = replicate(create_train_state(model, variables, tx), mesh)
    train = make_train_step(model, cfg)
    ev = make_eval_step(model, cfg)
    rng = np.random.RandomState(1)
    batch = shard_batch(_rand_batch(rng), mesh)
    state, m = train(state, batch, 1e-2, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    vm = ev(state, batch)
    assert np.isfinite(float(vm["val_loss"]))


def test_frozen_backbone_params_unchanged():
    model = build_model("traditional", 4)
    variables = init_model(model, (32, 32), train=True)
    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1))
    tx = make_optimizer("adam", freeze_prefixes=("inc", "down1", "down2", "down3"))
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, cfg)
    rng = np.random.RandomState(2)
    batch = _rand_batch(rng)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state, _ = step(state, batch, 1e-2, jax.random.PRNGKey(0))
    after = state.params
    # frozen subtree identical
    for key in ("inc", "down1"):
        b = jax.tree_util.tree_leaves(before[key])
        a = jax.tree_util.tree_leaves(after[key])
        for x, y in zip(b, a):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # decoder moved
    moved = any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(before["up1"]),
                        jax.tree_util.tree_leaves(after["up1"])))
    assert moved


def test_deep_supervision_training():
    model = build_model("balancedseg_fpn_sup", 4)
    variables = init_model(model, (32, 32), train=True)
    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1),
                     aux_weights=(1.0, 0.4, 0.3, 0.2))
    tx = make_optimizer("adam")
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, cfg)
    batch = _rand_batch(np.random.RandomState(3))
    state, m = step(state, batch, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.skipif(not os.path.isdir(MEDICAL), reason="medical data absent")
def test_fit_medical_smoke(tmp_path):
    """Two epochs of the real medical recipe (tiny) through fit()."""
    from tpu_unet.train.fit import fit

    ids = sorted(p.split(".")[0] for p in os.listdir(f"{MEDICAL}/Images"))
    cfg = get_preset(
        "medical", model="ultralight", input_shape=(64, 64),
        pretrained_backbone=False, unfreeze_epoch=2, freeze_epoch=0,
        freeze_train=False, freeze_batch_size=8, unfreeze_batch_size=8,
        save_dir=str(tmp_path), eval_flag=True, num_workers=2,
        dataset_path=MEDICAL, save_period=2)
    state = fit(cfg, ids[:16], ids[16:24], base_dir="/", verbose=True,
                max_steps_per_epoch=2)
    assert state is not None
    saved = list(os.listdir(tmp_path))
    assert any(f.endswith(".msgpack") for f in saved), saved


def test_presets_complete():
    assert len(PRESETS) >= 13
    for name, cfg in PRESETS.items():
        assert isinstance(cfg, TrainConfig)
        assert cfg.unfreeze_epoch > cfg.init_epoch


def test_resnet50_train_step_fused_routing():
    """The paired-train gates must route resnet50's deepest decoder stage
    (Cs=1024, Cx=2048 — a Mosaic invalid-input-layout shape on TPU) to
    the XLA composition while the other stages keep their fused kernels.
    Regression test for the round-4 TPU compile crash: training
    unet_resnet50 with the default fusion switches must build and step."""
    import jax
    import numpy as np

    from tpu_unet.core import fusion
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.train.step import (StepConfig, create_train_state,
                                     make_optimizer, make_train_step)

    fusion.set_paired_train(True)
    fusion.set_fused_decoder(True)
    try:
        model = build_model("unet_resnet50", 4)
        v = init_model(model, (64, 64), train=True)
        cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1),
                         use_dice=True)
        state = create_train_state(model, v, make_optimizer("adam"))
        step = make_train_step(model, cfg)
        rng = np.random.RandomState(0)
        batch = {
            "image": rng.randint(0, 255, (2, 64, 64, 3)).astype("uint8"),
            "label": rng.randint(0, 4, (2, 64, 64)).astype("int32"),
        }
        state, m = step(state, batch, 1e-4, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
    finally:
        fusion.set_paired_train(None)
        fusion.set_fused_decoder(None)
