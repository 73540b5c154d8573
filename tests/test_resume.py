"""Checkpoint → resume → inference roundtrip through the public surfaces."""
import os

import numpy as np
import pytest
from PIL import Image

MEDICAL = "/root/reference/Medical_Datasets"
pytestmark = pytest.mark.skipif(not os.path.isdir(MEDICAL),
                                reason="medical data absent")


def _tiny_cfg(tmp_path, **over):
    from tpu_unet.configs.presets import get_preset

    return get_preset(
        "medical", model="ultralight", input_shape=(64, 64),
        pretrained_backbone=False, freeze_train=False, freeze_epoch=0,
        unfreeze_epoch=1, freeze_batch_size=8, unfreeze_batch_size=8,
        save_dir=str(tmp_path), save_period=1, eval_flag=False,
        num_workers=2, dataset_path=MEDICAL, **over)


def test_fit_save_resume_and_wrapper_load(tmp_path):
    from tpu_unet.train.fit import fit

    ids = sorted((p.split(".")[0] for p in os.listdir(f"{MEDICAL}/Images")),
                 key=int)
    cfg = _tiny_cfg(tmp_path)
    fit(cfg, ids[:16], [], base_dir="/", max_steps_per_epoch=1,
        verbose=True)
    ckpt = os.path.join(str(tmp_path), "last_epoch_weights.msgpack")
    assert os.path.exists(ckpt)

    # resume: second fit loads the checkpoint (reference: train.py:288-302)
    cfg2 = _tiny_cfg(tmp_path, model_path=ckpt, init_epoch=0)
    fit(cfg2, ids[:16], [], base_dir="/", max_steps_per_epoch=1,
        verbose=False)

    # the saved checkpoint serves through the public inference wrapper
    from tpu_unet.infer.wrapper import Unet

    u = Unet(model="ultralight", num_classes=2, input_shape=[64, 64],
             model_path=ckpt)
    img = Image.open(f"{MEDICAL}/Images/0.png")
    mask = np.asarray(u.get_miou_png(img))
    assert mask.shape[::-1] == img.size
    assert set(np.unique(mask)) <= {0, 1}


def test_full_state_resume_matches_uninterrupted(tmp_path):
    """An interrupted run resumed from the full-state checkpoint (opt_state
    + epoch + LR phase) must reproduce the uninterrupted run bit-for-bit —
    the guarantee the reference's weights-only manual resume
    (train.py:96-97) cannot give (adam moments are lost there)."""
    import jax

    from tpu_unet.train.fit import fit

    ids = sorted((p.split(".")[0] for p in os.listdir(f"{MEDICAL}/Images")),
                 key=int)[:16]

    def cfg_for(d, **kw):
        kw.setdefault("save_period", 10)
        over = dict(unfreeze_epoch=4)
        over.update(kw)
        base = _tiny_cfg(d)
        import dataclasses
        return dataclasses.replace(base, **over)

    # uninterrupted: 4 epochs
    cfg_a = cfg_for(tmp_path / "a")
    state_a = fit(cfg_a, ids, [], base_dir="/", max_steps_per_epoch=2,
                  verbose=False)

    # interrupted: 2 epochs, then resume for the remaining 2
    cfg_b1 = cfg_for(tmp_path / "b", unfreeze_epoch=2)
    fit(cfg_b1, ids, [], base_dir="/", max_steps_per_epoch=2, verbose=False)
    ckpt = os.path.join(str(tmp_path / "b"), "last_epoch_weights.msgpack")
    cfg_b2 = cfg_for(tmp_path / "b", model_path=ckpt, resume=True)
    state_b = fit(cfg_b2, ids, [], base_dir="/", max_steps_per_epoch=2,
                  verbose=True)

    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state (adam moments) must match too — the whole point of resume
    for a, b in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_rejects_weights_only(tmp_path):
    from tpu_unet.train.checkpoint import save_variables
    from tpu_unet.train.fit import fit

    ids = sorted((p.split(".")[0] for p in os.listdir(f"{MEDICAL}/Images")),
                 key=int)[:16]
    cfg = _tiny_cfg(tmp_path)
    state = fit(cfg, ids, [], base_dir="/", max_steps_per_epoch=1,
                verbose=False)
    weights_only = os.path.join(str(tmp_path), "weights_only.msgpack")
    save_variables(weights_only, {"params": state.params,
                                  "batch_stats": state.batch_stats})
    import dataclasses
    cfg2 = dataclasses.replace(_tiny_cfg(tmp_path), model_path=weights_only,
                               resume=True, unfreeze_epoch=2)
    with pytest.raises(ValueError, match="weights-only"):
        fit(cfg2, ids, [], base_dir="/", max_steps_per_epoch=1,
            verbose=False)
