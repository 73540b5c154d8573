"""The full canonical recipe's freeze→unfreeze seam (VERDICT r2 next #3).

Drives ``fit()`` with ``freeze_train=True`` through the in-run transition —
optimizer rebuild, batch-size + LR recompute, loader rebuild, recompile
(reference: train.py:453-492) — with ImageNet-pretrained backbone ingestion
and the auto-wired eval callback, on synthetic VOC-layout data with
``unet_resnet50`` at small resolution; then resumes *across* the
transition from the frozen-phase checkpoint.
"""
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

import jax

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    """Synthetic VOC2012-layout dataset: 16 jpgs + class-index pngs."""
    root = tmp_path_factory.mktemp("vocdata")
    jdir = root / "VOC2012" / "JPEGImages"
    sdir = root / "VOC2012" / "SegmentationClass"
    jdir.mkdir(parents=True)
    sdir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    ids = [f"im{i:03d}" for i in range(16)]
    for name in ids:
        img = rng.randint(0, 255, size=(48, 64, 3)).astype(np.uint8)
        lbl = rng.randint(0, 21, size=(48, 64)).astype(np.uint8)
        lbl[:4, :4] = 255  # VOC ignore border
        Image.fromarray(img).save(jdir / f"{name}.jpg")
        Image.fromarray(lbl, mode="L").save(sdir / f"{name}.png")
    return str(root), ids


@pytest.fixture(scope="module")
def resnet_ckpt(tmp_path_factory):
    """torchvision-layout ResNet50 ImageNet state_dict (reference encoder's
    module names match torchvision exactly, nets/resnet.py:178-181)."""
    from nets.resnet import resnet50 as TorchResNet

    tm = TorchResNet(pretrained=False).eval()
    sd = {k: v.detach() for k, v in tm.state_dict().items()}
    path = tmp_path_factory.mktemp("weights") / "resnet50-19c8e357.pth"
    torch.save(sd, str(path))
    return str(path)


def _cfg(save_dir, voc_path, resnet_ckpt, **over):
    from tpu_unet.configs.presets import get_preset

    base = dict(
        model="unet_resnet50", num_classes=21, input_shape=(64, 64),
        pretrained_backbone=True, pretrained_path=resnet_ckpt,
        # real batch-size recompute at the transition; both sizes must
        # divide the 8-device test mesh
        freeze_train=True, init_epoch=0, freeze_epoch=1, unfreeze_epoch=2,
        freeze_batch_size=16, unfreeze_batch_size=8,
        save_dir=str(save_dir), save_period=1, eval_flag=True,
        eval_period=1, num_workers=2, dataset_path=voc_path,
    )
    base.update(over)
    return get_preset("voc_resnet50", **base)


def test_freeze_unfreeze_transition_and_resume(tmp_path, voc_root, resnet_ckpt):
    from tpu_unet.infer.convert import load_pretrained_backbone
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.train.fit import fit

    voc_path, ids = voc_root
    cfg = _cfg(tmp_path, voc_path, resnet_ckpt)
    assert cfg.freeze_train and cfg.freeze_epoch == 1 and cfg.unfreeze_epoch == 2

    # the pretrained backbone values the frozen phase must preserve
    model = build_model("unet_resnet50", 21)
    init_vars = init_model(model, (64, 64), seed=cfg.seed, train=True)
    pretrained = load_pretrained_backbone(init_vars, resnet_ckpt,
                                          "unet_resnet50")
    bb0 = jax.tree_util.tree_map(np.asarray, pretrained["params"]["resnet"])

    state = fit(cfg, ids, ids[:4], base_dir="/", verbose=True,
                max_steps_per_epoch=2, auto_eval_callback=True)
    assert state is not None

    # trainable-set change across the transition: the backbone was frozen
    # for epoch 0 but trained in epoch 1, so it must have MOVED overall...
    bb_final = jax.tree_util.tree_map(np.asarray, state.params)["resnet"]
    moved = any(not np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(bb0), jax.tree_util.tree_leaves(bb_final)))
    assert moved, "backbone never unfroze"

    # ...while the frozen-phase checkpoint (ep001) still carries the
    # pretrained backbone verbatim — epoch 0 did not touch it
    from tpu_unet.train.checkpoint import load_any

    ep1 = [f for f in os.listdir(tmp_path) if f.startswith("ep001")]
    assert ep1, os.listdir(tmp_path)
    ck = load_any(os.path.join(tmp_path, ep1[0]), "unet_resnet50")
    bb_ck = ck["params"]["resnet"]
    for a, b in zip(jax.tree_util.tree_leaves(bb0),
                    jax.tree_util.tree_leaves(bb_ck)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # loss continuity: LossHistory recorded finite losses for both phases
    log_dirs = [d for d in os.listdir(tmp_path) if d.startswith("loss_")]
    assert log_dirs, os.listdir(tmp_path)
    loss_file = os.path.join(tmp_path, log_dirs[0], "epoch_loss.txt")
    losses = [float(x) for x in open(loss_file).read().split()]
    assert len(losses) == 2 and np.isfinite(losses).all(), losses
    # sanity on scale: phase-2 loss within 10x of phase-1 (a recompile or
    # optimizer-rebuild bug at the seam shows up as an explosion)
    assert losses[1] < 10 * losses[0] + 1.0, losses

    # eval callback ran (auto-wired, VERDICT r1 gap)
    miou_logs = []
    for d in (tmp_path, os.path.join(tmp_path, log_dirs[0])):
        miou_logs += [os.path.join(r, f) for r, _, fs in os.walk(d)
                      for f in fs if f == "epoch_miou.txt"]
    assert miou_logs, "MIoUEvalCallback produced no epoch_miou.txt"

    # resume ACROSS the transition: restart from the frozen-phase ckpt at
    # init_epoch=1 → fit starts directly in the unfrozen phase
    resume_dir = tmp_path / "resume"
    resume_dir.mkdir()
    cfg2 = _cfg(resume_dir, voc_path, resnet_ckpt, init_epoch=1,
                pretrained_backbone=False,
                model_path=os.path.join(tmp_path, ep1[0]))
    state2 = fit(cfg2, ids, ids[:4], base_dir="/", verbose=True,
                 max_steps_per_epoch=2)
    bb2 = jax.tree_util.tree_map(np.asarray, state2.params)["resnet"]
    moved2 = any(not np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(bb_ck), jax.tree_util.tree_leaves(bb2)))
    assert moved2, "resumed run at init_epoch=1 did not train the backbone"
