"""WandbLogger wiring, assertable without wandb installed: a fake wandb
module records init/log/save calls (the reference's per-iteration +
per-epoch logging and checkpoint saves, utils/utils_fit.py:363-372,
:419-427, :458-471)."""
import sys
import types

import numpy as np
import pytest


class _FakeRun:
    def __init__(self):
        self.finished = False

    def finish(self):
        self.finished = True


def _fake_wandb():
    mod = types.ModuleType("wandb")
    mod.calls = {"init": [], "log": [], "save": []}

    def init(**kw):
        mod.calls["init"].append(kw)
        return _FakeRun()

    def log(d):
        mod.calls["log"].append(dict(d))

    def save(path):
        mod.calls["save"].append(path)

    mod.init, mod.log, mod.save = init, log, save
    return mod


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = _fake_wandb()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_logger_records_through_fake(fake_wandb):
    from tpu_unet.train.wandb_logging import WandbLogger

    lg = WandbLogger(project="p", name="n", config={"lr": 1e-4})
    assert lg.active
    assert fake_wandb.calls["init"][0]["project"] == "p"
    lg.log_step(3, loss=0.5, f_score=0.9, lr=1e-4)
    lg.log_epoch(1, loss=0.4, val_loss=0.6, lr=1e-4)
    lg.save_checkpoint("/tmp/ck.msgpack")
    lg.finish()
    steps = [d for d in fake_wandb.calls["log"] if "step" in d]
    epochs = [d for d in fake_wandb.calls["log"] if "epoch" in d]
    assert steps == [{"loss": 0.5, "f_score": 0.9, "lr": 1e-4, "step": 3}]
    assert epochs == [{"loss": 0.4, "val_loss": 0.6, "lr": 1e-4, "epoch": 1}]
    assert fake_wandb.calls["save"] == ["/tmp/ck.msgpack"]


def test_logger_noops_without_wandb(monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> TypeError
    from tpu_unet.train.wandb_logging import WandbLogger

    lg = WandbLogger()
    assert not lg.active
    lg.log_step(0, loss=1.0)
    lg.log_epoch(0, loss=1.0)
    lg.save_checkpoint("x")
    lg.finish()


def test_fit_drives_logger(fake_wandb, tmp_path):
    """fit() must emit per-step AND per-epoch metrics and save checkpoints
    through the logger (the fit_one_epoch_use_wandb contract)."""
    import os

    MEDICAL = "/root/reference/Medical_Datasets"
    if not os.path.isdir(MEDICAL):
        pytest.skip("medical data absent")
    from tpu_unet.configs.presets import get_preset
    from tpu_unet.train.fit import fit
    from tpu_unet.train.wandb_logging import WandbLogger

    cfg = get_preset(
        "medical", model="ultralight", input_shape=(64, 64),
        pretrained_backbone=False, freeze_train=False, freeze_epoch=0,
        unfreeze_epoch=1, freeze_batch_size=8, unfreeze_batch_size=8,
        save_dir=str(tmp_path), save_period=1, eval_flag=False,
        num_workers=2, dataset_path=MEDICAL)
    ids = sorted((p.split(".")[0] for p in os.listdir(f"{MEDICAL}/Images")),
                 key=int)[:16]
    lg = WandbLogger(project="test")
    fit(cfg, ids, [], base_dir="/", max_steps_per_epoch=2, verbose=False,
        wandb_logger=lg)
    steps = [d for d in fake_wandb.calls["log"] if "step" in d]
    epochs = [d for d in fake_wandb.calls["log"] if "epoch" in d]
    assert len(steps) == 2 and all(np.isfinite(d["loss"]) for d in steps)
    assert len(epochs) == 1
    assert any(p.endswith(".msgpack") for p in fake_wandb.calls["save"])
