"""The full training recipe — the TPU counterpart of train.py:40-506.

One function drives what the reference spreads over train.py,
<Variant>_Train.py clones and utils/utils_fit.py:
seed → mesh → model build/init/partial-load → two-phase freeze/unfreeze
schedule with batch-size & LR recompute at the transition → per-epoch
cos/step LR → jitted SPMD train/val epochs → callbacks + checkpoints.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.configs.presets import TrainConfig
from tpu_unet.core.mesh import create_mesh, replicate, shard_batch
from tpu_unet.data.datasets import (DefectSegDataset, HeavyAugDataset,
                                    MedicalSegDataset, VOC2007SegDataset,
                                    VOCSegDataset, read_split)
from tpu_unet.data.loader import Loader
from tpu_unet.models.registry import build_model, init_model
from tpu_unet.train.callbacks import EarlyStopping, LossHistory
from tpu_unet.train.checkpoint import (load_any, partial_load,
                                       save_full_state, save_variables)
from tpu_unet.train.schedules import adaptive_lr, get_lr_scheduler
from tpu_unet.train.step import (FREEZE_PREFIXES, StepConfig, TrainState,
                                 create_train_state, make_eval_step,
                                 make_optimizer, make_train_step)

DATASETS = {
    "voc": VOCSegDataset,
    "voc2007": VOC2007SegDataset,
    "medical": MedicalSegDataset,
    "defect": DefectSegDataset,
    "heavy": HeavyAugDataset,
}


def reinit_weights(variables: dict, seed: int = 0, init_type: str = "normal",
                   gain: float = 0.02) -> dict:
    """weights_init parity (reference: nets/unet_training.py:58-76):
    conv kernels ~ chosen init, BN scale ~ N(1, 0.02), biases zero."""
    rng = np.random.RandomState(seed)

    def visit(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v) >= {"scale", "bias"} and "kernel" not in v:  # BN
                    out[k] = dict(v)
                    out[k]["scale"] = np.asarray(
                        rng.normal(1.0, 0.02, np.shape(v["scale"])), np.float32)
                    out[k]["bias"] = np.zeros_like(np.asarray(v["bias"]))
                else:
                    out[k] = visit(v)
            else:
                out[k] = v
        return out

    def init_kernel(shape):
        if init_type == "normal":
            return rng.normal(0.0, gain, shape)
        if init_type == "kaiming":
            fan_in = int(np.prod(shape[:-1]))
            return rng.normal(0.0, np.sqrt(2.0 / fan_in), shape)
        if init_type == "xavier":
            fan_in = int(np.prod(shape[:-1]))
            fan_out = int(np.prod(shape[:-2])) * shape[-1]
            std = gain * np.sqrt(2.0 / (fan_in + fan_out))
            return rng.normal(0.0, std, shape)
        raise NotImplementedError(init_type)

    def visit_kernels(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "kernel" in v:
                    out[k] = dict(v)
                    kern = np.asarray(v["kernel"])
                    if kern.ndim == 4:  # conv only, like the reference
                        out[k]["kernel"] = np.asarray(
                            init_kernel(kern.shape), np.float32)
                    if "bias" in v:
                        out[k]["bias"] = np.zeros_like(np.asarray(v["bias"]))
                    for kk, vv in v.items():
                        if kk not in ("kernel", "bias"):
                            out[k][kk] = vv
                else:
                    out[k] = visit_kernels(v)
            else:
                out[k] = v
        return out

    new = dict(variables)
    new["params"] = visit_kernels(visit(variables["params"]))
    return new


def resolve_pretrained_path(cfg: TrainConfig, base_dir: str = ".") -> str:
    """Locate the torchvision ImageNet checkpoint for ``cfg.model``, failing
    loudly when absent — the reference auto-downloads (train.py:271-277);
    this environment has no egress, so the file must be provided locally."""
    from tpu_unet.infer.convert import BACKBONE_FOR_MODEL, TORCHVISION_FILES

    if cfg.model not in BACKBONE_FOR_MODEL:
        raise KeyError(
            f"pretrained_backbone=True but model {cfg.model!r} has no "
            f"ImageNet-pretrainable backbone (only "
            f"{sorted(BACKBONE_FOR_MODEL)})")
    if cfg.pretrained_path:
        candidates = [cfg.pretrained_path]
    else:
        fname = TORCHVISION_FILES[BACKBONE_FOR_MODEL[cfg.model]]
        dirs = []
        if os.environ.get("TPU_UNET_PRETRAINED_DIR"):
            dirs.append(os.environ["TPU_UNET_PRETRAINED_DIR"])
        dirs.append(os.path.join(base_dir, "model_data"))
        candidates = [os.path.join(d, fname) for d in dirs]
    for path in candidates:
        if os.path.isfile(path):
            return path
    raise FileNotFoundError(
        f"pretrained_backbone=True but no ImageNet checkpoint found at "
        f"{candidates} — download the torchvision file, place it there or "
        f"set TrainConfig.pretrained_path / $TPU_UNET_PRETRAINED_DIR, or "
        f"set pretrained_backbone=False to train from random init.")


def make_datasets(cfg: TrainConfig, base_dir: str, train_ids, val_ids,
                  seed: int):
    ds_cls = DATASETS[cfg.dataset]
    root = os.path.join(base_dir, cfg.dataset_path) \
        if not os.path.isabs(cfg.dataset_path) else cfg.dataset_path
    train_ds = ds_cls(train_ids, cfg.input_shape, cfg.num_classes,
                      train=True, dataset_path=root, seed=seed)
    val_ds = ds_cls(val_ids, cfg.input_shape, cfg.num_classes,
                    train=False, dataset_path=root, seed=seed)
    return train_ds, val_ds


def fit(cfg: TrainConfig, train_ids, val_ids, base_dir: str = ".",
        mesh=None, max_steps_per_epoch: Optional[int] = None,
        verbose: bool = True, wandb_logger=None, miou_callback=None,
        auto_eval_callback: bool = False):
    """Run the full two-phase training; returns the final TrainState.

    ``wandb_logger``: optional tpu_unet.train.wandb_logging.WandbLogger
    (the fit_one_epoch_use_wandb counterpart, utils/utils_fit.py:286-471).
    ``miou_callback``: optional tpu_unet.train.callbacks.MIoUEvalCallback
    (the EvalCallback counterpart, utils/callbacks.py:244-530).
    ``auto_eval_callback``: build an MIoUEvalCallback over the val set,
    honoring cfg.eval_period — the reference's default-on EvalCallback
    wiring (train.py:445-446).
    """
    if mesh is None:
        mesh = create_mesh()
    n_dev = int(np.prod(mesh.devices.shape))

    model = build_model(cfg.model, cfg.num_classes)
    variables = init_model(model, cfg.input_shape, seed=cfg.seed, train=True)
    if not cfg.pretrained_backbone and not cfg.model_path:
        variables = reinit_weights(variables, seed=cfg.seed)
    if cfg.pretrained_backbone:
        from tpu_unet.infer.convert import load_pretrained_backbone

        path = resolve_pretrained_path(cfg, base_dir)
        if verbose:
            print(f"Loading ImageNet backbone weights from {path}.")
        variables = load_pretrained_backbone(variables, path, cfg.model)
    resumed = None  # full-state resume payload (opt_state/epoch/best_val)
    if cfg.model_path:
        loaded = load_any(cfg.model_path, cfg.model)
        variables = {
            "params": partial_load(variables["params"],
                                   loaded.get("params", {}), verbose),
            "batch_stats": partial_load(variables.get("batch_stats", {}),
                                        loaded.get("batch_stats", {}), verbose),
        }
        if cfg.resume:
            if "opt_state" not in loaded:
                raise ValueError(
                    f"resume=True but {cfg.model_path} is a weights-only "
                    f"checkpoint (no opt_state) — set resume=False and "
                    f"init_epoch by hand for a weights-only warm start")
            resumed = loaded

    from tpu_unet.core.precision import resolve

    step_cfg = StepConfig(
        num_classes=cfg.num_classes,
        cls_weights=tuple(cfg.resolved_cls_weights()),
        use_focal=cfg.focal_loss,
        use_dice=cfg.dice_loss,
        aux_weights=tuple(cfg.aux_weights),
        compute_dtype=resolve(cfg.fp16).compute_dtype,
    )
    train_step = make_train_step(model, step_cfg)
    eval_step = make_eval_step(model, step_cfg)

    train_ds, val_ds = make_datasets(cfg, base_dir, train_ids, val_ids, cfg.seed)
    loss_history = LossHistory(cfg.save_dir) if verbose else None
    if (auto_eval_callback and miou_callback is None and cfg.eval_flag
            and len(val_ds) and jax.process_index() == 0):
        from tpu_unet.train.callbacks import MIoUEvalCallback

        miou_callback = MIoUEvalCallback(
            dataset=val_ds, num_classes=cfg.num_classes, model=model,
            log_dir=loss_history.log_dir if loss_history else cfg.save_dir,
            period=cfg.eval_period)
    stopper = EarlyStopping(cfg.patience) if cfg.patience else None
    root_key = jax.random.PRNGKey(cfg.seed)

    state = None
    best_val = np.inf
    frozen_now = None
    epoch = cfg.init_epoch
    if resumed is not None:
        epoch = int(resumed["epoch"])
        best_val = float(resumed.get("best_val", np.inf))
        if epoch >= cfg.unfreeze_epoch:
            raise ValueError(
                f"resume checkpoint {cfg.model_path!r} was saved at epoch "
                f"{epoch} >= unfreeze_epoch={cfg.unfreeze_epoch} — training "
                f"is already complete.  Raise unfreeze_epoch to continue, or "
                f"serve the weights directly (resume=False)")
        if verbose:
            print(f"Resuming full training state at epoch {epoch} "
                  f"(best_val={best_val:.4f}).")
    while epoch < cfg.unfreeze_epoch:
        freeze_phase = cfg.freeze_train and epoch < cfg.freeze_epoch
        if freeze_phase != frozen_now:
            # (re)build optimizer + LR schedule for this phase
            # (reference: train.py:389-418, :458-492)
            frozen_now = freeze_phase
            batch_size = (cfg.freeze_batch_size if freeze_phase
                          else cfg.unfreeze_batch_size)
            init_lr_fit, min_lr_fit = adaptive_lr(
                cfg.init_lr, cfg.min_lr, batch_size, cfg.optimizer_type)
            lr_sched = get_lr_scheduler(cfg.lr_decay_type, init_lr_fit,
                                        min_lr_fit, cfg.unfreeze_epoch)
            prefixes = FREEZE_PREFIXES.get(cfg.model, ()) if freeze_phase else ()
            tx = make_optimizer(cfg.optimizer_type, cfg.momentum,
                                cfg.weight_decay, prefixes)
            if state is None:
                state = create_train_state(model, variables, tx)
                if resumed is not None:
                    from tpu_unet.train.checkpoint import restore_opt_state

                    try:
                        state = state.replace(
                            opt_state=restore_opt_state(state.opt_state,
                                                        resumed["opt_state"]))
                    except (KeyError, ValueError) as e:
                        # checkpoint saved in the OTHER freeze phase: the
                        # trainable mask (and hence opt-state tree) differs.
                        # Warm-start from the weights with fresh moments
                        # rather than dying at a natural interruption point
                        # (the freeze→unfreeze boundary, train.py:458-471)
                        print("warning: resume opt_state does not match this "
                              f"phase's optimizer structure ({e}); continuing "
                              "with fresh optimizer moments (weights + epoch "
                              "are restored)")
                    state = state.replace(
                        step=jnp.asarray(int(resumed.get("step", 0)),
                                         jnp.int32))
                    resumed = None
            else:
                state = state.replace(tx=tx, opt_state=tx.init(state.params))
            state = replicate(state, mesh)
            train_loader = Loader(train_ds, batch_size, shuffle=True,
                                  seed=cfg.seed, num_workers=cfg.num_workers,
                                  process_index=jax.process_index(),
                                  process_count=jax.process_count())
            # small validation sets get a shrunk (device-aligned) batch so
            # they still produce at least one full batch
            val_bs = batch_size
            if len(val_ds) < batch_size:
                val_bs = (len(val_ds) // n_dev) * n_dev
            if val_bs == 0 and len(val_ds) and verbose:
                print(f"warning: val set of {len(val_ds)} images cannot fill "
                      f"even one {n_dev}-device batch — validation loss and "
                      f"best-checkpoint tracking are disabled this phase")
            val_loader = Loader(val_ds, val_bs, shuffle=False,
                                seed=cfg.seed, num_workers=cfg.num_workers,
                                process_index=jax.process_index(),
                                process_count=jax.process_count()) \
                if val_bs > 0 else None

        lr = lr_sched(epoch)
        train_loader.set_epoch(epoch)
        tloss, tf, nb = 0.0, 0.0, 0
        for batch in train_loader:
            batch = shard_batch(batch, mesh)
            key = jax.random.fold_in(root_key, epoch * 100_003 + nb)
            state, metrics = train_step(state, batch, lr, key)
            step_loss = float(metrics["loss"])
            step_f = float(metrics["f_score"])
            tloss += step_loss
            tf += step_f
            nb += 1
            if wandb_logger is not None and jax.process_index() == 0:
                # per-iteration metrics (reference: utils/utils_fit.py:363-372)
                wandb_logger.log_step(int(state.step), loss=step_loss,
                                      f_score=step_f, lr=lr)
            if max_steps_per_epoch and nb >= max_steps_per_epoch:
                break
        tloss /= max(nb, 1)

        vloss, nvb = 0.0, 0
        if cfg.eval_flag and val_loader is not None:
            for batch in val_loader:
                batch = shard_batch(batch, mesh)
                m = eval_step(state, batch)
                vloss += float(m["val_loss"])
                nvb += 1
                if max_steps_per_epoch and nvb >= max_steps_per_epoch:
                    break
            vloss /= max(nvb, 1)

        if jax.process_index() == 0:
            # logging/printing is governed by verbose; checkpoint
            # persistence is not — silencing output must never lose weights
            if verbose:
                print(f"Epoch {epoch + 1}/{cfg.unfreeze_epoch}: lr {lr:.3e} "
                      f"loss {tloss:.4f} val_loss {vloss:.4f}")
                if loss_history:
                    loss_history.append(epoch, tloss, vloss if nvb else None)
            if wandb_logger is not None:
                wandb_logger.log_epoch(epoch, loss=tloss, val_loss=vloss,
                                       lr=lr)
            variables_now = {"params": state.params,
                             "batch_stats": state.batch_stats}
            if miou_callback is not None:
                miou_callback.on_epoch_end(epoch, variables_now)
            # checkpoint cadence mirrors utils/utils_fit.py:153-172; the
            # periodic and last checkpoints carry FULL state (opt_state +
            # epoch + best_val) for true resume; best stays weights-only
            # (it exists to be served)
            if nvb and vloss < best_val:
                best_val = vloss
                save_variables(os.path.join(cfg.save_dir,
                                            "best_epoch_weights.msgpack"),
                               variables_now)
            if (epoch + 1) % cfg.save_period == 0 or epoch + 1 == cfg.unfreeze_epoch:
                ck_path = os.path.join(
                    cfg.save_dir,
                    f"ep{epoch + 1:03d}-loss{tloss:.3f}-val_loss{vloss:.3f}.msgpack")
                save_full_state(ck_path, state, epoch + 1, best_val)
                if wandb_logger is not None:
                    # reference: utils/utils_fit.py:458-471 wandb.save
                    wandb_logger.save_checkpoint(ck_path)
            save_full_state(os.path.join(cfg.save_dir,
                                         "last_epoch_weights.msgpack"),
                            state, epoch + 1, best_val)

        # best-state snapshots must be host-resident (the next train step
        # donates, i.e. deletes, the current device buffers) and are only
        # materialized on improvement
        snapshot = (lambda s=state: jax.tree_util.tree_map(
            np.asarray, {"params": s.params, "batch_stats": s.batch_stats}))
        if stopper is not None and nvb and stopper(vloss, snapshot):
            if verbose:
                print(f"early stopping at epoch {epoch + 1}")
            break
        epoch += 1

    return state
