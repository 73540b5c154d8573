"""Training callbacks: loss history, periodic mIoU eval, early stopping.

Parity targets (reference: utils/callbacks.py):
- LossHistory   :175-242 — per-epoch train/val loss → epoch_loss.txt /
                epoch_val_loss.txt + loss curve PNG (+ TB scalars if
                tensorboard is importable)
- EvalCallback  :244-530 — periodic val-set mIoU through the full predict
                pipeline → epoch_miou.txt + per-class IoU curves.  Ours
                runs the confusion matrix on device (no PNG round-trip)
                and takes the data root from config instead of the
                reference's hardcoded DataB//absolute paths (:381-397).
- EarlyStopping :30-171 — val-loss plateau halt with best-state restore.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np


class LossHistory:
    def __init__(self, log_dir: str):
        ts = time.strftime("loss_%Y_%m_%d_%H_%M_%S")
        self.log_dir = os.path.join(log_dir, ts)
        os.makedirs(self.log_dir, exist_ok=True)
        self.losses, self.val_losses = [], []
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(self.log_dir)
        except Exception:
            pass

    def append(self, epoch: int, loss: float, val_loss: Optional[float] = None):
        self.losses.append(float(loss))
        with open(os.path.join(self.log_dir, "epoch_loss.txt"), "a") as f:
            f.write(f"{loss}\n")
        if val_loss is not None:
            self.val_losses.append(float(val_loss))
            with open(os.path.join(self.log_dir, "epoch_val_loss.txt"), "a") as f:
                f.write(f"{val_loss}\n")
        if self._writer is not None:
            self._writer.add_scalar("loss", loss, epoch)
            if val_loss is not None:
                self._writer.add_scalar("val_loss", val_loss, epoch)
        self.plot()

    def plot(self):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        n = range(len(self.losses))
        plt.figure()
        plt.plot(n, self.losses, "red", linewidth=2, label="train loss")
        if self.val_losses:
            plt.plot(n, self.val_losses, "coral", linewidth=2, label="val loss")
        if len(self.losses) >= 25:
            try:
                from scipy.signal import savgol_filter

                num = 5 if len(self.losses) < 25 else 15
                plt.plot(n, savgol_filter(self.losses, num, 3), "green",
                         linestyle="--", linewidth=2, label="smooth train loss")
            except Exception:
                pass
        plt.grid(True)
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.legend(loc="upper right")
        plt.savefig(os.path.join(self.log_dir, "epoch_loss.png"))
        plt.close("all")


class MIoUEvalCallback:
    """Periodic validation mIoU via the device-side confusion matrix
    (replaces utils/callbacks.py:378-530's PNG-file round-trip).

    Prediction comes from either a ``predict_fn`` (uint8 HWC image → int
    mask) or a ``model`` + the per-epoch ``variables`` that fit() passes to
    ``on_epoch_end`` — the latter is how eval-during-training is wired by
    default (reference: train.py:445-446).
    """

    def __init__(self, predict_fn=None, dataset=None, num_classes: int = 21,
                 log_dir: str = "logs", period: int = 1,
                 max_images: Optional[int] = None, model=None,
                 name_classes: Optional[list] = None, batch_size: int = 16):
        if predict_fn is None and model is None:
            raise ValueError("need predict_fn or model")
        self.predict_fn = predict_fn          # (uint8 HWC image) → int mask
        self.model = model
        self.dataset = dataset
        self.num_classes = num_classes
        self.log_dir = log_dir
        self.period = period
        self.max_images = max_images
        self.name_classes = name_classes
        # model path runs batched (the eval dataset letterboxes every image
        # to input_shape, so one fixed batch shape covers the whole set;
        # the tail batch is padded by repetition). VOC-scale eval during
        # training is ~batch_size× fewer dispatches than the reference's
        # per-image loop (utils/callbacks.py:388-401).
        self.batch_size = batch_size
        self.batches_run = 0                  # diagnostics / tests
        self.mious = []
        self.epochs = []
        self.class_ious = []                  # per-eval per-class IoU rows
        self._jitted = None
        os.makedirs(log_dir, exist_ok=True)

    def _model_predict_batch(self, variables, imgs):
        """uint8 (B,H,W,3) → int masks (B,H,W), one jitted dispatch."""
        if self._jitted is None:
            import jax
            import jax.numpy as jnp

            def f(v, x):
                logits = self.model.apply(v, x.astype(jnp.float32) / 255.0,
                                          False)
                if isinstance(logits, (tuple, list)):  # deep supervision
                    logits = logits[0]
                return jnp.argmax(logits, axis=-1)

            self._jitted = jax.jit(f)
        self.batches_run += 1
        return np.asarray(self._jitted(variables, imgs))

    def on_epoch_end(self, epoch: int, variables=None) -> Optional[float]:
        if (epoch + 1) % self.period:
            return None
        from tpu_unet.eval.metrics import confusion_matrix, per_class_iou

        hist = np.zeros((self.num_classes, self.num_classes), np.int64)
        n = len(self.dataset)
        if self.max_images:
            n = min(n, self.max_images)
        if self.predict_fn is not None:
            for i in range(n):
                img, lbl = self.dataset.__getitem__(i)
                pred = self.predict_fn(img)
                hist += np.asarray(
                    confusion_matrix(lbl, pred, self.num_classes))
        else:
            if variables is None:
                raise ValueError("model-based MIoUEvalCallback needs "
                                 "on_epoch_end(epoch, variables)")
            bs = max(1, self.batch_size)
            for start in range(0, n, bs):
                idx = list(range(start, min(start + bs, n)))
                samples = [self.dataset.__getitem__(i) for i in idx]
                imgs = np.stack([np.asarray(s[0], np.uint8)
                                 for s in samples])
                if len(idx) < bs:  # pad tail to the compiled batch shape
                    reps = bs - len(idx)
                    imgs = np.concatenate(
                        [imgs, np.repeat(imgs[:1], reps, axis=0)])
                preds = self._model_predict_batch(variables, imgs)
                for (_, lbl), pred in zip(samples, preds):
                    hist += np.asarray(
                        confusion_matrix(lbl, pred, self.num_classes))
        ious = np.asarray(per_class_iou(hist), np.float64)
        miou = float(np.nanmean(ious))
        self.mious.append(miou)
        self.epochs.append(epoch)
        self.class_ious.append(ious)
        with open(os.path.join(self.log_dir, "epoch_miou.txt"), "a") as f:
            f.write(f"{miou}\n")
        print(f"epoch {epoch}: val mIoU {100 * miou:.2f} "
              f"(per-class {[f'{100 * x:.1f}' for x in ious]})")
        self.plot()
        return miou

    def plot(self):
        """mIoU + per-class IoU training curves (reference:
        utils/callbacks.py:464-498)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        plt.figure()
        plt.plot(self.epochs, self.mious, "red", linewidth=2, label="mIoU")
        plt.grid(True)
        plt.xlabel("Epoch")
        plt.ylabel("mIoU")
        plt.title("Validation mIoU")
        plt.legend(loc="lower right")
        plt.savefig(os.path.join(self.log_dir, "epoch_miou.png"))
        plt.close("all")

        rows = np.stack(self.class_ious)     # (evals, classes)
        plt.figure()
        for c in range(rows.shape[1]):
            label = (self.name_classes[c] if self.name_classes
                     else f"class {c}")
            plt.plot(self.epochs, rows[:, c], linewidth=1.5, label=label)
        plt.grid(True)
        plt.xlabel("Epoch")
        plt.ylabel("IoU")
        plt.title("Per-class validation IoU")
        plt.legend(loc="lower right", fontsize="small")
        plt.savefig(os.path.join(self.log_dir, "epoch_class_iou.png"))
        plt.close("all")


class EarlyStopping:
    """Val-loss plateau halt (reference: utils/callbacks.py:30-171)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0,
                 mode: str = "min"):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best = None
        self.counter = 0
        self.stopped = False
        self.best_state = None

    def __call__(self, metric: float, state=None) -> bool:
        improved = (
            self.best is None
            or (self.mode == "min" and metric < self.best - self.min_delta)
            or (self.mode == "max" and metric > self.best + self.min_delta)
        )
        if improved:
            self.best = metric
            self.counter = 0
            if state is not None:
                # state may be a thunk so the (host-copy) snapshot is only
                # materialized on improvement
                self.best_state = state() if callable(state) else state
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.stopped = True
        return self.stopped

    def load_best_model(self):
        """reference: utils/callbacks.py:151-167."""
        return self.best_state
