"""The jitted train/eval steps — SPMD data-parallel over a device mesh.

TPU-native replacement for the reference's training core
(utils/utils_fit.py:26-151 + DDP/AMP machinery, train.py:254-350):

- one ``jit``-compiled step; the batch is sharded on the mesh's ``data``
  axis, params are replicated; XLA inserts the gradient all-reduce over ICI
  (the NCCL all-reduce in DDP, train.py:346)
- BatchNorm batch stats are computed over the *global* sharded batch by
  GSPMD — SyncBatchNorm (train.py:335-338) for free
- bf16 compute policy replaces AMP GradScaler (train.py:325-329) — the MXU
  accumulates in f32, so no loss scaling
- /255 normalization + one-hot expansion run on device inside the step
  instead of in the host collate fn (utils/dataloader.py:40-52)
- the learning rate enters the step as a scalar argument, so the reference's
  epoch-granular ``set_optimizer_lr`` (nets/unet_training.py:110-113) is
  just "call the step with this epoch's lr" — no recompile
- freeze/unfreeze phases (train.py:453-492) are an optax.multi_transform
  mask over the backbone subtree — a new step is compiled per phase, exactly
  mirroring the reference's DataLoader/optimizer rebuild at the transition
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpu_unet.core import fusion
from tpu_unet.train.losses import ce_loss, dice_loss, f_score, focal_loss

# top-level param keys that constitute the "backbone" for freeze phases
# (reference freeze_backbone methods, e.g. nets/unet.py:80-94,
#  nets/TraditionalUnet.py:95-115, nets/LightWeightUnet.py:178-184)
FREEZE_PREFIXES = {
    "unet_vgg": ("vgg",),
    "unet_resnet50": ("resnet",),
    "self_net": ("vgg",),
    "traditional": ("inc", "down1", "down2", "down3"),
    "traditional22": ("inc", "down1", "down2", "down3"),
    "lightweight": ("stage1", "stage2", "stage3", "stage4", "stage5"),
}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats, lr):
        """tx yields ascent directions (adam/momentum-scaled grads);
        the final update is ``-lr * u`` — the lr scaling the reference
        applies via param_group['lr']."""
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(optimizer_type: str = "adam", momentum: float = 0.9,
                   weight_decay: float = 0.0,
                   freeze_prefixes: Sequence[str] = ()) -> optax.GradientTransformation:
    """adam(betas=(momentum, .999)) | sgd(nesterov) with torch-style L2
    weight decay added to the raw gradient (reference: train.py:402-405).
    Emits un-negated, lr-free update directions; see
    ``TrainState.apply_gradients``."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if optimizer_type == "adam":
        chain.append(optax.scale_by_adam(b1=momentum, b2=0.999))
    elif optimizer_type == "sgd":
        chain.append(optax.trace(decay=momentum, nesterov=True))
    else:
        raise ValueError(f"unknown optimizer {optimizer_type!r}")
    tx = optax.chain(*chain)
    if freeze_prefixes:
        frozen = tuple(freeze_prefixes)

        def label(params):
            return {k: ("frozen" if k in frozen else "train") for k in params}

        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()},
                                   label)
    return tx


@dataclasses.dataclass(frozen=True)
class StepConfig:
    num_classes: int
    cls_weights: tuple
    use_focal: bool = False
    use_dice: bool = False
    aux_weights: tuple = ()      # () = no deep supervision
    compute_dtype: Any = jnp.float32


def _cast_params(params, compute_dtype):
    """Mixed precision: f32 master params are cast to the compute dtype at
    the jit boundary (the torch-autocast half of AMP — without it, f32
    params promote every conv back to f32: the 512px train step measured
    166 ms/step in f32 vs bf16 compute).  Gradients flow through the cast,
    so optimizer updates stay in f32."""
    if compute_dtype == jnp.float32:
        return params
    return jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype)
        if x.dtype == jnp.float32 else x, params)


def _prepare_batch(batch, num_classes, compute_dtype):
    """uint8 HWC image + int label map → normalized input, target, one-hot."""
    imgs = batch["image"].astype(jnp.float32) / 255.0
    imgs = imgs.astype(compute_dtype)
    target = batch["label"].astype(jnp.int32)
    onehot = jax.nn.one_hot(target, num_classes + 1, dtype=jnp.float32)
    return imgs, target, onehot


def _total_loss(outputs, target, onehot, cfg: StepConfig):
    if not isinstance(outputs, (tuple, list)):
        outputs = (outputs,)
    weights = cfg.aux_weights or (1.0,)
    total = 0.0
    for out, w in zip(outputs, weights):
        out = out.astype(jnp.float32)
        base = (focal_loss if cfg.use_focal else ce_loss)(
            out, target, cfg.cls_weights, cfg.num_classes)
        if cfg.use_dice:
            base = base + dice_loss(out, onehot)
        total = total + w * base
    return total, outputs[0].astype(jnp.float32)


def make_train_step(model, cfg: StepConfig) -> Callable:
    """Returns jitted (state, batch, lr, dropout_key) → (state, metrics)."""
    # The fused Pallas loss covers the CE(+dice) AND focal(+dice)
    # single-output recipes; deep-supervision / resized-logits cases use
    # the jnp path.  Profiled at 512px/bs8: the jnp loss pipeline (3
    # softmaxes, an f32 one-hot megatensor, autodiff backward) costs
    # ~16 ms/step.
    fused_loss_ok = not cfg.aux_weights

    # Canonical UNets additionally fuse the final 1×1 conv INTO the loss
    # kernels (kernels/loss.py::final_ce_dice_loss_grad): the model emits
    # the 64-ch feature map and the logit tensor never exists in HBM.
    # Profiled at 512px/bs8: the XLA final-conv + loss region (conv fwd/
    # dgrad/wgrad + logits/dlogits/label relayouts + loss custom-calls)
    # costs ~17 ms/step.
    from tpu_unet.models.unet import Unet as _CanonicalUnet
    feat_model = (model.clone(features_out=True)
                  if isinstance(model, _CanonicalUnet) else None)

    def train_step(state: TrainState, batch, lr, dropout_key):
        imgs, target, onehot = _prepare_batch(batch, cfg.num_classes,
                                              cfg.compute_dtype)

        def apply_model(params):
            return model.apply(
                {"params": _cast_params(params, cfg.compute_dtype),
                 "batch_stats": state.batch_stats},
                imgs, True, rngs={"dropout": dropout_key},
                mutable=["batch_stats"])

        def loss_fn(params):
            outputs, mut = apply_model(params)
            loss, main = _total_loss(outputs, target, onehot, cfg)
            return loss, (mut["batch_stats"], f_score(main, onehot))

        def fused_loss_fn(params):
            from tpu_unet.kernels.loss import ce_dice_loss_grad

            outputs, mut = apply_model(params)
            out = outputs[0] if isinstance(outputs, (tuple, list)) \
                else outputs
            loss, fs = ce_dice_loss_grad(
                out, target, cfg.cls_weights, cfg.num_classes,
                with_dice=cfg.use_dice, use_focal=cfg.use_focal)
            return loss, (mut["batch_stats"], fs)

        def fused_final_loss_fn(params):
            from tpu_unet.kernels.loss import final_ce_dice_loss_grad

            cast = _cast_params(params, cfg.compute_dtype)
            feats, mut = feat_model.apply(
                {"params": cast, "batch_stats": state.batch_stats},
                imgs, True, rngs={"dropout": dropout_key},
                mutable=["batch_stats"])
            loss, fs = final_ce_dice_loss_grad(
                feats, cast["final"]["kernel"], cast["final"]["bias"],
                target, cfg.cls_weights, cfg.num_classes,
                with_dice=cfg.use_dice)
            return loss, (mut["batch_stats"], fs)

        # TPU-only (core/fusion.py): the kernel is pltpu-flavored — it
        # fails to lower on GPU and interpret mode on CPU is orders of
        # magnitude slower than the jnp path.
        use_fused = (fused_loss_ok and fusion.use_fused_loss()
                     and _fused_shape_ok(
                         model, state, imgs, target, cfg, dropout_key))
        fn = loss_fn
        if use_fused:
            # the final-conv-fused variant implements CE(+dice) only;
            # focal recipes run the logit-level fused kernel
            fn = (fused_final_loss_fn
                  if feat_model is not None and not cfg.use_focal
                  else fused_loss_fn)
        (loss, (new_stats, fs)), grads = jax.value_and_grad(
            fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats, lr)
        metrics = {"loss": loss, "f_score": fs}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def _fused_shape_ok(model, state, imgs, target, cfg, dropout_key):
    """Trace-time check: fused loss needs logits at target resolution.
    Operates purely on ShapeDtypeStructs — no tracer capture."""
    del dropout_key
    sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        {"params": state.params, "batch_stats": state.batch_stats})
    img_sds = jax.ShapeDtypeStruct(imgs.shape, imgs.dtype)
    try:
        shapes = jax.eval_shape(
            lambda v, im: model.apply(
                v, im, True, rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])[0],
            sds, img_sds)
        out = shapes[0] if isinstance(shapes, (tuple, list)) else shapes
        return tuple(out.shape[1:3]) == tuple(target.shape[1:3])
    except Exception:
        return False


def make_eval_step(model, cfg: StepConfig) -> Callable:
    """Jitted validation step: loss + f_score, running-stat BN
    (reference: utils/utils_fit.py:111-151)."""

    def eval_step(state: TrainState, batch):
        imgs, target, onehot = _prepare_batch(batch, cfg.num_classes,
                                              cfg.compute_dtype)
        outputs = model.apply(
            {"params": _cast_params(state.params, cfg.compute_dtype),
             "batch_stats": state.batch_stats},
            imgs, False)
        loss, main = _total_loss(outputs, target, onehot,
                                 dataclasses.replace(cfg, aux_weights=()))
        return {"val_loss": loss, "val_f_score": f_score(main, onehot)}

    return jax.jit(eval_step)


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
