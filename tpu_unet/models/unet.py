"""Canonical UNet: VGG16 / ResNet50 encoder + UnetUp decoder.

Parity target: nets/unet.py:24-94 (class Unet) and self_net().py:23-72
(Unet_vgg / self_net — the VGG variant that always applies the ×2 up_conv
head).  Output = raw logits NHWC at input resolution for VGG, and after the
extra ×2 up_conv for ResNet50.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.models.backbones import VGG16, ResNet50
from tpu_unet.nn.blocks import UnetUp, conv
from tpu_unet.nn.resize import upsample2x

# decoder concat widths (reference: nets/unet.py:27-35)
_OUT_FILTERS = (64, 128, 256, 512)


class Unet(nn.Module):
    """The canonical segmentation UNet (reference: nets/unet.py:24-94)."""
    num_classes: int = 21
    backbone: str = "vgg"
    # Unet_vgg/self_net (self_net().py:36-42) = vgg backbone + forced up_conv
    force_up_conv: bool = False
    # Inference-serving head: return the last decoder stage's output in the
    # column-paired layout (B, H, W/2, 2·64) and skip the final 1×1 conv —
    # the fused tail (kernels/postprocess.fused_final_argmax_hist_paired)
    # applies final+argmax without the unpair relayout.  Parameter tree is
    # unchanged (a full init's params apply cleanly).
    paired_head: bool = False
    # Training-serving head: return the pre-final feature map and skip the
    # final 1×1 conv — the fused final-conv+loss kernel
    # (kernels/loss.py::final_ce_dice_loss_grad) applies the classifier
    # inside the loss passes, so the logit map never touches HBM.
    # Parameter tree is unchanged (apply with a full init's params).
    features_out: bool = False
    # Serving-path input normalization (e.g. 1/255): the input may then be
    # the RAW uint8 image — the fused VGG stem folds the scale into its
    # conv1_1 weights and converts in-VMEM (kernels/stem.py); other paths
    # scale up-front in the compute dtype.
    input_scale: float | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        paired_path = (self.paired_head and self.backbone == "vgg"
                       and not self.force_up_conv)
        # Paired TRAINING region: when the fused train kernels are on, the
        # stem emits the paired feat1 (custom VJP, kernels/stem_train.py),
        # the last decoder stage consumes it paired and emits the paired
        # feature map for the fused final-conv+loss kernel, and every
        # cotangent between the loss and the stem stays paired — no layout
        # boundary anywhere in the stem→up1→loss→backward region.
        from tpu_unet.core import fusion
        paired_train = (self.features_out and train
                        and self.backbone == "vgg" and not self.force_up_conv
                        and not self.is_initializing()
                        and fusion.use_fused_decoder()
                        and fusion.use_paired_train())
        if self.backbone == "vgg":
            # fused encoder blocks are inference-only (no VJP on the
            # encoder kernel); the serving path is the paired head
            feats = VGG16(name="vgg", fused_stem=paired_path,
                          fused_blocks=paired_path,
                          fused_stem_train=paired_train,
                          input_scale=self.input_scale)(x, train)
        elif self.backbone == "resnet50":
            if self.input_scale is not None:
                dt = jnp.bfloat16 if x.dtype == jnp.uint8 else x.dtype
                x = x.astype(dt) * jnp.asarray(self.input_scale, dt)
            feats = ResNet50(name="resnet")(x, train)
        else:
            raise ValueError(
                f"Unsupported backbone `{self.backbone}`, use vgg or resnet50."
            )
        feat1, feat2, feat3, feat4, feat5 = feats

        up4 = UnetUp(_OUT_FILTERS[3], name="up_concat4")(feat4, feat5, train)
        up3 = UnetUp(_OUT_FILTERS[2], name="up_concat3")(feat3, up4, train)
        up2 = UnetUp(_OUT_FILTERS[1], name="up_concat2")(feat2, up3, train)
        if paired_path:
            return UnetUp(_OUT_FILTERS[0], paired_out=True, skip_paired=True,
                          name="up_concat1")(feat1, up2, train)
        up1 = UnetUp(_OUT_FILTERS[0], paired_out=paired_train,
                     skip_paired=paired_train,
                     name="up_concat1")(feat1, up2, train)

        if self.backbone == "resnet50" or self.force_up_conv:
            # extra ×2 upsample head (reference: nets/unet.py:47-54).
            # On TPU the whole head (upsample + both 64-ch convs, which
            # XLA runs at half-filled MXU lanes at full resolution) is one
            # paired Pallas pass (kernels/upconv.py); in training with the
            # fused loss it emits the paired feature map directly.
            from tpu_unet.nn.blocks import _ConvParams
            cin = up1.shape[-1]
            k1, b1 = _ConvParams(_OUT_FILTERS[0], cin, name="up_conv_1")()
            k2, b2 = _ConvParams(_OUT_FILTERS[0], _OUT_FILTERS[0],
                                 name="up_conv_3")()
            dt = jnp.result_type(up1.dtype, k1.dtype)
            a = (up1.astype(dt), k1.astype(dt), b1.astype(dt),
                 k2.astype(dt), b2.astype(dt))
            if fusion.use_fused_decoder() and not self.is_initializing():
                from tpu_unet.kernels.upconv import (fused_upconv,
                                                     fused_upconv_paired,
                                                     fused_upconv_train,
                                                     reference_upconv)
                if (train and self.features_out
                        and fusion.use_paired_train()):
                    return fused_upconv_train(*a)  # paired, for the loss
                if self.paired_head:
                    # paired serving head: the fused final+argmax tail
                    # (kernels/postprocess.py) consumes this directly
                    return fused_upconv_paired(*a)
                if train:
                    # training without the paired-loss head (e.g. fused
                    # loss off): the inference kernel has no VJP — use
                    # the differentiable XLA composition
                    up1 = reference_upconv(*a)
                else:
                    up1 = fused_upconv(*a)
            else:
                from tpu_unet.kernels.upconv import reference_upconv
                up1 = reference_upconv(*a)

        if self.features_out and not self.is_initializing():
            return up1
        return conv(self.num_classes, 1, name="final")(up1)


def unet_vgg(num_classes: int = 21) -> Unet:
    return Unet(num_classes=num_classes, backbone="vgg")


def unet_resnet50(num_classes: int = 21) -> Unet:
    return Unet(num_classes=num_classes, backbone="resnet50")


def self_net(num_classes: int = 21) -> Unet:
    """Unet_vgg factory (reference: self_net().py:68-71)."""
    return Unet(num_classes=num_classes, backbone="vgg", force_up_conv=True)
