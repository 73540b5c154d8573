"""LadderUNet — the shared encoder/bridge/decoder skeleton behind the
UltraLightweight family, the SK variant, and the RepVGG ImprovedSegNet.

All of these models (reference: nets/UltraLightweightUnet.py:57-107,
nets/UltraLightweightUnet_large.py:55-111,
nets/UltraLightweightUnet_large_optimized.py:51-103,
nets/SK_UltraLightweightUnet.py:85-141, nets/RepVGG_Unet.py:150-207,
nets/SegNets.py:673-729) share the identical topology:

    enc1..enc4 (optionally ×SE) with maxpool2 between stages
    bridge (optionally ×Dropout2d)
    dec4..dec1: bilinear-resize(align_corners) to the skip's size,
                concat [up, skip], block
    1x1 final conv → bilinear resize to input size

and differ only in the stage block type, channel widths, SE rule, and
dropout rate — expressed here as config fields instead of whole-file clones.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.nn import blocks as B
from tpu_unet.nn.resize import resize_bilinear


def _make_block(kind: str, features: int, deploy: bool, name: str):
    if kind == "light8":
        return B.LightConvBlock(features, mid_floor=8, name=name)
    if kind == "light16":
        return B.LightConvBlock(features, mid_floor=16, name=name)
    if kind == "sk":
        return B.LightSKBlock(features, name=name)
    if kind == "repvgg":
        return B.RepVGGStem(features, use_repvgg=True, deploy=deploy, name=name)
    if kind == "fusedmb":
        return B.RepVGGStem(features, use_repvgg=False, name=name)
    raise ValueError(f"unknown block kind {kind!r}")


def _se_reduced(rule: str, c: int) -> int:
    if rule == "light":            # max(4, c//8)
        return B.se_light(c)
    if rule == "light_large":      # max(8, c//4)
        return B.se_light_large(c)
    if rule == "lightweight":      # max(8, c//8)
        return B.se_lightweight(c)
    raise ValueError(f"unknown SE rule {rule!r}")


class LadderUNet(nn.Module):
    num_classes: int
    channels: Tuple[int, int, int, int, int]  # (c1, c2, c3, c4, bridge)
    block: str = "light8"
    se: Optional[str] = None        # SE after each encoder stage
    dropout: float = 0.0            # Dropout2d on the bridge (0 = off)
    deploy: bool = False            # RepVGG fused-inference mode
    features_out: bool = False      # emit the pre-final feature map
                                    # (serving fuses the 1×1 conv into the
                                    # Pallas tail; dec1 is already at input
                                    # resolution, so the trailing resize is
                                    # an identity)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4, cb = self.channels
        encs = []
        h = x
        for i, c in enumerate((c1, c2, c3, c4)):
            if i > 0:
                h = B.max_pool2(h)
            h = _make_block(self.block, c, self.deploy, f"enc{i + 1}")(h, train)
            if self.se is not None:
                h = B.SE(_se_reduced(self.se, c), name=f"se{i + 1}")(h)
            encs.append(h)

        h = _make_block(self.block, cb, self.deploy, "bridge")(B.max_pool2(h), train)
        if self.dropout > 0:
            # Dropout2d zeroes whole channels → broadcast over H, W
            h = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train, name="drop")(h)

        for i, c in zip((4, 3, 2, 1), (c4, c3, c2, c1)):
            skip = encs[i - 1]
            up = resize_bilinear(h, skip.shape[-3:-1], align_corners=True)
            h = _make_block(self.block, c, self.deploy, f"dec{i}")(
                jnp.concatenate([up, skip], axis=-1), train)

        if self.features_out:
            return h
        h = B.conv(self.num_classes, 1, name="final")(h)
        return resize_bilinear(h, x.shape[-3:-1], align_corners=True)


def ultralight(num_classes: int = 21) -> LadderUNet:
    """UltraLightweightUnet (reference: nets/UltraLightweightUnet.py:57-107).
    Note: the reference defines Dropout2d(0.1) but never applies it."""
    return LadderUNet(num_classes, (32, 64, 128, 256, 512), block="light8")


def ultralight_large(num_classes: int = 21) -> LadderUNet:
    """UltraLightweightUnet_large (reference: nets/UltraLightweightUnet_large.py:55-111)."""
    return LadderUNet(num_classes, (64, 128, 256, 512, 1024), block="light16",
                      se="light_large", dropout=0.2)


def ultralight_large_optimized(num_classes: int = 21) -> LadderUNet:
    """UltraLightweightUnet_large_optimized — the competition submission model,
    926,347 params at num_classes=4 (reference:
    nets/UltraLightweightUnet_large_optimized.py:51-103, Submit_result/model.py)."""
    return LadderUNet(num_classes, (44, 88, 176, 352, 704), block="light16",
                      se="light_large", dropout=0.15)


def ultralight44(num_classes: int = 21) -> LadderUNet:
    """The 44-wide UltraLightweightUnet clone living in nets/SegNets.py:673-729
    (LightweightSEBlock SE rule, mid floor 16)."""
    return LadderUNet(num_classes, (44, 88, 176, 352, 704), block="light16",
                      se="lightweight", dropout=0.15)


def sk_ultralight(num_classes: int = 21) -> LadderUNet:
    """SK_UltraLightweightUnet (reference: nets/SK_UltraLightweightUnet.py:85-141)."""
    return LadderUNet(num_classes, (44, 88, 176, 352, 704), block="sk",
                      se="light_large", dropout=0.15)


def repvgg_segnet(num_classes: int = 21, use_repvgg: bool = True,
                  deploy: bool = False) -> LadderUNet:
    """ImprovedSegNet — RepVGG-block UNet with structural re-parameterization
    (reference: nets/RepVGG_Unet.py:150-207)."""
    return LadderUNet(num_classes, (44, 88, 176, 352, 704),
                      block="repvgg" if use_repvgg else "fusedmb",
                      se="light_large", dropout=0.15, deploy=deploy)
