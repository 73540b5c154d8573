"""LightweightUnet — SE-residual VGG-style encoder + residual decoder.

Parity target: nets/LightWeightUnet.py:132-185.  Each encoder stage is
ConvBlock → ResidualBlock → maxpool (so feat1 is already at stride 2 and the
model's raw logits come out at half the input resolution — faithful to the
reference; the training losses resize logits to the target size).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.nn import blocks as B
from tpu_unet.nn.resize import upsample2x

_WIDTHS = (24, 48, 96, 192, 384)


class _Stage(nn.Module):
    """ConvBlock → ResidualBlock → maxpool (reference: nets/LightWeightUnet.py:64-99)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = B.ConvBNReLU(self.features, name="conv")(x, train)
        x = B.ResidualBlock(name="res")(x, train)
        return B.max_pool2(x)


class _UpStage(nn.Module):
    """×2 up + concat [skip, up] → ConvBlock → ResidualBlock → Dropout2d(0.1)
    (reference: nets/LightWeightUnet.py:115-129)."""
    features: int

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        x = jnp.concatenate([skip, upsample2x(x)], axis=-1)
        x = B.ConvBNReLU(self.features, name="conv")(x, train)
        x = B.ResidualBlock(name="res")(x, train)
        return nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train,
                          name="drop")(x)


class LightweightUnet(nn.Module):
    num_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop = lambda h, name: nn.Dropout(  # noqa: E731
            0.1, broadcast_dims=(1, 2), deterministic=not train, name=name)(h)

        feats = []
        h = x
        for i, c in enumerate(_WIDTHS):
            h = _Stage(c, name=f"stage{i + 1}")(h, train)
            h = drop(h, f"bdrop{i + 1}")
            feats.append(h)
        f1, f2, f3, f4, f5 = feats

        h = _UpStage(_WIDTHS[3], name="up_concat4")(f4, f5, train)
        h = _UpStage(_WIDTHS[2], name="up_concat3")(f3, h, train)
        h = _UpStage(_WIDTHS[1], name="up_concat2")(f2, h, train)
        h = _UpStage(_WIDTHS[0], name="up_concat1")(f1, h, train)

        # final fusion head (reference: nets/LightWeightUnet.py:148-153)
        h = B.ConvBNReLU(_WIDTHS[0], name="final_conv")(h, train)
        h = drop(h, "final_drop")
        h = B.ResidualBlock(name="final_res")(h, train)
        return B.conv(self.num_classes, 1, name="final")(h)


def lightweight(num_classes: int = 21) -> LightweightUnet:
    return LightweightUnet(num_classes=num_classes)
