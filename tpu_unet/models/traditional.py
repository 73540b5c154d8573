"""TraditionalUnet — plain 4-level UNet with DoubleConv blocks.

Parity targets: nets/TraditionalUnet.py:45-115 (base 32; 1,950,357 params at
num_classes=4 — the competition baseline) and the 22-wide clone in
nets/SegNets.py:732-801.
"""
from __future__ import annotations

import flax.linen as nn

from tpu_unet.nn import blocks as B


class TraditionalUnet(nn.Module):
    num_classes: int = 21
    base: int = 32
    features_out: bool = False   # emit the pre-final feature map (serving
                                 # fuses the 1×1 conv into the Pallas tail)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base
        x1 = B.DoubleConv(c, name="inc")(x, train)
        x2 = B.Down(2 * c, name="down1")(x1, train)
        x3 = B.Down(4 * c, name="down2")(x2, train)
        x4 = B.Down(8 * c, name="down3")(x3, train)

        h = B.Up(4 * c, name="up1")(x4, x3, train)
        h = B.Up(2 * c, name="up2")(h, x2, train)
        h = B.Up(c, name="up3")(h, x1, train)

        if self.features_out:
            return h
        return B.conv(self.num_classes, 1, name="outc")(h)


def traditional(num_classes: int = 21) -> TraditionalUnet:
    return TraditionalUnet(num_classes=num_classes, base=32)


def traditional22(num_classes: int = 21) -> TraditionalUnet:
    """The 22-channel clone (reference: nets/SegNets.py:732-801)."""
    return TraditionalUnet(num_classes=num_classes, base=22)
