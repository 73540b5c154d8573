"""ImprovedUltraLightweightUnet — FeatureFusion skips + deep supervision.

Parity target: nets/ImprovedUltraLightweightUnet.py:67-141.  In train mode
returns ``(final, aux4, aux3, aux2)`` from 1x1 aux heads on dec4/3/2, all
resized to input resolution.
"""
from __future__ import annotations

import flax.linen as nn

from tpu_unet.nn import blocks as B
from tpu_unet.nn.resize import resize_bilinear

_WIDTHS = (32, 64, 128, 256, 512)


class _SELightBlock(nn.Module):
    """LightConvBlock(mid floor 8) + LightSEBlock(max(4, c//8))
    (reference: nets/ImprovedUltraLightweightUnet.py:35-52)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = B.LightConvBlock(self.features, mid_floor=8, name="conv")(x, train)
        return B.SE(B.se_light(self.features), name="se")(x)


class ImprovedUltraLightweightUnet(nn.Module):
    num_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4, cb = _WIDTHS
        encs = []
        h = x
        for i, c in enumerate((c1, c2, c3, c4)):
            if i > 0:
                h = B.max_pool2(h)
            h = _SELightBlock(c, name=f"enc{i + 1}")(h, train)
            encs.append(h)
        h = _SELightBlock(cb, name="bridge")(B.max_pool2(h), train)

        decs = {}
        for i, c in zip((4, 3, 2, 1), (c4, c3, c2, c1)):
            skip = encs[i - 1]
            up = resize_bilinear(h, skip.shape[-3:-1], align_corners=True)
            merged = B.FeatureFusion(c, name=f"fusion{i}")(up, skip)
            h = _SELightBlock(c, name=f"dec{i}")(merged, train)
            decs[i] = h

        size = x.shape[-3:-1]
        final = B.conv(self.num_classes, 1, name="final")(decs[1])
        final = resize_bilinear(final, size, align_corners=True)

        # aux heads are created unconditionally so the param tree is stable
        # across train/eval; XLA dead-code-eliminates them in eval mode.
        aux4 = resize_bilinear(
            B.conv(self.num_classes, 1, name="aux_out4")(decs[4]), size)
        aux3 = resize_bilinear(
            B.conv(self.num_classes, 1, name="aux_out3")(decs[3]), size)
        aux2 = resize_bilinear(
            B.conv(self.num_classes, 1, name="aux_out2")(decs[2]), size)
        if train:
            return final, aux4, aux3, aux2
        return final


def improved_ultralight(num_classes: int = 21) -> ImprovedUltraLightweightUnet:
    return ImprovedUltraLightweightUnet(num_classes=num_classes)
