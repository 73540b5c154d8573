"""HybridEfficientSeg — STDC-style encoder + DW-separable decoder.

Parity target: nets/HybridEfficientSeg.py:93-150 (duplicated at
nets/SegNets.py:804-861 with the SegNets SE rule).
"""
from __future__ import annotations

import flax.linen as nn

from tpu_unet.nn import blocks as B
from tpu_unet.nn.resize import resize_bilinear

_WIDTHS = (32, 64, 128, 256, 512)


class HybridEfficientSeg(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4, cb = _WIDTHS
        encs = []
        h = x
        for i, c in enumerate((c1, c2, c3, c4)):
            if i > 0:
                h = B.max_pool2(h)
            h = B.STDCBlock(c, name=f"enc{i + 1}")(h, train)
            encs.append(h)

        h = B.STDCBlock(cb, name="bridge")(B.max_pool2(h), train)
        h = nn.Dropout(0.2, broadcast_dims=(1, 2), deterministic=not train,
                       name="drop")(h)

        for i, c in zip((4, 3, 2, 1), (c4, c3, c2, c1)):
            skip = encs[i - 1]
            up = resize_bilinear(h, skip.shape[-3:-1], align_corners=True)
            h = B.DecoderBlock(c, name=f"dec{i}")(up, skip, train)

        h = B.DWSeparableBNReLU(c1, name="final_dw")(h, train)
        h = B.conv(self.num_classes, 1, name="final")(h)
        return resize_bilinear(h, x.shape[-3:-1], align_corners=True)


def hybrid_efficientseg(num_classes: int = 3) -> HybridEfficientSeg:
    return HybridEfficientSeg(num_classes=num_classes)
