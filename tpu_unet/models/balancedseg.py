"""The OptimizedBalancedSeg family — multi-scale encoder + efficient
attention decoder, in four flavors.

Parity targets (all in nets/SegNets.py):
- OptimizedBalancedSeg                     :607-670  (SE+CBAM encoder stages,
  spatial attn per decoder stage, aux head on enc3 → returns (final, aux))
- OptimizedBalancedSegWithFPN              :533-604  (FPN laterals + edge block)
- OptimizedBalancedSegWithFPN_Supervision  :438-526  (FPN + deep supervision,
  returns (final, aux1, aux2, aux3))
- OptimizedBalancedSegWithCRFS             :864-925  (CRFS attention per
  decoder stage + edge block)
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.nn import blocks as B
from tpu_unet.nn.resize import resize_bilinear, resize_nearest

_WIDTHS = (32, 64, 128, 256, 512)


class _Encoder(nn.Module):
    """enc1..enc4 OptimizedMultiScaleBlocks with maxpool between, + bridge
    (OptimizedMultiScaleBlock + Dropout2d(0.1))."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4, cb = _WIDTHS
        encs = []
        h = x
        for i, c in enumerate((c1, c2, c3, c4)):
            if i > 0:
                h = B.max_pool2(h)
            h = B.OptimizedMultiScaleBlock(c, name=f"enc{i + 1}")(h, train)
            encs.append(h)
        h = B.OptimizedMultiScaleBlock(cb, name="bridge")(B.max_pool2(h), train)
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train,
                       name="drop")(h)
        return encs, h


class OptimizedBalancedSeg(nn.Module):
    """reference: nets/SegNets.py:607-670 — note the decoder's interpolate
    calls omit both mode and align_corners (torch default = *nearest*) and
    dec4 takes enc4 as a concat skip.  The reference also constructs CBAM
    and edge-enhancement modules it never applies in forward
    (nets/SegNets.py:610,638-641,666-667) — we create neither.  Returns
    ``(final, aux)`` in train mode, ``final`` in eval (normalized across the
    zoo; the aux params always exist)."""
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4, cb = _WIDTHS
        encs = []
        h = x
        for i, c in enumerate((c1, c2, c3, c4)):
            if i > 0:
                h = B.max_pool2(h)
            h = B.OptimizedMultiScaleBlock(c, name=f"enc{i + 1}")(h, train)
            h = B.SE(B.se_lightweight(c), name=f"enc{i + 1}_se")(h)
            encs.append(h)
        h = B.OptimizedMultiScaleBlock(cb, name="bridge")(B.max_pool2(h), train)
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train,
                       name="drop")(h)

        for i, c in zip((4, 3, 2, 1), (c4, c3, c2, c1)):
            skip = encs[i - 1]
            up = resize_nearest(h, skip.shape[-3:-1])
            h = B.EfficientDecoderBlock(c, name=f"dec{i}")(up, skip, train)
            h = B.LightweightSpatialAttention(name=f"dec{i}_spa")(h)

        final = B.DWConvBNReLU(c1, name="final_conv")(h, train)
        final = B.conv(self.num_classes, 1, name="final")(final)
        final = resize_nearest(final, x.shape[-3:-1])
        aux = B.conv(self.num_classes, 1, name="aux_head")(encs[2])
        aux = resize_nearest(aux, x.shape[-3:-1])
        if train:
            return final, aux
        return final


class _FPNBody(nn.Module):
    """Shared FPN decoder: lateral 1x1s added into each decoder output, edge
    enhancement residual before the final conv (nets/SegNets.py:533-604)."""
    num_classes: int
    supervision: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4, cb = _WIDTHS
        encs, bridge = _Encoder(name="encoder")(x, train)
        lats = [
            B.conv(c, 1, name=f"lateral{i + 1}")(encs[i])
            for i, c in enumerate((c1, c2, c3, c4))
        ]

        # dec4 has no concat skip (EfficientDecoderBlock(512, 256) called with
        # a single arg, nets/SegNets.py:587); dec3..dec1 concat the encoder map.
        up = resize_bilinear(bridge, encs[3].shape[-3:-1], align_corners=True)
        h = B.EfficientDecoderBlock(c4, name="dec4")(up, None, train)
        h = resize_bilinear(lats[3], h.shape[-3:-1], align_corners=True) + h

        decs = {4: h}
        for i, c in zip((3, 2, 1), (c3, c2, c1)):
            skip = encs[i - 1]
            up = resize_bilinear(h, skip.shape[-3:-1], align_corners=True)
            h = B.EfficientDecoderBlock(c, name=f"dec{i}")(up, skip, train)
            h = resize_bilinear(lats[i - 1], h.shape[-3:-1], align_corners=True) + h
            decs[i] = h

        edges = B.EdgeEnhancementBlock(c1, name="edge")(h, train)
        final = B.DWConvBNReLU(c1, name="final_conv")(h + edges, train)
        final = B.conv(self.num_classes, 1, name="final")(final)
        size = x.shape[-3:-1]
        final = resize_bilinear(final, size, align_corners=True)

        if not self.supervision:
            return final
        aux3 = resize_bilinear(
            B.conv(self.num_classes, 1, name="aux_output3")(decs[3]), size)
        aux2 = resize_bilinear(
            B.conv(self.num_classes, 1, name="aux_output2")(decs[2]), size)
        aux1 = resize_bilinear(
            B.conv(self.num_classes, 1, name="aux_output1")(decs[1]), size)
        if train:
            return final, aux1, aux2, aux3
        return final


class OptimizedBalancedSegWithFPN(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _FPNBody(self.num_classes, supervision=False, name="body")(x, train)


class OptimizedBalancedSegWithFPNSupervision(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _FPNBody(self.num_classes, supervision=True, name="body")(x, train)


class OptimizedBalancedSegWithCRFS(nn.Module):
    """reference: nets/SegNets.py:864-925."""
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4, cb = _WIDTHS
        encs, h = _Encoder(name="encoder")(x, train)

        for i, c in zip((4, 3, 2, 1), (c4, c3, c2, c1)):
            skip = encs[i - 1]
            up = resize_bilinear(h, skip.shape[-3:-1], align_corners=True)
            h = B.EfficientDecoderBlock(c, name=f"dec{i}")(up, skip, train)
            h = B.CRFSAttention(name=f"crfs{i}")(h)

        edges = B.EdgeEnhancementBlock(c1, name="edge")(h, train)
        final = B.DWConvBNReLU(c1, name="final_conv")(h + edges, train)
        final = B.conv(self.num_classes, 1, name="final")(final)
        return resize_bilinear(final, x.shape[-3:-1], align_corners=True)


def balancedseg(num_classes: int = 3) -> OptimizedBalancedSeg:
    return OptimizedBalancedSeg(num_classes=num_classes)


def balancedseg_fpn(num_classes: int = 3) -> OptimizedBalancedSegWithFPN:
    return OptimizedBalancedSegWithFPN(num_classes=num_classes)


def balancedseg_fpn_sup(num_classes: int = 3) -> OptimizedBalancedSegWithFPNSupervision:
    return OptimizedBalancedSegWithFPNSupervision(num_classes=num_classes)


def balancedseg_crfs(num_classes: int = 3) -> OptimizedBalancedSegWithCRFS:
    return OptimizedBalancedSegWithCRFS(num_classes=num_classes)
