"""Feature-pyramid encoders: VGG16 and ResNet50, NHWC Flax.

Parity targets:
- VGG16 cfg 'D' (no BN) returning 5 pyramid features via layer slicing
  (reference: nets/vgg.py:26-31,62-64); channels 64/128/256/512/512 at
  strides 1/2/4/8/16.
- ResNet50 with ceil_mode maxpool tweak (reference: nets/resnet.py:100-185);
  channels 64/256/512/1024/2048 at strides 2/4/8/16/32.

Submodule names mirror the torch state-dict paths ('.'→'_') so the
.pth→params converter (tpu_unet/infer/convert.py) is purely mechanical.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.nn.blocks import batch_norm, conv, max_pool2, max_pool_ceil

# cfg 'D' (reference: nets/vgg.py:59): torch nn.Sequential indices of convs
_VGG_CONVS = [
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
]
# feature cut points: pool before these conv indices (torch indices 4,9,16,23)
_VGG_STAGES = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


class VGG16(nn.Module):
    """5-stage VGG16 feature pyramid (reference: nets/vgg.py:26-31).

    With ``fused_stem`` the first stage + its pool run as one Pallas pass
    (kernels/stem.py) and feat1 is returned in the column-PAIRED layout
    (B, H, W/2, 128) for the fused decoder; with ``fused_blocks`` stages
    2-5 each run as one Pallas pass too (kernels/encoder.py: conv chain +
    trailing 2×2 pool in VMEM).  The parameter tree is unchanged either
    way.
    """
    fused_stem: bool = False
    fused_blocks: bool = False
    # training stem: stage 1 + pool as one Pallas pass with a custom VJP
    # (kernels/stem_train.py); feat1 comes back column-PAIRED and its
    # cotangent arrives paired from the paired decoder backward
    fused_stem_train: bool = False
    # serving-path input normalization: when set (e.g. 1/255) the input
    # may be the RAW uint8 image — the fused stem folds the scale into
    # its conv1_1 weights and converts in-VMEM; every other path scales
    # up-front in the compute dtype
    input_scale: float | None = None

    def _scale_input(self, x):
        if self.input_scale is None:
            return x
        dt = jnp.bfloat16 if x.dtype == jnp.uint8 else x.dtype
        return x.astype(dt) * jnp.asarray(self.input_scale, dt)

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN in cfg 'D'
        widths = dict(_VGG_CONVS)
        feats = []
        start = 0
        fuse = False
        # the fused-stem serving path consumes the raw input (scale folded
        # into the kernel's weights); every other path normalizes here
        if not (self.fused_stem and not self.fused_stem_train
                and not self.is_initializing()):
            x = self._scale_input(x)
        if (self.fused_stem or self.fused_blocks) \
                and not self.is_initializing():
            from tpu_unet.core.fusion import use_fused_decoder
            fuse = use_fused_decoder()
        x_p8 = False  # x currently carries the P8 (8-lead) row padding
        if self.fused_stem_train and not self.is_initializing():
            from tpu_unet.kernels.stem_train import fused_vgg_stem_train
            from tpu_unet.nn.blocks import _ConvParams
            k11, b11 = _ConvParams(64, 3, name="features_0")()
            k12, b12 = _ConvParams(64, 64, name="features_2")()
            dt = jnp.result_type(x.dtype, k11.dtype)
            feat1_paired, x = fused_vgg_stem_train(
                x.astype(dt), k11.astype(dt), b11.astype(dt),
                k12.astype(dt), b12.astype(dt))
            feats.append(feat1_paired)
            start = 1
        elif self.fused_stem and not self.is_initializing():
            from tpu_unet.kernels.stem import fused_vgg_stem_impl
            from tpu_unet.nn.blocks import _ConvParams
            k11, b11 = _ConvParams(64, 3, name="features_0")()
            k12, b12 = _ConvParams(64, 64, name="features_2")()
            res = (fused_vgg_stem_impl(x, k11, b11, k12, b12,
                                       prepad_pool=self.fused_blocks,
                                       input_scale=self.input_scale)
                   if fuse else None)
            if res is None:
                from tpu_unet.kernels.stem import reference_vgg_stem
                res = reference_vgg_stem(self._scale_input(x),
                                         k11, b11, k12, b12)
            else:
                x_p8 = self.fused_blocks
            feat1_paired, x = res
            feats.append(feat1_paired)
            start = 1
        pooled_in_kernel = True  # stem (or stage-1 handling) pools below
        n_stages = len(_VGG_STAGES)
        for si, stage in enumerate(_VGG_STAGES):
            if si < start:
                continue
            if si > start and not pooled_in_kernel:
                x = max_pool2(x)
            pooled_in_kernel = False
            if (self.fused_stem_train and si >= 1
                    and not self.is_initializing()):
                from tpu_unet.nn.blocks import _ConvParams
                if si == 1:
                    # training block 2: one-pass fwd/bwd kernel pair
                    # (kernels/encoder_train.py) — the feat2 skip and its
                    # cotangent stay in Pallas layouts on both sides
                    from tpu_unet.kernels.encoder_train import (
                        fused_vgg_block2_train)
                    k5, b5 = _ConvParams(128, 64, name="features_5")()
                    k7, b7 = _ConvParams(128, 128, name="features_7")()
                    dt = jnp.result_type(x.dtype, k5.dtype)
                    skip, x = fused_vgg_block2_train(
                        x.astype(dt), k5.astype(dt), b5.astype(dt),
                        k7.astype(dt), b7.astype(dt))
                    feats.append(skip)
                    pooled_in_kernel = True
                    continue
                # training blocks 3-5: natural-layout one-pass fwd/bwd
                # kernel pair (kernels/encoder3_train.py)
                from tpu_unet.kernels.encoder3_train import (
                    fused_vgg_block3_train)
                cin = x.shape[-1]
                ks, bs = [], []
                for ci in stage:
                    k, b = _ConvParams(widths[ci], cin,
                                       name=f"features_{ci}")()
                    ks.append(k)
                    bs.append(b)
                    cin = widths[ci]
                dt = jnp.result_type(x.dtype, ks[0].dtype)
                want_pool = si < n_stages - 1
                skip, nxt = fused_vgg_block3_train(
                    x.astype(dt), [k.astype(dt) for k in ks],
                    [b.astype(dt) for b in bs], pool=want_pool)
                feats.append(skip)
                if nxt is not None:
                    x = nxt
                    pooled_in_kernel = True
                else:
                    x = skip
                continue
            if self.fused_blocks and si >= 1 and not self.is_initializing():
                from tpu_unet.kernels.encoder import (fused_vgg_block_impl,
                                                      reference_vgg_block)
                from tpu_unet.nn.blocks import _ConvParams
                cin = x.shape[-1]
                ks, bs = [], []
                for ci in stage:
                    k, b = _ConvParams(widths[ci], cin,
                                       name=f"features_{ci}")()
                    ks.append(k)
                    bs.append(b)
                    cin = widths[ci]
                want_pool = si < n_stages - 1
                # P8 chain: skips for the fused decoder stages up2/up3
                # (feat2, feat3) and the pooled hand-off to the next
                # block travel pre-padded — no host pad copies between
                # kernels (the decoder slices/masks as needed)
                res = (fused_vgg_block_impl(
                    x, ks, bs, pool=want_pool, prepad_in=x_p8,
                    prepad_skip=si in (1, 2), prepad_pool=want_pool)
                    if fuse else None)
                if res is None:
                    if x_p8:  # drop the row padding for the XLA path
                        import jax.lax as lax
                        x = lax.slice_in_dim(x, 8, x.shape[1] - 8, axis=1)
                        x_p8 = False
                    res = reference_vgg_block(x, ks, bs, pool=want_pool)
                    skip, nxt = res
                else:
                    skip, nxt = res
                    x_p8 = want_pool  # pooled output is P8 again
                feats.append(skip)
                if nxt is not None:
                    x = nxt
                    pooled_in_kernel = True
                else:
                    x = skip
                continue
            if x_p8:
                import jax.lax as lax
                x = lax.slice_in_dim(x, 8, x.shape[1] - 8, axis=1)
                x_p8 = False
            for ci in stage:
                x = nn.relu(conv(widths[ci], 3, name=f"features_{ci}")(x))
            feats.append(x)
        return feats


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 (stride) → 1x1 expand(×4), residual
    (reference: nets/resnet.py:55-97)."""
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = conv(self.planes, 1, use_bias=False, name="conv1")(x)
        y = nn.relu(batch_norm(train, "bn1")(y))
        y = conv(self.planes, 3, self.stride, use_bias=False, name="conv2")(y)
        y = nn.relu(batch_norm(train, "bn2")(y))
        y = conv(self.planes * 4, 1, use_bias=False, name="conv3")(y)
        y = batch_norm(train, "bn3")(y)
        if self.has_downsample:
            identity = conv(self.planes * 4, 1, self.stride, use_bias=False,
                            name="downsample_0")(x)
            identity = batch_norm(train, "downsample_1")(identity)
        return nn.relu(y + identity)


class ResNet50(nn.Module):
    """5-stage ResNet50 feature pyramid (reference: nets/resnet.py:100-185)."""
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(64, 7, 2, padding=3, use_bias=False, name="conv1")(x)
        feat1 = nn.relu(batch_norm(train, "bn1")(x))
        # maxpool k3 s2 pad0 ceil_mode=True (reference: nets/resnet.py:113)
        x = max_pool_ceil(feat1, 3, 2)
        feats = [feat1]
        inplanes = 64
        for li, (blocks, planes) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes * 4)
                x = Bottleneck(planes, s, ds, name=f"layer{li + 1}_{bi}")(x, train)
                inplanes = planes * 4
            feats.append(x)
        return feats
