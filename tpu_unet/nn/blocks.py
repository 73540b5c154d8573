"""Shared NN blocks for the model zoo — NHWC Flax modules, MXU-friendly.

Behavioral parity targets (cited into /root/reference):

- DoubleConv / Down / Up                 nets/TraditionalUnet.py:5-42, nets/SegNets.py:8-45
- UnetUp (no-BN decoder)                 nets/unet.py:8-22
- DepthwiseSeparableConv                 nets/UltraLightweightUnet.py:6-16
- LightConvBlock                         nets/UltraLightweightUnet.py:19-35 (mid floor 8)
                                         nets/UltraLightweightUnet_large*.py (mid floor 16)
- SEBlock family                         nets/LightWeightUnet.py:19-33, nets/UltraLightweightUnet.py:38-54,
                                         nets/SegNets.py:325-342
- ConvBlock / ResidualBlock              nets/LightWeightUnet.py:5-57
- SKConv / LightSKBlock                  nets/SK_UltraLightweightUnet.py:26-83
- RepVGGBlock (+ reparam fold)           nets/RepVGG_Unet.py:26-98
- FusedMBConv                            nets/RepVGG_Unet.py:101-123
- STDCBlock / DecoderBlock               nets/HybridEfficientSeg.py:44-90, nets/SegNets.py:345-391
- CBAM / Channel / Spatial attention     nets/SegNets.py:158-203
- CRFSAttention                          nets/SegNets.py:206-232
- EdgeEnhancementBlock                   nets/SegNets.py:234-249
- AtrousConvBlock / DWConvBNReLU         nets/SegNets.py:252-285
- OptimizedMultiScaleBlock               nets/SegNets.py:288-307
- LightweightSpatialAttention            nets/SegNets.py:310-322
- EfficientAttention / EfficientDecoderBlock  nets/SegNets.py:394-435
- FeatureFusion                          nets/ImprovedUltraLightweightUnet.py:55-65

BatchNorm note: under ``jit`` with a batch-sharded mesh, batch statistics are
reduced over the *global* batch by XLA/GSPMD automatically — this is the
TPU-native SyncBatchNorm (reference: train.py:335-338) with zero extra code.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.nn.resize import resize_bilinear, upsample2x

# torch BN defaults: momentum=0.1 (new = 0.9*old + 0.1*batch), eps=1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def batch_norm(train: bool, name: str, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        name=name,
        dtype=dtype,
    )


def conv(features: int, kernel: int = 3, stride: int = 1, padding=None,
         use_bias: bool = True, groups: int = 1, dilation: int = 1,
         name: Optional[str] = None, dtype=None) -> nn.Conv:
    if padding is None:
        padding = (kernel - 1) // 2 * dilation
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(padding, padding)] * 2, use_bias=use_bias,
        feature_group_count=groups, kernel_dilation=(dilation, dilation),
        name=name, dtype=dtype,
    )


def max_pool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def max_pool_ceil(x, window: int, stride: int):
    """MaxPool with ceil_mode=True (reference: nets/resnet.py:113)."""
    h, w = x.shape[-3], x.shape[-2]
    pad_h = max(0, (-(h - window) % stride) if h > window else 0)
    pad_w = max(0, (-(w - window) % stride) if w > window else 0)
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((0, pad_h), (0, pad_w)),
    )


def global_avg_pool(x):
    """NHWC → NC."""
    return jnp.mean(x, axis=(1, 2))


def global_max_pool(x):
    return jnp.max(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Plain conv blocks
# ---------------------------------------------------------------------------

class ConvBNReLU(nn.Module):
    """conv3x3 → BN → ReLU (reference ConvBlock, nets/LightWeightUnet.py:5-15)."""
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(self.features, self.kernel, name="conv")(x)
        x = batch_norm(train, "bn")(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) ×2 (reference: nets/TraditionalUnet.py:5-18)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(self.features, name="conv1")(x)
        x = nn.relu(batch_norm(train, "bn1")(x))
        x = conv(self.features, name="conv2")(x)
        x = nn.relu(batch_norm(train, "bn2")(x))
        return x


class Down(nn.Module):
    """maxpool2 → DoubleConv (reference: nets/TraditionalUnet.py:21-30)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DoubleConv(self.features, name="conv")(max_pool2(x), train)


class Up(nn.Module):
    """×2 bilinear (align_corners) → concat skip → DoubleConv
    (reference: nets/TraditionalUnet.py:33-42; concat order [skip, up])."""
    features: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = upsample2x(x)
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, name="conv")(x, train)


class _ConvParams(nn.Module):
    """Bare conv parameters with nn.Conv-compatible names/shapes/inits,
    so checkpoints and the torch converter see the same tree whether the
    stage runs through XLA or the fused Pallas kernel."""
    features: int
    in_features: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        return k, b


class UnetUp(nn.Module):
    """Canonical UNet decoder stage — ×2 bilinear on the deep feature,
    concat with skip, two conv+ReLU, **no BN** (reference: nets/unet.py:8-22;
    concat order [skip, up]).

    On TPU backends the whole stage runs as one fused Pallas kernel
    (tpu_unet/kernels/decoder_fuse.py): upsample + concat + both convs in
    a single VMEM pass, no relayout copies, full-MXU paired matmuls.
    """
    features: int
    paired_out: bool = False   # emit (B, 2H, W, 2F) column-paired layout
    skip_paired: bool = False  # skip arrives column-paired (fused stem)

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        # at init the producer (fused stem) is bypassed, so skip arrives
        # unpaired regardless of the flag
        skip_paired = self.skip_paired and not self.is_initializing()
        cs = skip.shape[-1] // 2 if skip_paired else skip.shape[-1]
        cin = cs + x.shape[-1]
        k1, b1 = _ConvParams(self.features, cin, name="conv1")()
        k2, b2 = _ConvParams(self.features, self.features, name="conv2")()
        # nn.Conv dtype promotion semantics: compute in the promoted dtype
        dt = jnp.result_type(x.dtype, k1.dtype)
        skip, x = skip.astype(dt), x.astype(dt)
        k1, b1, k2, b2 = (a.astype(dt) for a in (k1, b1, k2, b2))

        from tpu_unet.core.fusion import use_fused_decoder
        if use_fused_decoder() and not self.is_initializing():
            from tpu_unet.kernels.decoder_fuse import (
                fused_unetup, fused_unetup_paired, fused_unetup_train,
                fused_unetup_train_paired, reference_unetup)
            if self.paired_out and not train:
                return fused_unetup_paired(skip, x, k1, b1, k2, b2,
                                           skip_paired=skip_paired)
            if train and self.paired_out:
                # paired training head: the stage emits (B, H, W/2, 2F)
                # consumed relayout-free by the fused final-conv+loss
                # kernel, whose paired cotangent feeds the v2 paired
                # backward (kernels/decoder_train.py) — the whole
                # up1→final→loss→backward region speaks one layout.  A
                # paired skip (train stem) passes straight through too.
                from tpu_unet.core import fusion
                if fusion.use_paired_train():
                    return fused_unetup_train_paired(skip, x, k1, b1, k2, b2)
                if skip_paired:
                    B, H2, Wh, Cs2 = skip.shape
                    skip = skip.reshape(B, H2, 2 * Wh, Cs2 // 2)
                out = reference_unetup(skip, x, k1, b1, k2, b2)
                B, H2, W2, F = out.shape
                return out.reshape(B, H2, W2 // 2, 2 * F)
            if skip_paired:
                B, H2, Wh, Cs2 = skip.shape
                skip = skip.reshape(B, H2, 2 * Wh, Cs2 // 2)
            if train:
                # Training defaults per stage family (v5e, 512px/bs8):
                # - F >= 128 stages (up2/up3): the WIDE plane-paired
                #   kernel pair (forward + one-pass backward with
                #   in-kernel wgrads and upsample transpose) — on by
                #   default with the paired training region.
                # - F < 64 natural v1 kernel: still loses to XLA
                #   autodiff (Pallas boundary relayouts); opt-in via
                #   TPU_UNET_FUSED_TRAIN (core/fusion.py).
                from tpu_unet.core import fusion
                if fusion.use_fused_train():
                    return fused_unetup_train(skip, x, k1, b1, k2, b2)
                # resnet50's deepest stage (Cs=1024, Cx=2048) hits a
                # Mosaic invalid-input-layout in the wide kernels (the
                # same shape the inference path deep-gates); XLA autodiff
                # handles it
                deep_invalid = skip.shape[-1] >= 1024 or x.shape[-1] >= 2048
                if (fusion.use_paired_train() and k1.shape[-1] >= 128
                        and not deep_invalid):
                    from tpu_unet.kernels.decoder_fuse import (
                        fused_unetup_train_wide)
                    return fused_unetup_train_wide(skip, x, k1, b1, k2, b2)
                return reference_unetup(skip, x, k1, b1, k2, b2)
            return fused_unetup(skip, x, k1, b1, k2, b2)

        from tpu_unet.kernels.decoder_fuse import reference_unetup
        if skip_paired:
            B, H2, Wh, Cs2 = skip.shape
            skip = skip.reshape(B, H2, 2 * Wh, Cs2 // 2)
        out = reference_unetup(skip, x, k1, b1, k2, b2)
        if self.paired_out:
            B, H2, W2, F = out.shape
            out = out.reshape(B, H2, W2 // 2, 2 * F)
        return out


# ---------------------------------------------------------------------------
# Depthwise-separable family
# ---------------------------------------------------------------------------

class DWSeparable(nn.Module):
    """Depthwise 3x3 (+bias) → pointwise 1x1 (+bias), no norm
    (reference: nets/UltraLightweightUnet.py:6-16)."""
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        x = conv(c_in, self.kernel, self.stride, groups=c_in, name="depthwise")(x)
        x = conv(self.features, 1, name="pointwise")(x)
        return x


class DWSeparableBNReLU(nn.Module):
    """DWSeparable → BN → ReLU (reference: nets/HybridEfficientSeg.py:6-21)."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = conv(c_in, 3, self.stride, groups=c_in, name="depthwise")(x)
        x = conv(self.features, 1, name="pointwise")(x)
        return nn.relu(batch_norm(train, "bn")(x))


class DWConvBNReLU(nn.Module):
    """Bias-free depthwise+pointwise → BN → ReLU (reference:
    nets/SegNets.py:270-285 LightweightConvBlock); optional dilation covers
    AtrousConvBlock (nets/SegNets.py:252-267)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = conv(c_in, self.kernel, self.stride, padding=self.padding,
                 use_bias=False, groups=c_in, dilation=self.dilation,
                 name="depthwise")(x)
        x = conv(self.features, 1, use_bias=False, name="pointwise")(x)
        return nn.relu(batch_norm(train, "bn")(x))


class LightConvBlock(nn.Module):
    """1x1 reduce → BN/ReLU → DWSeparable → BN/ReLU (reference:
    nets/UltraLightweightUnet.py:19-35).  ``mid_floor`` is 8 for the base
    variant, 16 for the *_large / *_optimized variants."""
    features: int
    mid_floor: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(self.mid_floor, self.features // 2)
        x = conv(mid, 1, name="reduce")(x)
        x = nn.relu(batch_norm(train, "bn1")(x))
        x = DWSeparable(self.features, name="dw")(x)
        x = nn.relu(batch_norm(train, "bn2")(x))
        return x


# ---------------------------------------------------------------------------
# Squeeze-excitation family
# ---------------------------------------------------------------------------

class SE(nn.Module):
    """Squeeze-excitation gate: GAP → FC(reduced) → ReLU → FC(C) → sigmoid → scale.

    ``reduced`` is the explicit hidden width; the different reference SE
    flavors only differ in how they compute it:
      - SEBlock          c // 4            (nets/LightWeightUnet.py:19-33)
      - LightSEBlock     max(4, c // 8)    (nets/UltraLightweightUnet.py:38-54)
      - LightSEBlock'    max(8, c // 4)    (nets/UltraLightweightUnet_large.py:37-52)
      - LightweightSE    max(8, c // 8)    (nets/SegNets.py:325-342)
    """
    reduced: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = global_avg_pool(x)
        y = nn.relu(nn.Dense(self.reduced, name="fc1")(y))
        y = nn.sigmoid(nn.Dense(c, name="fc2")(y))
        return x * y[:, None, None, :]


def se_quarter(c: int) -> int:
    return c // 4


def se_light(c: int) -> int:
    return max(4, c // 8)


def se_light_large(c: int) -> int:
    return max(8, c // 4)


def se_lightweight(c: int, reduction: int = 8) -> int:
    return max(8, c // reduction)


class ResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN-SE + residual + ReLU
    (reference: nets/LightWeightUnet.py:36-57)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        r = x
        x = conv(c, name="conv1")(x)
        x = nn.relu(batch_norm(train, "bn1")(x))
        x = conv(c, name="conv2")(x)
        x = batch_norm(train, "bn2")(x)
        x = SE(se_quarter(c), name="se")(x)
        return nn.relu(x + r)


# ---------------------------------------------------------------------------
# Selective-kernel
# ---------------------------------------------------------------------------

class SKConv(nn.Module):
    """Selective-kernel conv (reference: nets/SK_UltraLightweightUnet.py:26-64):
    M grouped 3x3 convs at dilation 1..M → sum → GAP → 1x1+BN+ReLU → 1x1 to
    M·C → softmax over branches → attention-weighted sum.

    Deliberate fix vs the reference: the shipped code hardcodes groups=32,
    which cannot construct for the channel widths the model actually uses
    (e.g. 22→44 in LightSKBlock(3, 44) — torch raises "in_channels must be
    divisible by groups").  We clamp to the largest valid divisor ≤ 32."""
    features: int
    M: int = 2
    r: int = 16
    L: int = 32
    groups: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        d = max(c_in // self.r, self.L)
        groups = math.gcd(self.groups, math.gcd(c_in, self.features))
        branches = []
        for i in range(self.M):
            b = conv(self.features, 3, dilation=1 + i, use_bias=False,
                     groups=groups, name=f"branch{i}")(x)
            b = nn.relu(batch_norm(train, f"branch{i}_bn")(b))
            branches.append(b)
        u = sum(branches)
        s = global_avg_pool(u)[:, None, None, :]
        z = conv(d, 1, use_bias=False, name="fc1")(s)
        z = nn.relu(batch_norm(train, "fc1_bn")(z))
        ab = conv(self.features * self.M, 1, use_bias=False, name="fc2")(z)
        # (N,1,1,M*C) -> (N,M,C); softmax over M (matches the reference's
        # reshape(b, M, C, -1) + softmax(dim=1))
        ab = ab.reshape(ab.shape[0], self.M, self.features)
        ab = nn.softmax(ab, axis=1)
        out = sum(branches[i] * ab[:, i][:, None, None, :] for i in range(self.M))
        return out


class LightSKBlock(nn.Module):
    """1x1+BN+ReLU → SKConv → BN → ReLU
    (reference: nets/SK_UltraLightweightUnet.py:66-83; mid floor 16)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(16, self.features // 2)
        x = conv(mid, 1, name="reduce")(x)
        x = nn.relu(batch_norm(train, "bn1")(x))
        x = SKConv(self.features, name="sk")(x, train)
        x = batch_norm(train, "bn2")(x)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# RepVGG
# ---------------------------------------------------------------------------

class RepVGGBlock(nn.Module):
    """Training-time: 3x3+BN ∥ 1x1+BN ∥ identity-BN, summed, ReLU.
    Deploy-time: single fused 3x3 conv (reference: nets/RepVGG_Unet.py:26-98).
    The structural re-parameterization is a pure param-tree transform —
    see :func:`tpu_unet.models.repvgg.fold_repvgg`."""
    features: int
    deploy: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            return nn.relu(conv(self.features, 3, name="reparam")(x))
        c_in = x.shape[-1]
        y3 = batch_norm(train, "bn3")(conv(self.features, 3, use_bias=False, name="conv3")(x))
        y1 = batch_norm(train, "bn1")(conv(self.features, 1, use_bias=False, name="conv1")(x))
        y = y3 + y1
        if c_in == self.features:
            y = y + batch_norm(train, "bnid")(x)
        return nn.relu(y)


class FusedMBConv(nn.Module):
    """3x3 expand (+BN+ReLU6) → 1x1 project (+BN), residual when shapes match
    (reference: nets/RepVGG_Unet.py:101-123)."""
    features: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        y = conv(c_in * self.expansion, 3, use_bias=False, name="expand")(x)
        y = jnp.minimum(nn.relu(batch_norm(train, "bn1")(y)), 6.0)
        y = conv(self.features, 1, use_bias=False, name="project")(y)
        y = batch_norm(train, "bn2")(y)
        if c_in == self.features:
            y = y + x
        return y


class RepVGGStem(nn.Module):
    """1x1+BN+ReLU → RepVGGBlock (or FusedMBConv)
    (reference: nets/RepVGG_Unet.py:126-147 LightweightConvBlock)."""
    features: int
    use_repvgg: bool = True
    deploy: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(16, self.features // 2)
        x = conv(mid, 1, name="reduce")(x)
        x = nn.relu(batch_norm(train, "bn")(x))
        if self.use_repvgg:
            return RepVGGBlock(self.features, deploy=self.deploy, name="block")(x, train)
        return FusedMBConv(self.features, name="block")(x, train)


# ---------------------------------------------------------------------------
# STDC / decoder blocks
# ---------------------------------------------------------------------------

class STDCBlock(nn.Module):
    """Two chained DW-separable convs whose outputs concat, + (projected)
    residual, + SE (reference: nets/HybridEfficientSeg.py:44-71).
    ``se_fn`` picks the SE hidden-width rule (differs between the standalone
    file and the SegNets copy)."""
    features: int
    stride: int = 1
    se_floor: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        mid = self.features // 2
        o1 = DWSeparableBNReLU(mid, self.stride, name="conv1")(x, train)
        o2 = DWSeparableBNReLU(mid, name="conv2")(o1, train)
        out = jnp.concatenate([o1, o2], axis=-1)
        if self.stride > 1 or c_in != self.features:
            identity = DWSeparableBNReLU(self.features, self.stride, name="skip")(x, train)
        else:
            identity = x
        out = out + identity
        return SE(max(self.se_floor, self.features // 4), name="se")(out)


class DecoderBlock(nn.Module):
    """concat skip → DWSeparableBNReLU ×2 → SE
    (reference: nets/HybridEfficientSeg.py:74-90, nets/SegNets.py:345-361)."""
    features: int
    se_reduced: Optional[int] = None

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = DWSeparableBNReLU(self.features, name="conv1")(x, train)
        x = DWSeparableBNReLU(self.features, name="conv2")(x, train)
        reduced = self.se_reduced if self.se_reduced is not None \
            else max(8, self.features // 4)
        return SE(reduced, name="se")(x)


# ---------------------------------------------------------------------------
# Attention blocks (CBAM / spatial / CRFS / efficient)
# ---------------------------------------------------------------------------

class ChannelAttention(nn.Module):
    """Shared-MLP over GAP and GMP, summed, sigmoid
    (reference: nets/SegNets.py:158-176)."""
    reduced: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mlp_hidden = nn.Dense(self.reduced, use_bias=False, name="fc1")
        mlp_out = nn.Dense(c, use_bias=False, name="fc2")
        avg = mlp_out(nn.relu(mlp_hidden(global_avg_pool(x))))
        mx = mlp_out(nn.relu(mlp_hidden(global_max_pool(x))))
        return nn.sigmoid(avg + mx)[:, None, None, :]


class SpatialAttention(nn.Module):
    """[mean_c, max_c] → 7x7 conv → sigmoid (reference: nets/SegNets.py:179-190).
    ``use_bias`` differs between the CBAM copy (False) and the standalone
    LightweightSpatialAttention (True, nets/SegNets.py:310-322)."""
    kernel: int = 7
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = conv(1, self.kernel, use_bias=self.use_bias, name="conv")(y)
        return nn.sigmoid(y)


class CBAM(nn.Module):
    """x * channel-attn, then * spatial-attn (reference: nets/SegNets.py:193-203)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = x * ChannelAttention(c // self.reduction, name="channel")(x)
        x = x * SpatialAttention(name="spatial")(x)
        return x


class LightweightSpatialAttention(nn.Module):
    """Spatial attention that returns the gated map x*attn
    (reference: nets/SegNets.py:310-322)."""
    kernel: int = 7

    @nn.compact
    def __call__(self, x):
        return x * SpatialAttention(self.kernel, use_bias=True, name="attn")(x)


class CRFSAttention(nn.Module):
    """theta/phi/g 1x1 convs → sigmoid spatial gate → sigmoid(x*attn)
    (reference: nets/SegNets.py:206-232; note the outer sigmoid and the
    unused g branch are faithful to the reference)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        d = c // self.reduction
        theta = conv(d, 1, use_bias=False, name="theta")(x)
        phi = conv(d, 1, use_bias=False, name="phi")(x)
        _ = conv(d, 1, use_bias=False, name="g")(x)  # parity: params exist, unused
        attn = conv(1, 1, use_bias=False, name="attn")(nn.sigmoid(theta + phi))
        return nn.sigmoid(x * attn)


class EfficientAttention(nn.Module):
    """Channel attention with floor(8) hidden width, gating x
    (reference: nets/SegNets.py:394-414)."""
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        reduced = max(8, c // self.reduction)
        return x * ChannelAttention(reduced, name="mlp")(x)


class EfficientDecoderBlock(nn.Module):
    """concat skip → DWConvBNReLU ×2 → channel attn → spatial attn
    (reference: nets/SegNets.py:417-435)."""
    features: int

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = DWConvBNReLU(self.features, name="conv1")(x, train)
        x = DWConvBNReLU(self.features, name="conv2")(x, train)
        x = EfficientAttention(name="channel")(x)
        x = LightweightSpatialAttention(name="spatial")(x)
        return x


# ---------------------------------------------------------------------------
# Multi-scale / edge / fusion
# ---------------------------------------------------------------------------

class EdgeEnhancementBlock(nn.Module):
    """3x3 (C/2) + BN/ReLU → 1x1 (C) + BN/ReLU (reference: nets/SegNets.py:234-249)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(self.features // 2, 3, use_bias=False, name="conv1")(x)
        x = nn.relu(batch_norm(train, "bn1")(x))
        x = conv(self.features, 1, use_bias=False, name="conv2")(x)
        x = nn.relu(batch_norm(train, "bn2")(x))
        return x


class OptimizedMultiScaleBlock(nn.Module):
    """1x1 reduce to C/2, two DW branches (one single conv, one double with
    padding=2 on the second → slightly larger map, resized back), concat
    (reference: nets/SegNets.py:288-307)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = (self.features // 4) * 2
        x = conv(half, 1, name="reduce")(x)
        b1 = DWConvBNReLU(half, name="branch1")(x, train)
        b2 = DWConvBNReLU(half, name="branch2a")(x, train)
        # kernel 3, padding 2 → output grows by 2 in each dim, then resized
        # back to branch1's size (reference: nets/SegNets.py:298,305-306)
        b2 = DWConvBNReLU(half, padding=2, name="branch2b")(b2, train)
        b2 = resize_bilinear(b2, b1.shape[-3:-1], align_corners=True)
        return jnp.concatenate([b1, b2], axis=-1)


class FeatureFusion(nn.Module):
    """concat → 1x1 → light-SE (reference: nets/ImprovedUltraLightweightUnet.py:55-65)."""
    features: int

    @nn.compact
    def __call__(self, a, b):
        x = jnp.concatenate([a, b], axis=-1)
        x = conv(self.features, 1, name="fuse")(x)
        return SE(se_light(self.features), name="se")(x)
