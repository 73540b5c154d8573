"""Model registry — every architecture the reference ships, by name.

Replaces the reference's convention of one training/config file clone per
model (SURVEY.md §2.3, §5.6) with a single factory table.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np

from tpu_unet.models.balancedseg import (
    balancedseg, balancedseg_crfs, balancedseg_fpn, balancedseg_fpn_sup)
from tpu_unet.models.hybrid import hybrid_efficientseg
from tpu_unet.models.improved import improved_ultralight
from tpu_unet.models.ladder import (
    repvgg_segnet, sk_ultralight, ultralight, ultralight44, ultralight_large,
    ultralight_large_optimized)
from tpu_unet.models.lightweight import lightweight
from tpu_unet.models.traditional import traditional, traditional22
from tpu_unet.models.unet import self_net, unet_resnet50, unet_vgg

MODELS: Dict[str, Callable] = {
    # canonical (reference: nets/unet.py)
    "unet_vgg": unet_vgg,
    "unet_resnet50": unet_resnet50,
    "self_net": self_net,                      # self_net().py Unet_vgg
    # variants (reference: nets/*.py — SURVEY.md §2.3)
    "traditional": traditional,
    "traditional22": traditional22,
    "lightweight": lightweight,
    "ultralight": ultralight,
    "ultralight_large": ultralight_large,
    "ultralight_large_optimized": ultralight_large_optimized,
    "ultralight44": ultralight44,
    "improved_ultralight": improved_ultralight,
    "sk_ultralight": sk_ultralight,
    "repvgg_segnet": repvgg_segnet,
    "hybrid_efficientseg": hybrid_efficientseg,
    "balancedseg": balancedseg,
    "balancedseg_fpn": balancedseg_fpn,
    "balancedseg_fpn_sup": balancedseg_fpn_sup,
    "balancedseg_crfs": balancedseg_crfs,
}

# torch-side class names (for .pth conversion / documentation)
TORCH_NAMES = {
    "unet_vgg": "Unet(backbone='vgg')",
    "unet_resnet50": "Unet(backbone='resnet50')",
    "self_net": "Unet_vgg / self_net",
    "traditional": "TraditionalUnet",
    "traditional22": "SegNets.TraditionalUnet",
    "lightweight": "LightweightUnet",
    "ultralight": "UltraLightweightUnet",
    "ultralight_large": "UltraLightweightUnet_large",
    "ultralight_large_optimized": "UltraLightweightUnet_large_optimized",
    "ultralight44": "SegNets.UltraLightweightUnet",
    "improved_ultralight": "ImprovedUltraLightweightUnet",
    "sk_ultralight": "SK_UltraLightweightUnet",
    "repvgg_segnet": "ImprovedSegNet",
    "hybrid_efficientseg": "HybridEfficientSeg",
    "balancedseg": "OptimizedBalancedSeg",
    "balancedseg_fpn": "OptimizedBalancedSegWithFPN",
    "balancedseg_fpn_sup": "OptimizedBalancedSegWithFPN_Supervision",
    "balancedseg_crfs": "OptimizedBalancedSegWithCRFS",
}


def build_model(name: str, num_classes: int, **kwargs):
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODELS)}")
    return MODELS[name](num_classes=num_classes, **kwargs)


def init_model(model, input_shape=(256, 256), seed: int = 0, train: bool = False):
    """Initialize variables for a model on a dummy NHWC batch."""
    x = np.zeros((1, input_shape[0], input_shape[1], 3), np.float32)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1)}
    return model.init(rngs, x, train)


def count_params(variables) -> int:
    params = variables.get("params", variables)
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
