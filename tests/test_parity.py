"""Numerical parity vs the actual torch reference models.

For every architecture with a converter we:
  1. construct the torch reference net (imported from /root/reference),
  2. convert its randomly-initialized state_dict to Flax variables,
  3. compare eval-mode forward outputs on the same input.

This validates the architecture AND the .pth→params converter end to end —
which is exactly what pixel-identical mask parity on the bundled weights
rests on.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

# nets/SegNets.py imports torchvision (unused) which this image lacks
import types  # noqa: E402

sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

from tpu_unet.infer.convert import CONVERTERS  # noqa: E402
from tpu_unet.models.registry import build_model  # noqa: E402


def _torch_model(name, nc):
    if name == "unet_vgg":
        from nets.unet import Unet as TU
        return TU(num_classes=nc, backbone="vgg")
    if name == "unet_resnet50":
        from nets.unet import Unet as TU
        return TU(num_classes=nc, backbone="resnet50")
    if name == "traditional":
        from nets.TraditionalUnet import TraditionalUnet as TU
        return TU(in_channels=3, num_classes=nc)
    if name == "lightweight":
        from nets.LightWeightUnet import LightweightUnet as TU
        return TU(num_classes=nc)
    if name == "ultralight":
        from nets.UltraLightweightUnet import UltraLightweightUnet as TU
        return TU(num_classes=nc)
    if name == "ultralight_large":
        from nets.UltraLightweightUnet_large import UltraLightweightUnet_large as TU
        return TU(num_classes=nc)
    if name == "ultralight_large_optimized":
        from nets.UltraLightweightUnet_large_optimized import (
            UltraLightweightUnet_large_optimized as TU)
        return TU(num_classes=nc)
    if name == "improved_ultralight":
        from nets.ImprovedUltraLightweightUnet import (
            ImprovedUltraLightweightUnet as TU)
        return TU(num_classes=nc)
    if name == "repvgg_segnet":
        from nets.RepVGG_Unet import ImprovedSegNet as TU
        return TU(num_classes=nc)
    if name == "hybrid_efficientseg":
        from nets.HybridEfficientSeg import HybridEfficientSeg as TU
        return TU(num_classes=nc)
    if name == "balancedseg":
        from nets.SegNets import OptimizedBalancedSeg as TU
        return TU(num_classes=nc)
    if name == "balancedseg_fpn":
        from nets.SegNets import OptimizedBalancedSegWithFPN as TU
        return TU(num_classes=nc)
    if name == "balancedseg_fpn_sup":
        from nets.SegNets import OptimizedBalancedSegWithFPN_Supervision as TU
        return TU(num_classes=nc)
    if name == "balancedseg_crfs":
        from nets.SegNets import OptimizedBalancedSegWithCRFS as TU
        return TU(num_classes=nc)
    if name == "ultralight44":
        from nets.SegNets import UltraLightweightUnet as TU
        return TU(num_classes=nc)
    if name == "traditional22":
        from nets.SegNets import TraditionalUnet as TU
        return TU(in_channels=3, num_classes=nc)
    pytest.skip(f"no torch counterpart harness for {name}")


def _randomize_bn_stats(tm, seed=0):
    """Give running stats non-default values so eval-mode BN is actually
    exercised by the comparison."""
    g = torch.Generator().manual_seed(seed)
    for m in tm.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


# Unrunnable-as-shipped reference models (documented divergences):
# - sk_ultralight: torch raises at construction (SKConv groups=32 with 22
#   input channels, nets/SK_UltraLightweightUnet.py:36) — we clamp groups.
# - improved_ultralight: torch raises in forward (FeatureFusion(256) fed a
#   768-channel concat, nets/ImprovedUltraLightweightUnet.py:85,121) — our
#   fuse conv takes the actual concat width.
# Both remain covered by shape/param tests.
PARITY_MODELS = sorted(set(CONVERTERS)
                       - {"sk_ultralight", "improved_ultralight", "self_net"})


def test_self_net_forward_parity():
    """Unet_vgg / self_net lives in a file named 'self_net().py' — load it
    by path (reference: self_net().py:23-72)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_self_net", os.path.join(REF, "self_net().py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tm = mod.Unet_vgg(num_classes=4)
    tm.eval()
    sd = {k: np.asarray(v.cpu().numpy()) for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = CONVERTERS["self_net"](sd)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 32, 32, 3).astype("float32")
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ty = ty.numpy().transpose(0, 2, 3, 1)
    fm = build_model("self_net", 4)
    fy = np.asarray(fm.apply(variables, x, False))
    assert fy.shape == ty.shape == (1, 64, 64, 4)  # faithful 2× output
    np.testing.assert_allclose(fy, ty, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", PARITY_MODELS)
def test_forward_parity(name):
    nc = 4
    tm = _torch_model(name, nc)
    tm.eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    sd = {k: np.asarray(v.cpu().numpy())
          for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}

    variables = CONVERTERS[name](sd)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype("float32")
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    if isinstance(ty, tuple):
        ty = ty[0]
    ty = ty.numpy().transpose(0, 2, 3, 1)

    fm = build_model(name, nc)
    fy = np.asarray(fm.apply(variables, x, False))

    np.testing.assert_allclose(fy, ty, rtol=2e-4, atol=2e-4)
