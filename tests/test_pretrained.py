"""ImageNet-pretrained backbone ingestion (VERDICT r1 Missing #2).

The reference loads torchvision vgg16/resnet50 ImageNet state_dicts into
its encoders at construction (nets/vgg.py:67-75, nets/resnet.py:178-181,
rank-0 download train.py:271-277). torchvision itself is absent in this
image and there is no network, so these tests synthesize torchvision-layout
state_dicts from the reference encoder modules (whose module names match
torchvision exactly) and verify:
  * convert_torchvision_backbone reproduces the torch forward features,
  * load_pretrained_backbone merges only the backbone subtree,
  * the fit() path resolution fails loudly when the file is absent.
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

from tpu_unet.configs.presets import TrainConfig  # noqa: E402
from tpu_unet.infer.convert import (convert_torchvision_backbone,  # noqa: E402
                                    load_pretrained_backbone)
from tpu_unet.models.registry import build_model, init_model  # noqa: E402
from tpu_unet.train.fit import resolve_pretrained_path  # noqa: E402


def _sd_numpy(module, extra_head_keys=()):
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()
          if "num_batches_tracked" not in k}
    for k in extra_head_keys:  # heads the reference del's after loading
        sd[k] = np.zeros((10, 10), np.float32)
    return sd


def test_vgg16_torchvision_layout_forward_parity():
    from nets.vgg import VGG16 as TorchVGG

    tm = TorchVGG(pretrained=False).eval()
    # reference state_dict keys are exactly torchvision's ('features.N.*');
    # add classifier keys to prove they are dropped like the reference's del
    sd = _sd_numpy(tm, extra_head_keys=("classifier.0.weight",
                                        "classifier.0.bias"))
    bb = convert_torchvision_backbone(sd, "vgg")

    from tpu_unet.models.backbones import VGG16

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    feats = VGG16().apply({"params": bb["params"]["vgg"]}, x)
    with torch.no_grad():
        tfeats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(feats) == len(tfeats) == 5
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(np.asarray(f),
                                   tf.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def test_resnet50_torchvision_layout_forward_parity():
    from nets.resnet import resnet50 as torch_resnet50

    tm = torch_resnet50(pretrained=False).eval()
    sd = _sd_numpy(tm, extra_head_keys=("fc.weight", "fc.bias"))
    bb = convert_torchvision_backbone(sd, "resnet50")

    from tpu_unet.models.backbones import ResNet50

    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    feats = ResNet50().apply(
        {"params": bb["params"]["resnet"],
         "batch_stats": bb["batch_stats"]["resnet"]}, x, False)
    with torch.no_grad():
        tfeats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(feats) == len(tfeats) == 5
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(np.asarray(f),
                                   tf.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-3)


def test_load_pretrained_backbone_merges_only_backbone(tmp_path):
    from nets.vgg import VGG16 as TorchVGG

    tm = TorchVGG(pretrained=False)
    pth = tmp_path / "vgg16-397923af.pth"
    torch.save(tm.state_dict(), str(pth))

    model = build_model("unet_vgg", 4)
    variables = init_model(model, (64, 64))
    merged = load_pretrained_backbone(variables, str(pth), "unet_vgg")

    # backbone leaves now equal the torch weights…
    w0 = tm.state_dict()["features.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        merged["params"]["vgg"]["features_0"]["kernel"], w0)
    # …and the decoder is untouched
    for k in ("up_concat1", "up_concat2", "final"):
        np.testing.assert_array_equal(
            np.asarray(merged["params"][k]["kernel"]
                       if k == "final" else
                       merged["params"][k]["conv1"]["kernel"]),
            np.asarray(variables["params"][k]["kernel"]
                       if k == "final" else
                       variables["params"][k]["conv1"]["kernel"]))
    # merged tree still runs
    out = model.apply(merged, np.zeros((1, 64, 64, 3), np.float32), False)
    assert out.shape == (1, 64, 64, 4)


def test_resolve_pretrained_path_fails_loudly(tmp_path):
    cfg = TrainConfig(model="unet_vgg", pretrained_backbone=True)
    with pytest.raises(FileNotFoundError, match="vgg16-397923af.pth"):
        resolve_pretrained_path(cfg, base_dir=str(tmp_path))
    # models without an ImageNet backbone are rejected outright
    cfg2 = TrainConfig(model="traditional", pretrained_backbone=True)
    with pytest.raises(KeyError, match="traditional"):
        resolve_pretrained_path(cfg2, base_dir=str(tmp_path))


def test_resolve_pretrained_path_finds_model_data(tmp_path):
    d = tmp_path / "model_data"
    d.mkdir()
    (d / "resnet50-19c8e357.pth").write_bytes(b"x")
    cfg = TrainConfig(model="unet_resnet50", pretrained_backbone=True)
    assert resolve_pretrained_path(cfg, base_dir=str(tmp_path)) == \
        str(d / "resnet50-19c8e357.pth")
    # explicit path wins
    explicit = tmp_path / "elsewhere.pth"
    explicit.write_bytes(b"x")
    cfg3 = TrainConfig(model="unet_resnet50", pretrained_backbone=True,
                       pretrained_path=str(explicit))
    assert resolve_pretrained_path(cfg3, base_dir=str(tmp_path)) == \
        str(explicit)
