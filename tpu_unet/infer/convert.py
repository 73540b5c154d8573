""".pth → Flax params converter (SURVEY.md §5.4, §7 step 1).

Maps the reference's torch ``state_dict`` checkpoints (bare weight dicts,
reference: utils/utils_fit.py:164-172) onto our Flax variable trees, so the
bundled competition weights (model_data/result_model/*.pth,
Submit_result/model.pth) produce pixel-identical masks through this stack.

Layout rules:
- conv:      torch OIHW → flax HWIO  (transpose 2,3,1,0 — also correct for
             grouped and depthwise convs)
- linear:    torch (out,in) → flax (in,out)
- batchnorm: weight/bias → scale/bias (params); running_mean/var → mean/var
             (batch_stats)

Uses torch (CPU) only to deserialize the pickle; everything downstream is
numpy/JAX.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Params = Dict[str, dict]
Stats = Dict[str, dict]


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # EarlyStopping checkpoints wrap the weights (utils/callbacks.py:129-134)
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in sd.items() if "num_batches_tracked" not in k}


# ---------------------------------------------------------------------------
# leaf converters
# ---------------------------------------------------------------------------

class _SD:
    """State-dict view that tracks which keys were consumed."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used = set()

    def __call__(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self):
        return sorted(set(self.sd) - self.used)


def conv(sd: _SD, p: str) -> dict:
    out = {"kernel": sd(f"{p}.weight").transpose(2, 3, 1, 0)}
    if sd.has(f"{p}.bias"):
        out["bias"] = sd(f"{p}.bias")
    return out


def dense(sd: _SD, p: str) -> dict:
    out = {"kernel": sd(f"{p}.weight").T}
    if sd.has(f"{p}.bias"):
        out["bias"] = sd(f"{p}.bias")
    return out


def bn(sd: _SD, p: str) -> Tuple[dict, dict]:
    return ({"scale": sd(f"{p}.weight"), "bias": sd(f"{p}.bias")},
            {"mean": sd(f"{p}.running_mean"), "var": sd(f"{p}.running_var")})


class _Tree:
    """Accumulates params + batch_stats subtrees.

    Every leaf insertion also records (flax path → torch key, kind) in
    ``src`` — the mapping that makes the conversion invertible
    (see ``export_state_dict``). ``_Tree.last`` keeps the most recent
    instance so the inverse can reuse whatever mapping the forward
    conversion just traced.
    """

    last: "_Tree | None" = None

    def __init__(self):
        self.params: Params = {}
        self.stats: Stats = {}
        self.src: Dict[str, Tuple[str, str]] = {}
        _Tree.last = self

    def put(self, path: str, params: dict, stats: dict | None = None):
        def insert(root, p, leaf):
            parts = p.split("/")
            for part in parts[:-1]:
                root = root.setdefault(part, {})
            root[parts[-1]] = leaf

        insert(self.params, path, params)
        if stats:
            insert(self.stats, path, stats)

    def conv(self, sd, torch_key, path):
        self.put(path, conv(sd, torch_key))
        self.src[path] = ("conv", torch_key)

    def dense(self, sd, torch_key, path):
        self.put(path, dense(sd, torch_key))
        self.src[path] = ("dense", torch_key)

    def bn(self, sd, torch_key, path):
        p, s = bn(sd, torch_key)
        self.put(path, p, s)
        self.src[path] = ("bn", torch_key)

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


# ---------------------------------------------------------------------------
# block converters (torch prefix → flax path)
# ---------------------------------------------------------------------------

def light_conv_block(t: _Tree, sd: _SD, tp: str, fp: str):
    """LightConvBlock: conv.0→reduce, conv.1→bn1, conv.3→dw, conv.4→bn2."""
    t.conv(sd, f"{tp}.conv.0", f"{fp}/reduce")
    t.bn(sd, f"{tp}.conv.1", f"{fp}/bn1")
    t.conv(sd, f"{tp}.conv.3.depthwise", f"{fp}/dw/depthwise")
    t.conv(sd, f"{tp}.conv.3.pointwise", f"{fp}/dw/pointwise")
    t.bn(sd, f"{tp}.conv.4", f"{fp}/bn2")


def se_block(t: _Tree, sd: _SD, tp: str, fp: str):
    """SE (Linear flavor): fc.0→fc1, fc.2→fc2."""
    t.dense(sd, f"{tp}.fc.0", f"{fp}/fc1")
    t.dense(sd, f"{tp}.fc.2", f"{fp}/fc2")


def double_conv(t: _Tree, sd: _SD, tp: str, fp: str):
    """DoubleConv: double_conv.{0,1,3,4} → conv1/bn1/conv2/bn2."""
    t.conv(sd, f"{tp}.double_conv.0", f"{fp}/conv1")
    t.bn(sd, f"{tp}.double_conv.1", f"{fp}/bn1")
    t.conv(sd, f"{tp}.double_conv.3", f"{fp}/conv2")
    t.bn(sd, f"{tp}.double_conv.4", f"{fp}/bn2")


def conv_bn_relu(t: _Tree, sd: _SD, tp: str, fp: str):
    """ConvBlock: conv.0→conv, conv.1→bn."""
    t.conv(sd, f"{tp}.conv.0", f"{fp}/conv")
    t.bn(sd, f"{tp}.conv.1", f"{fp}/bn")


def residual_block(t: _Tree, sd: _SD, tp: str, fp: str):
    t.conv(sd, f"{tp}.conv1", f"{fp}/conv1")
    t.bn(sd, f"{tp}.bn1", f"{fp}/bn1")
    t.conv(sd, f"{tp}.conv2", f"{fp}/conv2")
    t.bn(sd, f"{tp}.bn2", f"{fp}/bn2")
    se_block(t, sd, f"{tp}.se", f"{fp}/se")


def dw_sep_bn(t: _Tree, sd: _SD, tp: str, fp: str):
    """DWSeparableBNReLU: depthwise/pointwise/bn."""
    t.conv(sd, f"{tp}.depthwise", f"{fp}/depthwise")
    t.conv(sd, f"{tp}.pointwise", f"{fp}/pointwise")
    t.bn(sd, f"{tp}.bn", f"{fp}/bn")


def dw_conv_bn(t: _Tree, sd: _SD, tp: str, fp: str):
    """DWConvBNReLU (bias-free SegNets flavor) — same key layout."""
    dw_sep_bn(t, sd, tp, fp)


def stdc_block(t: _Tree, sd: _SD, tp: str, fp: str, has_skip: bool):
    dw_sep_bn(t, sd, f"{tp}.conv1", f"{fp}/conv1")
    dw_sep_bn(t, sd, f"{tp}.conv2", f"{fp}/conv2")
    if has_skip:
        dw_sep_bn(t, sd, f"{tp}.skip", f"{fp}/skip")
    se_block(t, sd, f"{tp}.se", f"{fp}/se")


def decoder_block(t: _Tree, sd: _SD, tp: str, fp: str):
    dw_sep_bn(t, sd, f"{tp}.conv.0", f"{fp}/conv1")
    dw_sep_bn(t, sd, f"{tp}.conv.1", f"{fp}/conv2")
    se_block(t, sd, f"{tp}.se", f"{fp}/se")


def multiscale_block(t: _Tree, sd: _SD, tp: str, fp: str):
    t.conv(sd, f"{tp}.reduce", f"{fp}/reduce")
    dw_conv_bn(t, sd, f"{tp}.branch1", f"{fp}/branch1")
    dw_conv_bn(t, sd, f"{tp}.branch2.0", f"{fp}/branch2a")
    dw_conv_bn(t, sd, f"{tp}.branch2.1", f"{fp}/branch2b")


def channel_attention(t: _Tree, sd: _SD, tp: str, fp: str):
    t.dense(sd, f"{tp}.shared_mlp.0", f"{fp}/fc1")
    t.dense(sd, f"{tp}.shared_mlp.2", f"{fp}/fc2")


def efficient_decoder_block(t: _Tree, sd: _SD, tp: str, fp: str):
    dw_conv_bn(t, sd, f"{tp}.conv.0", f"{fp}/conv1")
    dw_conv_bn(t, sd, f"{tp}.conv.1", f"{fp}/conv2")
    channel_attention(t, sd, f"{tp}.channel_attention", f"{fp}/channel/mlp")
    t.conv(sd, f"{tp}.spatial_attention.conv", f"{fp}/spatial/attn/conv")


def edge_block(t: _Tree, sd: _SD, tp: str, fp: str):
    t.conv(sd, f"{tp}.conv.0", f"{fp}/conv1")
    t.bn(sd, f"{tp}.conv.1", f"{fp}/bn1")
    t.conv(sd, f"{tp}.conv.3", f"{fp}/conv2")
    t.bn(sd, f"{tp}.conv.4", f"{fp}/bn2")


def sk_conv(t: _Tree, sd: _SD, tp: str, fp: str, M: int = 2):
    for i in range(M):
        t.conv(sd, f"{tp}.conv.{i}.0", f"{fp}/branch{i}")
        t.bn(sd, f"{tp}.conv.{i}.1", f"{fp}/branch{i}_bn")
    t.conv(sd, f"{tp}.fc1.0", f"{fp}/fc1")
    t.bn(sd, f"{tp}.fc1.1", f"{fp}/fc1_bn")
    t.conv(sd, f"{tp}.fc2", f"{fp}/fc2")


def light_sk_block(t: _Tree, sd: _SD, tp: str, fp: str):
    t.conv(sd, f"{tp}.conv1.0", f"{fp}/reduce")
    t.bn(sd, f"{tp}.conv1.1", f"{fp}/bn1")
    sk_conv(t, sd, f"{tp}.sk_conv", f"{fp}/sk")
    t.bn(sd, f"{tp}.bn", f"{fp}/bn2")


def repvgg_block(t: _Tree, sd: _SD, tp: str, fp: str, identity: bool):
    t.conv(sd, f"{tp}.conv1", f"{fp}/conv3")
    t.bn(sd, f"{tp}.bn1", f"{fp}/bn3")
    t.conv(sd, f"{tp}.conv2", f"{fp}/conv1")
    t.bn(sd, f"{tp}.bn2", f"{fp}/bn1")
    if identity:
        t.bn(sd, f"{tp}.id_bn", f"{fp}/bnid")


def repvgg_stem(t: _Tree, sd: _SD, tp: str, fp: str, identity: bool):
    t.conv(sd, f"{tp}.conv.0", f"{fp}/reduce")
    t.bn(sd, f"{tp}.conv.1", f"{fp}/bn")
    repvgg_block(t, sd, f"{tp}.conv.3", f"{fp}/block", identity)


def fusion_block(t: _Tree, sd: _SD, tp: str, fp: str):
    t.conv(sd, f"{tp}.conv1x1", f"{fp}/fuse")
    se_block(t, sd, f"{tp}.se", f"{fp}/se")


def unet_up(t: _Tree, sd: _SD, tp: str, fp: str):
    t.conv(sd, f"{tp}.conv1", f"{fp}/conv1")
    t.conv(sd, f"{tp}.conv2", f"{fp}/conv2")


# ---------------------------------------------------------------------------
# model converters
# ---------------------------------------------------------------------------

def _ladder_light(sd: _SD, se: bool, block=light_conv_block) -> _Tree:
    """Shared converter for the UltraLightweight family / SK / RepVGG
    (torch attribute names enc1..4, se1..4, bridge, dec4..1, final)."""
    t = _Tree()
    for i in range(1, 5):
        block(t, sd, f"enc{i}", f"enc{i}")
        if se:
            se_block(t, sd, f"se{i}", f"se{i}")
    block(t, sd, "bridge", "bridge")
    for i in range(4, 0, -1):
        block(t, sd, f"dec{i}", f"dec{i}")
    t.conv(sd, "final", "final")
    return t


def convert_ultralight(sd_raw, se: bool = False) -> dict:
    sd = _SD(sd_raw)
    t = _ladder_light(sd, se)
    _check_consumed(sd)
    return t.variables()


def convert_sk_ultralight(sd_raw) -> dict:
    sd = _SD(sd_raw)
    t = _ladder_light(sd, se=True, block=light_sk_block)
    _check_consumed(sd)
    return t.variables()


def convert_repvgg_segnet(sd_raw) -> dict:
    sd = _SD(sd_raw)

    def block(t, s, tp, fp):
        # identity branch exists iff in==out for the RepVGG block; detectable
        # from the checkpoint itself
        identity = s.has(f"{tp}.conv.3.id_bn.weight")
        repvgg_stem(t, s, tp, fp, identity)

    t = _ladder_light(sd, se=True, block=block)
    _check_consumed(sd)
    return t.variables()


def convert_traditional(sd_raw) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    double_conv(t, sd, "inc", "inc")
    for i in (1, 2, 3):
        double_conv(t, sd, f"down{i}.maxpool_conv.1", f"down{i}/conv")
        double_conv(t, sd, f"up{i}.conv", f"up{i}/conv")
    t.conv(sd, "outc", "outc")
    _check_consumed(sd)
    return t.variables()


def convert_lightweight(sd_raw) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    for i in range(1, 6):
        conv_bn_relu(t, sd, f"backbone.stage{i}.0", f"stage{i}/conv")
        residual_block(t, sd, f"backbone.stage{i}.1", f"stage{i}/res")
    for i in range(4, 0, -1):
        conv_bn_relu(t, sd, f"up_concat{i}.conv.0", f"up_concat{i}/conv")
        residual_block(t, sd, f"up_concat{i}.conv.1", f"up_concat{i}/res")
    conv_bn_relu(t, sd, "final_conv.0", "final_conv")
    residual_block(t, sd, "final_conv.2", "final_res")
    t.conv(sd, "final_conv.3", "final")
    _check_consumed(sd)
    return t.variables()


def convert_improved_ultralight(sd_raw) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    for i in range(1, 5):
        light_conv_block(t, sd, f"enc{i}", f"enc{i}/conv")
        se_block(t, sd, f"enc{i}.se", f"enc{i}/se")
        fusion_block(t, sd, f"fusion{i}", f"fusion{i}")
        light_conv_block(t, sd, f"dec{i}", f"dec{i}/conv")
        se_block(t, sd, f"dec{i}.se", f"dec{i}/se")
    light_conv_block(t, sd, "bridge", "bridge/conv")
    se_block(t, sd, "bridge.se", "bridge/se")
    for i in (4, 3, 2):
        t.conv(sd, f"aux_out{i}", f"aux_out{i}")
    t.conv(sd, "final", "final")
    _check_consumed(sd)
    return t.variables()


def convert_hybrid(sd_raw) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    prev = 3
    for i, c in zip(range(1, 5), (32, 64, 128, 256)):
        stdc_block(t, sd, f"enc{i}", f"enc{i}", has_skip=prev != c)
        prev = c
    stdc_block(t, sd, "bridge", "bridge", has_skip=True)
    for i in (4, 3, 2, 1):
        decoder_block(t, sd, f"dec{i}", f"dec{i}")
    dw_sep_bn(t, sd, "final_conv.0", "final_dw")
    t.conv(sd, "final_conv.1", "final")
    _check_consumed(sd)
    return t.variables()


def _convert_balanced_encoder(t: _Tree, sd: _SD, base: str = ""):
    tb = base and base + "."
    fb = base and base + "/"
    for i in range(1, 5):
        multiscale_block(t, sd, f"{tb}enc{i}", f"{fb}enc{i}")
    multiscale_block(t, sd, f"{tb}bridge.0", f"{fb}bridge")


def convert_balancedseg(sd_raw) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    _convert_balanced_encoder(t, sd)
    for i in range(1, 5):
        se_block(t, sd, f"enc{i}_se", f"enc{i}_se")
    for i in (4, 3, 2, 1):
        efficient_decoder_block(t, sd, f"dec{i}", f"dec{i}")
        t.conv(sd, f"dec{i}_spa.conv", f"dec{i}_spa/attn/conv")
    dw_conv_bn(t, sd, "final_conv.0", "final_conv")
    t.conv(sd, "final_conv.1", "final")
    t.conv(sd, "aux_head", "aux_head")
    # CBAM + edge_enhancement exist in the torch tree but are unused in
    # forward (nets/SegNets.py:610,638-641) — deliberately dropped.
    for k in list(sd.sd):
        if k.startswith(("enc1_cbam", "enc2_cbam", "enc3_cbam", "enc4_cbam",
                         "edge_enhancement")):
            sd.used.add(k)
    _check_consumed(sd)
    return t.variables()


def convert_balancedseg_fpn(sd_raw, supervision: bool = False) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    enc = _Tree()
    _convert_balanced_encoder(enc, sd)
    t.params["body"] = {"encoder": enc.params}
    t.stats["body"] = {"encoder": enc.stats}
    b = "body"
    for i in range(1, 5):
        t.conv(sd, f"lateral{i}", f"{b}/lateral{i}")
    for i in (4, 3, 2, 1):
        efficient_decoder_block(t, sd, f"dec{i}", f"{b}/dec{i}")
    edge_block(t, sd, "edge_enhancement", f"{b}/edge")
    dw_conv_bn(t, sd, "final_conv.0", f"{b}/final_conv")
    t.conv(sd, "final_conv.1", f"{b}/final")
    if supervision:
        for i in (1, 2, 3):
            t.conv(sd, f"aux_output{i}", f"{b}/aux_output{i}")
    _check_consumed(sd)
    return t.variables()


def convert_balancedseg_crfs(sd_raw) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    enc = _Tree()
    _convert_balanced_encoder(enc, sd)
    t.params["encoder"] = enc.params
    t.stats["encoder"] = enc.stats
    for i in (4, 3, 2, 1):
        efficient_decoder_block(t, sd, f"dec{i}", f"dec{i}")
        for leaf in ("theta", "phi", "g"):
            t.conv(sd, f"crfs_att{i}.conv_{leaf}", f"crfs{i}/{leaf}")
        t.conv(sd, f"crfs_att{i}.conv_attn", f"crfs{i}/attn")
    edge_block(t, sd, "edge_enhancement", "edge")
    dw_conv_bn(t, sd, "final_conv.0", "final_conv")
    t.conv(sd, "final_conv.1", "final")
    _check_consumed(sd)
    return t.variables()


def convert_unet(sd_raw, backbone: str = "vgg", force_up_conv: bool = False) -> dict:
    sd = _SD(sd_raw)
    t = _Tree()
    if backbone == "vgg":
        vgg_key = "vgg"
        for k in list(sd.sd):
            if k.startswith("vgg.features."):
                idx = k.split(".")[2]
                t.conv(sd, f"vgg.features.{idx}", f"vgg/features_{idx}")
    else:
        t.conv(sd, "resnet.conv1", "resnet/conv1")
        t.bn(sd, "resnet.bn1", "resnet/bn1")
        for li, blocks in enumerate((3, 4, 6, 3), start=1):
            for bi in range(blocks):
                tp = f"resnet.layer{li}.{bi}"
                fp = f"resnet/layer{li}_{bi}"
                for ci in (1, 2, 3):
                    t.conv(sd, f"{tp}.conv{ci}", f"{fp}/conv{ci}")
                    t.bn(sd, f"{tp}.bn{ci}", f"{fp}/bn{ci}")
                if sd.has(f"{tp}.downsample.0.weight"):
                    t.conv(sd, f"{tp}.downsample.0", f"{fp}/downsample_0")
                    t.bn(sd, f"{tp}.downsample.1", f"{fp}/downsample_1")
    for i in (4, 3, 2, 1):
        unet_up(t, sd, f"up_concat{i}", f"up_concat{i}")
    if backbone == "resnet50" or force_up_conv:
        t.conv(sd, "up_conv.1", "up_conv_1")
        t.conv(sd, "up_conv.3", "up_conv_3")
    t.conv(sd, "final", "final")
    _check_consumed(sd)
    return t.variables()


def convert_torchvision_backbone(sd_raw: Dict[str, np.ndarray],
                                 backbone: str) -> dict:
    """ImageNet torchvision ``vgg16``/``resnet50`` state_dict → the backbone
    variables subtree of our UNet models.

    The reference downloads these checkpoints and loads them into its
    encoder at construction (nets/vgg.py:67-75, nets/resnet.py:178-181,
    rank-0 download train.py:271-277), deleting the classifier/fc heads.
    torchvision's module names match the reference's encoder exactly, so
    the key layout here is ``features.N.*`` (vgg) / ``conv1, bn1,
    layer{1..4}.{i}.*, downsample.*`` (resnet50) — i.e. the reference's
    UNet keys minus the ``vgg.``/``resnet.`` prefix, plus head keys that
    we drop just as the reference ``del``s those modules.
    """
    sd_raw = {k: v for k, v in sd_raw.items()
              if not k.startswith(("classifier.", "fc.", "avgpool."))}
    sd = _SD(sd_raw)
    t = _Tree()
    if backbone == "vgg":
        for k in list(sd.sd):
            if k.startswith("features.") and k.endswith(".weight"):
                idx = k.split(".")[1]
                t.conv(sd, f"features.{idx}", f"vgg/features_{idx}")
    elif backbone == "resnet50":
        t.conv(sd, "conv1", "resnet/conv1")
        t.bn(sd, "bn1", "resnet/bn1")
        for li, blocks in enumerate((3, 4, 6, 3), start=1):
            for bi in range(blocks):
                tp = f"layer{li}.{bi}"
                fp = f"resnet/layer{li}_{bi}"
                for ci in (1, 2, 3):
                    t.conv(sd, f"{tp}.conv{ci}", f"{fp}/conv{ci}")
                    t.bn(sd, f"{tp}.bn{ci}", f"{fp}/bn{ci}")
                if sd.has(f"{tp}.downsample.0.weight"):
                    t.conv(sd, f"{tp}.downsample.0", f"{fp}/downsample_0")
                    t.bn(sd, f"{tp}.downsample.1", f"{fp}/downsample_1")
    else:
        raise KeyError(f"no ImageNet backbone named {backbone!r}")
    _check_consumed(sd)
    return t.variables()


# models that carry an ImageNet-pretrainable encoder (reference: the only
# `pretrained=` consumers are the canonical UNet and its self_net clone)
BACKBONE_FOR_MODEL = {
    "unet_vgg": "vgg",
    "unet_resnet50": "resnet50",
    "self_net": "vgg",
}

# canonical torchvision checkpoint filenames the reference downloads into
# ./model_data (nets/vgg.py:69, nets/resnet.py:181)
TORCHVISION_FILES = {
    "vgg": "vgg16-397923af.pth",
    "resnet50": "resnet50-19c8e357.pth",
}


def _strict_merge(dst: dict, src: dict, path: str = "") -> dict:
    """Replace leaves of ``dst`` with ``src``, requiring identical tree
    structure and leaf shapes (the backbone subtree must match exactly —
    unlike `partial_load` there is nothing legitimate to skip)."""
    if set(src) != set(dst):
        raise ValueError(
            f"backbone tree mismatch at {path or '/'}: "
            f"extra={sorted(set(src) - set(dst))} "
            f"missing={sorted(set(dst) - set(src))}")
    out = {}
    for k, v in dst.items():
        if isinstance(v, dict):
            out[k] = _strict_merge(v, src[k], f"{path}/{k}")
        else:
            if np.shape(v) != np.shape(src[k]):
                raise ValueError(f"shape mismatch at {path}/{k}: "
                                 f"{np.shape(v)} vs {np.shape(src[k])}")
            out[k] = np.asarray(src[k])
    return out


def load_pretrained_backbone(variables: dict, path: str, model_name: str) -> dict:
    """Load an ImageNet torchvision checkpoint into ``variables``' backbone
    subtree (reference: pretrained=True flow, train.py:271-279)."""
    if model_name not in BACKBONE_FOR_MODEL:
        raise KeyError(
            f"model {model_name!r} has no ImageNet-pretrainable backbone "
            f"(only {sorted(BACKBONE_FOR_MODEL)})")
    backbone = BACKBONE_FOR_MODEL[model_name]
    bb = convert_torchvision_backbone(load_state_dict(path), backbone)
    key = "vgg" if backbone == "vgg" else "resnet"
    out = {k: dict(v) for k, v in variables.items()}
    out["params"][key] = _strict_merge(variables["params"][key],
                                       bb["params"][key], key)
    if "batch_stats" in bb:
        out["batch_stats"][key] = _strict_merge(
            variables["batch_stats"][key], bb["batch_stats"][key], key)
    return out


def _check_consumed(sd: _SD):
    leftover = sd.unused()
    if leftover:
        raise ValueError(f"unconverted torch keys: {leftover[:10]}"
                         f"{' …' if len(leftover) > 10 else ''}")


CONVERTERS = {
    "unet_vgg": lambda sd: convert_unet(sd, "vgg"),
    "unet_resnet50": lambda sd: convert_unet(sd, "resnet50"),
    "self_net": lambda sd: convert_unet(sd, "vgg", force_up_conv=True),
    "traditional": convert_traditional,
    "traditional22": convert_traditional,
    "lightweight": convert_lightweight,
    "ultralight": lambda sd: convert_ultralight(sd, se=False),
    "ultralight_large": lambda sd: convert_ultralight(sd, se=True),
    "ultralight_large_optimized": lambda sd: convert_ultralight(sd, se=True),
    "ultralight44": lambda sd: convert_ultralight(sd, se=True),
    "improved_ultralight": convert_improved_ultralight,
    "sk_ultralight": convert_sk_ultralight,
    "repvgg_segnet": convert_repvgg_segnet,
    "hybrid_efficientseg": convert_hybrid,
    "balancedseg": convert_balancedseg,
    "balancedseg_fpn": lambda sd: convert_balancedseg_fpn(sd, False),
    "balancedseg_fpn_sup": lambda sd: convert_balancedseg_fpn(sd, True),
    "balancedseg_crfs": convert_balancedseg_crfs,
}


def convert_pth(path: str, model_name: str) -> dict:
    """Load a reference .pth checkpoint and return Flax variables."""
    if model_name not in CONVERTERS:
        raise KeyError(f"no converter for {model_name!r}")
    return CONVERTERS[model_name](load_state_dict(path))


def _fetch(tree: dict, path: str):
    for part in path.split("/"):
        tree = tree[part]
    return tree


def export_state_dict(variables: dict, model_name: str,
                      template_sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_pth``: Flax variables → a torch state_dict
    (numpy leaves, strict-loadable into the reference model class).

    ``template_sd`` supplies the torch key inventory (e.g. the reference
    model's own ``state_dict()`` or any compatible .pth via
    ``load_state_dict``); the forward converter is run once on it to trace
    the key↔path mapping, then each leaf transform is inverted:
    conv HWIO→OIHW, dense (in,out)→(out,in), BN scale/bias + mean/var →
    weight/bias + running_mean/running_var (+ zero num_batches_tracked so
    torch ``load_state_dict(strict=True)`` accepts it).
    """
    if model_name not in CONVERTERS:
        raise KeyError(f"no converter for {model_name!r}")
    CONVERTERS[model_name]({k: np.asarray(v) for k, v in template_sd.items()
                            if "num_batches_tracked" not in k})
    tree = _Tree.last
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for path, (kind, tkey) in tree.src.items():
        p = _fetch(params, path)
        if kind == "conv":
            out[f"{tkey}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
            if "bias" in p:
                out[f"{tkey}.bias"] = np.asarray(p["bias"])
        elif kind == "dense":
            out[f"{tkey}.weight"] = np.asarray(p["kernel"]).T
            if "bias" in p:
                out[f"{tkey}.bias"] = np.asarray(p["bias"])
        else:  # bn
            s = _fetch(stats, path)
            out[f"{tkey}.weight"] = np.asarray(p["scale"])
            out[f"{tkey}.bias"] = np.asarray(p["bias"])
            out[f"{tkey}.running_mean"] = np.asarray(s["mean"])
            out[f"{tkey}.running_var"] = np.asarray(s["var"])
            out[f"{tkey}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def export_pth(variables: dict, model_name: str, template_sd, path: str):
    """Write ``export_state_dict``'s result as a torch-loadable .pth."""
    import torch

    sd = export_state_dict(variables, model_name, template_sd)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                if np.ndim(v) else torch.tensor(int(v))
                for k, v in sd.items()}, path)
    return path
