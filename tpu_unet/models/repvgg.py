"""RepVGG structural re-parameterization as a pure param-tree transform.

Parity target: nets/RepVGG_Unet.py:63-98 (get_equivalent_kernel_bias /
_fuse_bn_tensor / switch_to_deploy).  In JAX there is no mutable module
state: ``fold_repvgg`` maps a *training* variables dict for a model built
with ``deploy=False`` into the variables dict of the same model built with
``deploy=True``, folding each RepVGGBlock's three branches (3x3+BN, 1x1+BN,
identity-BN) into a single biased 3x3 conv.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpu_unet.nn.blocks import BN_EPS


def _fuse_conv_bn(kernel, bn):
    """Fold BN into a conv kernel (HWIO) → (kernel', bias')."""
    std = jnp.sqrt(bn["var"] + BN_EPS)
    t = bn["scale"] / std                       # (O,)
    return kernel * t[None, None, None, :], bn["bias"] - bn["mean"] * t


def _identity_kernel_bn(bn, channels: int):
    """BN-only branch as an equivalent 3x3 conv (reference:
    nets/RepVGG_Unet.py:80-85)."""
    k = jnp.zeros((3, 3, channels, channels))
    k = k.at[1, 1, jnp.arange(channels), jnp.arange(channels)].set(1.0)
    return _fuse_conv_bn(k, bn)


def _pad_1x1_to_3x3(kernel):
    return jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))


def fold_repvgg_block(params: dict, stats: dict) -> dict:
    """Fold one RepVGGBlock's params+batch_stats into {'reparam': conv}."""
    k3, b3 = _fuse_conv_bn(params["conv3"]["kernel"], stats["bn3"] | params["bn3"])
    k1, b1 = _fuse_conv_bn(params["conv1"]["kernel"], stats["bn1"] | params["bn1"])
    kernel = k3 + _pad_1x1_to_3x3(k1)
    bias = b3 + b1
    if "bnid" in params:
        cid = params["conv3"]["kernel"].shape[2]
        kid, bid = _identity_kernel_bn(stats["bnid"] | params["bnid"], cid)
        kernel = kernel + kid
        bias = bias + bid
    return {"reparam": {"kernel": kernel, "bias": bias}}


def _is_repvgg_block(params: dict, stats: dict) -> bool:
    return (
        isinstance(params, dict)
        and {"conv3", "bn3", "conv1", "bn1"} <= set(params.keys())
        and isinstance(stats, dict)
        and "bn3" in stats
    )


def fold_repvgg(variables: dict) -> dict:
    """Transform a deploy=False variables dict into the deploy=True one.

    Walks the tree; any subtree shaped like a RepVGGBlock is folded, BN
    running stats for folded blocks are dropped.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        if _is_repvgg_block(p, s if isinstance(s, dict) else {}):
            return fold_repvgg_block(p, s), None
        if not isinstance(p, dict):
            return p, s
        new_p, new_s = {}, {}
        for key, sub in p.items():
            ss = s.get(key) if isinstance(s, dict) else None
            np_, ns_ = walk(sub, ss)
            new_p[key] = np_
            if ns_ is not None:
                new_s[key] = ns_
        # keep any stats-only keys (BNs outside folded blocks)
        if isinstance(s, dict):
            for key in s:
                if key not in p:
                    new_s[key] = s[key]
        return new_p, (new_s or None)

    new_params, new_stats = walk(params, stats)
    out = {"params": new_params}
    if new_stats:
        out["batch_stats"] = new_stats
    return out
