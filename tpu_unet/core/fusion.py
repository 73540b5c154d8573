"""Runtime switches for the fused Pallas kernel paths.

All kill switches live here (one documented module, programmatic override
first, env var second, backend-derived default last):

==========================  =======================  =========================
switch                      env var                  default
==========================  =======================  =========================
:func:`use_fused_decoder`   ``TPU_UNET_FUSED_DECODER``  on for TPU backends
:func:`use_fused_loss`      ``TPU_UNET_FUSED_LOSS``     on for TPU backends
:func:`use_fused_train`     ``TPU_UNET_FUSED_TRAIN``    off (XLA autodiff wins)
:func:`use_paired_train`    ``TPU_UNET_PAIRED_TRAIN``   on for TPU backends
:func:`fuse_deep_stage`     ``TPU_UNET_FUSE_DEEP``      off (XLA wins, 0.89x)
:func:`use_lowres_up`       ``TPU_UNET_LOWRES_UP``      on for TPU backends
==========================  =======================  =========================

Defaults encode v5e measurements: the fused inference decoder and loss win
on TPU; the NATURAL-layout fused decoder in training (v1) loses to XLA
autodiff (Pallas boundary relayouts in the backward graph) and stays
opt-in, while the fully-PAIRED training region (paired decoder forward →
fused final-conv+loss → paired backward with in-kernel wgrads,
kernels/decoder_train.py) wins (69.0 vs 64.1 img/s/chip @512px/bs8) and
defaults on.  The deepest decoder stage (tiny spatial, heavy channels) is
faster through XLA's native conv pipeline.  On CPU/GPU every switch defaults off — the Pallas kernels are
pltpu-flavored (they fail to lower on GPU and only run in slow interpret
mode on CPU); tests exercise them explicitly with ``interpret=True``.

Env vars are read at trace time: flip them (or call the setters) BEFORE
the first jit of the affected function — changing them after compilation
has no effect on cached executables.
"""
from __future__ import annotations

import os

import jax

_TRUTHY_OFF = ("0", "false", "off")

_overrides: dict[str, bool | None] = {
    "decoder": None,
    "loss": None,
    "train": None,
    "paired_train": None,
    "deep": None,
    "lowres_up": None,
    "lowres_up_paired": None,
    "lowres_bwd": None,
    "lowres_bwd_paired": None,
    "tail256": None,
}


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _switch(name: str, env: str, default: bool) -> bool:
    if _overrides[name] is not None:
        return _overrides[name]
    val = os.environ.get(env)
    if val is not None:
        return val.lower() not in _TRUTHY_OFF
    return default


def set_fused_decoder(on: bool | None) -> None:
    """Force the fused inference decoder on/off (``None`` restores auto)."""
    _overrides["decoder"] = on


def set_fused_loss(on: bool | None) -> None:
    """Force the fused CE+dice loss kernel on/off (``None`` restores auto)."""
    _overrides["loss"] = on


def set_fused_train(on: bool | None) -> None:
    """Force the fused decoder in the TRAINING step on/off."""
    _overrides["train"] = on


def set_paired_train(on: bool | None) -> None:
    """Force the fully-paired training region (paired decoder head + v2
    paired backward) on/off (``None`` restores auto)."""
    _overrides["paired_train"] = on


def set_fuse_deep(on: bool | None) -> None:
    """Force fusion of the deepest decoder stage on/off."""
    _overrides["deep"] = on


def use_fused_decoder() -> bool:
    return _switch("decoder", "TPU_UNET_FUSED_DECODER", _on_tpu())


def use_fused_loss() -> bool:
    return _switch("loss", "TPU_UNET_FUSED_LOSS", _on_tpu())


def use_fused_train() -> bool:
    # programmatic override wins outright (tests force the kernel path in
    # interpret mode on CPU); the env var stays TPU-gated like the others
    if _overrides["train"] is not None:
        return _overrides["train"]
    return _switch("train", "TPU_UNET_FUSED_TRAIN", False) and _on_tpu()


def use_paired_train() -> bool:
    if _overrides["paired_train"] is not None:
        return _overrides["paired_train"]
    return _switch("paired_train", "TPU_UNET_PAIRED_TRAIN", _on_tpu())


def set_fused_tail256(on: bool | None) -> None:
    """Force the fused final-conv+argmax+histogram serving tail for the
    non-canonical (natural-layout) model families on/off."""
    _overrides["tail256"] = on


def use_fused_tail256() -> bool:
    """Fused serving tail for the 256px competition families: final 1×1
    conv + argmax + histogram in one Pallas pass over the pre-final
    feature map.  Measured at the committed 256px/b32 shape (v5e):
    TraditionalUnet 894.7→914.2 (+2.2%) but LadderUNet 971.8→847.7
    (−12.8%: its 44-lane feature map pads to 128 lanes in the tail
    matmul — 3× the read bytes of the 4-channel logits the plain path
    ships).  The wrapper therefore applies this per-family: on for
    TraditionalUnet, and for LadderUNet only when explicitly forced
    (see :func:`fused_tail256_forced`)."""
    return _switch("tail256", "TPU_UNET_FUSED_TAIL256", _on_tpu())


def fused_tail256_forced() -> bool:
    """True only when the tail256 switch was EXPLICITLY turned on
    (programmatic override or env var) — the LadderUNet family ignores
    the backend default because the fused tail measured slower there."""
    if _overrides["tail256"] is not None:
        return _overrides["tail256"]
    val = os.environ.get("TPU_UNET_FUSED_TAIL256")
    return val is not None and val.lower() not in _TRUTHY_OFF


def fuse_deep_stage(shape_default: bool = False) -> bool:
    """Deep decoder stage fusion.  ``shape_default``: the caller's
    per-shape measured default (decoder_fuse passes True for VGG's up4,
    which wins fused since round 4; everything else defaults off).  The
    env var / programmatic override still wins outright."""
    return _switch("deep", "TPU_UNET_FUSE_DEEP", shape_default)


def set_lowres_up(on: bool | None) -> None:
    """Force the low-res up-half conv1 decomposition in the wide decoder
    kernel on/off (``None`` restores auto)."""
    _overrides["lowres_up"] = on


def use_lowres_up() -> bool:
    return _switch("lowres_up", "TPU_UNET_LOWRES_UP", _on_tpu())


def set_lowres_up_paired(on: bool | None) -> None:
    """Force the paired (F < 128) low-res variant on/off."""
    _overrides["lowres_up_paired"] = on


def set_lowres_bwd(on: bool | None) -> None:
    """Force the low-res WIDE BACKWARD on/off (``None`` restores auto)."""
    _overrides["lowres_bwd"] = on


def use_lowres_bwd() -> bool:
    """Low-res up path in the wide decoder BACKWARD.

    Default ON for TPU since the stacked-L H-adjoint landed
    (kernels/decoder_train.py::_h_adjoint_rows_cat): the variant's three
    per-ky H-lerp adjoints were tiny-M (12×16) matmuls whose cost is set
    by the huge N (W·2F) — issued separately they tripled the MXU pass
    count and ate the conv1-up FLOP cut (measured 88.1/86.9 vs 88.0
    img/s/chip, kept opt-in through mid-round-3).  Stacked into ONE
    padded-block matmul the variant wins clearly: 96.6 vs 93.9
    img/s/chip @512px/bs8.  (The original fusion-emitter crash —
    ``fusion_emitter.cc pad_low check`` — was fixed earlier by writing
    the host-side weight unpack as one transpose+reshape, see
    ``_bwd_wide_lowres_call``.)"""
    if _overrides.get("lowres_bwd") is not None:
        return _overrides["lowres_bwd"]
    val = os.environ.get("TPU_UNET_LOWRES_BWD")
    if val is not None:
        return val.lower() not in _TRUTHY_OFF
    return _on_tpu()


def set_lowres_bwd_paired(on: bool | None) -> None:
    """Force the low-res PAIRED BACKWARD (the F < 128 up1 stage) on/off
    (``None`` restores auto)."""
    _overrides["lowres_bwd_paired"] = on


def use_lowres_bwd_paired() -> bool:
    """Low-res up path in the PAIRED decoder BACKWARD (the F < 128 up1
    stage, kernels/decoder_train.py ``_bwd_kernel_paired_lowres``).

    Unlike the wide stages (where the low-res backward measured neutral,
    :func:`use_lowres_bwd`), up1's backward is dominated by the VPU
    chains the decomposition removes — the full-res dup dgrad conv, the
    W-expand adjoint, and the cc up-half recompute (H-lerp + W-expand)
    all at 512² rows.  Default: on for TPU."""
    if _overrides.get("lowres_bwd_paired") is not None:
        return _overrides["lowres_bwd_paired"]
    val = os.environ.get("TPU_UNET_LOWRES_BWD_PAIRED")
    if val is not None:
        return val.lower() not in _TRUTHY_OFF
    return _on_tpu()


def use_lowres_up_paired() -> bool:
    # default follows the main lowres switch; separate env for A/B
    if _overrides["lowres_up_paired"] is not None:
        return _overrides["lowres_up_paired"]
    import os
    val = os.environ.get("TPU_UNET_LOWRES_UP_PAIRED")
    if val is not None:
        return val.lower() not in _TRUTHY_OFF
    return use_lowres_up()
