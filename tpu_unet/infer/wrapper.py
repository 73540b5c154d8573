"""The ``Unet`` inference wrapper — the reference's public API, TPU-backed.

Parity target: unet.py:22-344 (class Unet) and its per-variant _config
clones (TraditionalUnet_config.py etc. — byte-level copies that swap the
model class; here that's just the ``model`` key).

The ``_defaults`` dict keys and semantics are preserved (README.md:74-105):
``model_path, num_classes, backbone, input_shape, mix_type (blend), cuda``.
``model`` selects any registry architecture (the <Variant>_config mechanism);
``backbone`` keeps its canonical-UNet meaning.

Pipeline (reference: unet.py:101-203): cvtColor → BICUBIC letterbox on gray
canvas → /255 → jitted forward+softmax on TPU → crop gray bars → bilinear
prob-map resize to the original size (cv2 INTER_LINEAR semantics) → argmax →
palette / blend / background-removal rendering.  The forward+softmax runs as
one compiled XLA graph; per-image crop/resize happens on host because
original sizes are dynamic (the fixed-shape batched path used for
benchmarks lives in ``batch_infer``).
"""
from __future__ import annotations

import colorsys
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tpu_unet.data.transforms import cvt_rgb
from tpu_unet.models.registry import MODELS, build_model

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# VOC 21-color palette + gray (reference: unet.py:67-71)
VOC_COLORS = [
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
    (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (192, 0, 0),
    (64, 128, 0), (192, 128, 0), (64, 0, 128), (192, 0, 128), (64, 128, 128),
    (192, 128, 128), (0, 64, 0), (128, 64, 0), (0, 192, 0), (128, 192, 0),
    (0, 64, 128), (128, 64, 12),
]


# single letterbox implementation lives in data/transforms.py
from tpu_unet.data.transforms import letterbox_image as _letterbox_image  # noqa: E402


class Unet:
    _defaults = {
        "model_path": "",
        "num_classes": 21,
        "backbone": "vgg",
        "input_shape": [512, 512],
        "mix_type": 0,
        "cuda": True,          # accepted for API parity; TPU placement is
                               # automatic under jit
        "model": None,         # registry name; None → canonical unet_<backbone>
    }

    @classmethod
    def get_defaults(cls, n):
        """reference: unet.py:374-379."""
        if n in cls._defaults:
            return cls._defaults[n]
        return f"Unrecognized attribute name '{n}'"

    def __init__(self, **kwargs):
        # instance attrs from defaults, kwargs override (reference:
        # unet.py:60-63 — the class dict itself is never mutated)
        self.__dict__.update(self._defaults)
        for name, value in kwargs.items():
            setattr(self, name, value)
        if self.num_classes <= 21:
            self.colors = list(VOC_COLORS)
        else:
            hsv = [(x / self.num_classes, 1.0, 1.0)
                   for x in range(self.num_classes)]
            self.colors = [tuple(int(c * 255) for c in colorsys.hsv_to_rgb(*t))
                           for t in hsv]
        self.generate()

    # ------------------------------------------------------------------
    def _model_name(self) -> str:
        if self.model:
            return self.model
        name = f"unet_{self.backbone}"
        if name not in MODELS:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        return name

    def generate(self, onnx: bool = False):
        """Build the net and load weights (reference: unet.py:86-96).

        ``onnx=True`` builds the forward WITHOUT the jit wrapper — the
        export path traces the bare function, exactly as the reference
        skips the DataParallel/cuda wrap for ONNX export (unet.py:93) —
        and skips the TPU fast-serving build."""
        name = self._model_name()
        self.net = build_model(name, self.num_classes)
        if self.model_path:
            from tpu_unet.train.checkpoint import load_any

            try:
                loaded = load_any(self.model_path, name)
                # full-state training checkpoints carry opt_state/epoch/…
                # alongside the weights; serving drops exactly those keys so
                # any extra model variable collection survives
                _STATE_KEYS = ("opt_state", "epoch", "step", "best_val")
                self.variables = {k: v for k, v in loaded.items()
                                  if k not in _STATE_KEYS}
            except KeyError as e:
                raise ValueError(
                    f"checkpoint {self.model_path!r} does not match model "
                    f"{name!r} (missing torch key {e})") from e
            print(f"{self.model_path} model, and classes loaded.")
        else:
            from tpu_unet.models.registry import init_model

            self.variables = init_model(self.net, tuple(self.input_shape))

        model = self.net
        on_tpu = jax.default_backend() in ("tpu", "axon")

        def forward_probs(variables, x):
            if x.dtype == jnp.uint8:
                # uint8 in, normalize on device: quarters the H2D bytes on
                # PCIe-bound hosts.  TPU uses the Pallas kernel (emits the
                # compute dtype in-VMEM); elsewhere plain /255 keeps the
                # historical bit-exact float path
                if on_tpu:
                    from tpu_unet.kernels.preprocess import normalize_images

                    x = normalize_images(x, jnp.float32)
                else:
                    x = x.astype(jnp.float32) / 255.0
            logits = model.apply(variables, x, False)
            if isinstance(logits, tuple):
                logits = logits[0]
            logits = logits.astype(jnp.float32)
            # models whose raw logits aren't at input resolution (lightweight
            # ×0.5, self_net ×2) are resized as the reference losses do
            if logits.shape[1:3] != x.shape[1:3]:
                from tpu_unet.nn.resize import resize_bilinear

                logits = resize_bilinear(logits, x.shape[1:3],
                                         align_corners=True)
            return jax.nn.softmax(logits, axis=-1)

        self._forward_probs = forward_probs if onnx else jax.jit(forward_probs)
        self._forward_probs_fn = forward_probs  # unjitted, for mask graphs
        self._serving = None  # built lazily by serving_step()
        self._mask_fns = {}   # (nh, nw) -> jitted device-side crop+argmax

    # ------------------------------------------------------------------
    def _probs_for(self, image: Image.Image):
        image = cvt_rgb(image)
        boxed, nw, nh = _letterbox_image(image, self.input_shape)
        # ship uint8; the forward normalizes on device (TPU: Pallas
        # normalize kernel — 1/4 the H2D bytes of the f32 upload)
        x = np.asarray(boxed, np.uint8)[None]
        pr = np.asarray(self._forward_probs(self.variables, x)[0])
        # crop the gray letterbox bars (reference: unet.py:139-140)
        oh, ow = self.input_shape
        pr = pr[(oh - nh) // 2:(oh - nh) // 2 + nh,
                (ow - nw) // 2:(ow - nw) // 2 + nw]
        return pr, image

    def _device_mask_for(self, image: Image.Image):
        """Single-image fast path: crop + argmax ON DEVICE, so only a
        uint8 mask (nh, nw) crosses D2H — ~84× fewer bytes than the
        ~22 MB f32 probability map of `_probs_for` at 512px/21 classes.

        Protocol-exact vs the reference's get_FPS loop (unet.py:205-258):
        that loop crops the softmax'd map then argmaxes AT INPUT
        RESOLUTION (no original-size resize inside the timed region), and
        per-pixel argmax commutes with softmax — identical masks, fraction
        of the transfer.  One jitted graph per letterboxed (nh, nw); the
        cache makes repeat sizes free."""
        image = cvt_rgb(image)
        boxed, nw, nh = _letterbox_image(image, self.input_shape)
        x = np.asarray(boxed, np.uint8)[None]
        mask = np.asarray(self._get_mask_fn(nh, nw)(self.variables, x))
        return mask, image

    def _get_mask_fn(self, nh: int, nw: int):
        """Cached jitted graph: forward → device crop to (nh, nw) →
        argmax → uint8 mask."""
        fn = self._mask_fns.get((nh, nw))
        if fn is None:
            oh, ow = self.input_shape
            y0, x0 = (oh - nh) // 2, (ow - nw) // 2
            probs_fn = self._forward_probs_fn

            def mask_fn(variables, x):
                pr = probs_fn(variables, x)[0]
                pr = jax.lax.slice(pr, (y0, x0, 0),
                                   (y0 + nh, x0 + nw, pr.shape[-1]))
                return jnp.argmax(pr, axis=-1).astype(jnp.uint8)

            fn = jax.jit(mask_fn)
            self._mask_fns[(nh, nw)] = fn
        return fn

    def _resize_probs(self, pr, orig_w, orig_h):
        """cv2 INTER_LINEAR prob-map resize (reference: unet.py:144)."""
        if cv2 is not None:
            return cv2.resize(pr, (orig_w, orig_h),
                              interpolation=cv2.INTER_LINEAR)
        from tpu_unet.nn.resize import resize_bilinear

        return np.asarray(resize_bilinear(pr, (orig_h, orig_w),
                                          align_corners=False))

    def _mask_resized(self, image, orig_w, orig_h):
        """Device-side mask + host nearest-resize — the `fast=True`
        rendering path.  Semantics caveat vs the default: the reference
        bilinearly resizes the PROBABILITY map to the original size
        before argmax (unet.py:144); resizing the argmax'd mask instead
        moves class boundaries by <1px at typical scales but ships ~84×
        fewer bytes off-device.  The default path stays reference-exact."""
        mask, image = self._device_mask_for(image)
        if (orig_h, orig_w) != mask.shape:
            if cv2 is not None:
                mask = cv2.resize(mask, (orig_w, orig_h),
                                  interpolation=cv2.INTER_NEAREST)
            else:
                mask = np.asarray(Image.fromarray(mask).resize(
                    (orig_w, orig_h), Image.NEAREST))
        return mask.astype(np.int64), image

    def detect_image(self, image: Image.Image, count: bool = False,
                     name_classes=None, fast: bool = False) -> Image.Image:
        """reference: unet.py:101-203.  ``fast=True`` computes the mask on
        device (uint8 D2H) and nearest-resizes it — see `_mask_resized`."""
        old_img = image.copy()
        orig_w, orig_h = image.size
        if fast:
            mask, image = self._mask_resized(image, orig_w, orig_h)
        else:
            pr, image = self._probs_for(image)
            pr = self._resize_probs(pr, orig_w, orig_h)
            mask = pr.argmax(axis=-1)

        if count:
            classes_nums = np.zeros(self.num_classes, np.int64)
            total = orig_h * orig_w
            print("-" * 63)
            print("|%25s | %15s | %15s|" % ("Key", "Value", "Ratio"))
            print("-" * 63)
            for i in range(self.num_classes):
                num = int((mask == i).sum())
                ratio = num / total * 100
                if num > 0:
                    name = name_classes[i] if name_classes else str(i)
                    print("|%25s | %15s | %14.2f%%|" % (name, num, ratio))
                    print("-" * 63)
                classes_nums[i] = num
            print("classes_nums:", classes_nums)

        if self.mix_type == 0:
            seg = np.asarray(self.colors, np.uint8)[
                mask.reshape(-1) % len(self.colors)].reshape(orig_h, orig_w, 3)
            new_img = Image.fromarray(seg)
            return Image.blend(cvt_rgb(old_img), new_img, 0.7)
        if self.mix_type == 1:
            seg = np.asarray(self.colors, np.uint8)[
                mask.reshape(-1) % len(self.colors)].reshape(orig_h, orig_w, 3)
            return Image.fromarray(seg)
        # mix_type 2: background removal (reference: unet.py:196-201)
        arr = np.asarray(cvt_rgb(old_img))
        seg = (arr * (mask[..., None] != 0)).astype(np.uint8)
        return Image.fromarray(seg)

    def get_miou_png(self, image: Image.Image,
                     fast: bool = False) -> Image.Image:
        """reference: unet.py:298-344 — class-index PNG at original size.
        ``fast=True``: device-side mask + nearest resize (`_mask_resized`)."""
        orig_w, orig_h = image.size
        if fast:
            mask, _ = self._mask_resized(image, orig_w, orig_h)
            return Image.fromarray(mask.astype(np.uint8))
        pr, _ = self._probs_for(image)
        pr = self._resize_probs(pr, orig_w, orig_h)
        return Image.fromarray(pr.argmax(axis=-1).astype(np.uint8))

    def get_FPS(self, image: Image.Image, test_interval: int,
                full_d2h: bool = False) -> float:
        """Timed forward+softmax+crop+argmax loop (reference:
        unet.py:205-258).

        The reference protocol argmaxes the cropped softmax map at input
        resolution; per-pixel argmax commutes with softmax, so the timed
        loop computes crop+argmax ON DEVICE and ships only the uint8 mask
        — same math, ~84× less D2H than the reference's full f32
        prob-map transfer.  ``full_d2h=True`` reverts to transferring the
        probability map like the reference implementation does (for
        apples-to-apples protocol comparisons)."""
        image = cvt_rgb(image)
        boxed, nw, nh = _letterbox_image(image, self.input_shape)
        x = np.asarray(boxed, np.uint8)[None]  # device-side normalize

        if full_d2h:
            def once():
                pr = np.asarray(self._forward_probs(self.variables, x)[0])
                oh, ow = self.input_shape
                pr = pr[(oh - nh) // 2:(oh - nh) // 2 + nh,
                        (ow - nw) // 2:(ow - nw) // 2 + nw]
                return pr.argmax(axis=-1)
        else:
            fn = self._get_mask_fn(nh, nw)

            def once():
                return np.asarray(fn(self.variables, x))

        once()  # warmup/compile
        t0 = time.time()
        for _ in range(test_interval):
            once()
        return (time.time() - t0) / test_interval

    # ------------------------------------------------------------------
    def _build_serving(self):
        """Build the batched serving step: (fn, variables) with
        ``fn(variables, images) -> (masks uint8 (N,H,W), hist int32
        (N,num_classes))`` — one jitted device-level graph.

        On TPU for the canonical models (unet_vgg / unet_resnet50) this is
        the measured fast path: bf16 params, paired-layout decoder head and
        the fused final-conv+argmax+histogram Pallas tail
        (kernels/postprocess.py) — the path bench.py times.  Elsewhere (or
        with the fused decoder disabled) it falls back to the plain
        forward + argmax graph.  Masks are identical between the two paths
        at matched precision (tests/test_serving_path.py)."""
        name = self._model_name()
        on_tpu = jax.default_backend() in ("tpu", "axon")
        num_classes = self.num_classes
        from tpu_unet.core.fusion import use_fused_decoder

        # gate on the fused-decoder switch (default: on for TPU, off
        # elsewhere — core/fusion.py); tests force it on CPU where the
        # kernels run in interpret mode
        fast = (use_fused_decoder()
                and name in ("unet_vgg", "unet_resnet50"))
        if on_tpu:  # bf16 compute: params cast once, BN stats stay f32
            variables = {
                "params": jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, jnp.bfloat16),
                    self.variables["params"]),
                **{k: v for k, v in self.variables.items() if k != "params"},
            }
        else:
            variables = self.variables

        if fast:
            from tpu_unet.kernels.postprocess import (
                fused_final_argmax_hist_paired)
            from tpu_unet.models.unet import Unet as UnetModel

            paired_model = UnetModel(
                num_classes=num_classes,
                backbone=("resnet50" if name == "unet_resnet50" else "vgg"),
                paired_head=True)
            fdt = jnp.bfloat16 if on_tpu else jnp.float32

            @jax.jit
            def step(variables, imgs):
                x = imgs.astype(fdt)
                if imgs.dtype == jnp.uint8:
                    x = x / fdt(255.0)
                feats = paired_model.apply(variables, x, False)
                masks, hist = fused_final_argmax_hist_paired(
                    feats, variables["params"]["final"]["kernel"],
                    variables["params"]["final"]["bias"], num_classes,
                    interpret=jax.default_backend() == "cpu")
                return masks, hist.astype(jnp.int32)

            return step, variables

        # natural-layout fused tail for the 256px competition families:
        # final 1×1 conv + argmax + per-image histogram in one Pallas pass
        # over the pre-final feature map — the logit tensor never touches
        # HBM (A/B recorded in STATUS.md; reference tail:
        # results__exported .py:48-55)
        from tpu_unet.core.fusion import (fused_tail256_forced,
                                          use_fused_tail256)
        from tpu_unet.models.ladder import LadderUNet
        from tpu_unet.models.traditional import TraditionalUnet

        # per-family gate (measured, see fusion.use_fused_tail256): the
        # tail wins on TraditionalUnet and loses on the 44-wide ladder
        # family, which only honors an EXPLICIT force
        tail_ok = (isinstance(self.net, TraditionalUnet)
                   and use_fused_tail256()) or (
            isinstance(self.net, LadderUNet) and fused_tail256_forced())
        if tail_ok:
            from tpu_unet.kernels.postprocess import fused_final_argmax_hist

            feat_model = self.net.clone(features_out=True)
            final_name = ("outc" if isinstance(self.net, TraditionalUnet)
                          else "final")
            fdt = jnp.bfloat16 if on_tpu else jnp.float32

            @jax.jit
            def step(variables, imgs):
                x = imgs.astype(fdt)
                if imgs.dtype == jnp.uint8:
                    x = x / fdt(255.0)
                feats = feat_model.apply(variables, x, False)
                masks, hist = fused_final_argmax_hist(
                    feats, variables["params"][final_name]["kernel"],
                    variables["params"][final_name]["bias"], num_classes,
                    interpret=jax.default_backend() == "cpu")
                return masks.astype(jnp.uint8), hist.astype(jnp.int32)

            return step, variables

        model = self.net
        dt = jnp.bfloat16 if on_tpu else jnp.float32

        @jax.jit
        def step(variables, imgs):
            x = imgs.astype(dt)
            if imgs.dtype == jnp.uint8:
                x = x / dt(255.0)
            logits = model.apply(variables, x, False)
            if isinstance(logits, tuple):
                logits = logits[0]
            if logits.shape[1:3] != x.shape[1:3]:
                from tpu_unet.nn.resize import resize_bilinear

                logits = resize_bilinear(logits.astype(jnp.float32),
                                         x.shape[1:3], align_corners=True)
            masks = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            classes = jnp.arange(num_classes, dtype=jnp.uint8)
            hist = (masks[..., None] == classes).sum(axis=(1, 2))
            return masks, hist.astype(jnp.int32)

        return step, variables

    def serving_step(self):
        """Public access to the batched device-level serving step — for
        embedding in production loops (and what bench.py drives).  Returns
        ``(fn, variables)``; see :meth:`_build_serving` for semantics."""
        if getattr(self, "_serving", None) is None:
            self._serving = self._build_serving()
        return self._serving

    def serving_step_sharded(self, mesh, axis_name: str = "data"):
        """Data-parallel serving over a ``jax.sharding.Mesh`` — the
        multi-chip counterpart of :meth:`serving_step` (reference:
        DataParallel inference, unet.py:95).

        The single-chip serving step (including the fused Pallas fast
        path) is ``shard_map``-ped over the batch axis, so each chip runs
        the full kernel pipeline on its local batch shard with zero
        collectives — inference is embarrassingly data-parallel.  Returns
        ``(fn, variables)`` with the variables already replicated on the
        mesh; callers place the image batch with a
        ``NamedSharding(mesh, P(axis_name))`` (or pass host arrays and
        let jit shard them via the function's input sharding).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn, variables = self.serving_step()
        smapped = jax.shard_map(
            fn, mesh=mesh, in_specs=(P(), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name)), check_vma=False)
        step = jax.jit(smapped)
        v_mesh = jax.device_put(variables, NamedSharding(mesh, P()))
        return step, v_mesh

    def batch_infer_sharded(self, images: np.ndarray, mesh,
                            axis_name: str = "data") -> np.ndarray:
        """:meth:`batch_infer` over a device mesh: (N, H, W, 3) → (N, H, W)
        masks with N sharded across ``axis_name``.  N must divide evenly
        by the mesh axis size."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn, variables = self.serving_step_sharded(mesh, axis_name)
        imgs = np.asarray(images)
        n_shard = mesh.shape[axis_name]
        if imgs.shape[0] % n_shard:
            raise ValueError(
                f"batch {imgs.shape[0]} not divisible by mesh axis "
                f"{axis_name!r} of size {n_shard}")
        imgs = jax.device_put(imgs, NamedSharding(mesh, P(axis_name)))
        masks, _ = fn(variables, imgs)
        return np.asarray(masks).astype(np.int32)

    def batch_infer(self, images: np.ndarray) -> np.ndarray:
        """Fixed-shape batched masks — the TPU throughput path.
        ``images``: (N, H, W, 3) uint8/float at input_shape; returns
        (N, H, W) int32 argmax masks, all computed in one XLA graph (on
        TPU: the paired-head + fused-tail fast path)."""
        fn, variables = self.serving_step()
        imgs = np.asarray(images)
        if imgs.dtype != np.uint8:
            imgs = imgs.astype(np.float32)
            if imgs.max() > 1.5:
                imgs = imgs / 255.0
        masks, _ = fn(variables, imgs)
        return np.asarray(masks).astype(np.int32)

    def convert_to_export(self, path: str):
        """Serialized-StableHLO export — the idiomatic counterpart of
        convert_to_onnx (reference: unet.py:260-296)."""
        from tpu_unet.tools.export import export_stablehlo

        return export_stablehlo(self, path)
