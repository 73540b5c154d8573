"""tpu_unet — a TPU-native semantic-segmentation framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of the
reference PyTorch stack ``clolckliang/unet-pytorch`` (see SURVEY.md):

- ``tpu_unet.models``   — the full model zoo (VGG/ResNet50 UNet + 13 lightweight
  variants), as NHWC Flax modules designed for the MXU.
- ``tpu_unet.nn``       — shared blocks (DoubleConv, depthwise-separable,
  SE/CBAM/SK/RepVGG/STDC/CRFS attention) and exact-semantics resize ops.
- ``tpu_unet.core``     — mesh/sharding setup, precision policy, PRNG plumbing.
- ``tpu_unet.train``    — losses, LR schedules, the jitted data-parallel train step
  and the fit loop (freeze/unfreeze phases, callbacks, checkpoints).
- ``tpu_unet.data``     — VOC / medical / steel-defect input pipelines.
- ``tpu_unet.eval``     — device-side confusion-matrix mIoU.
- ``tpu_unet.infer``    — the ``Unet`` wrapper preserving the reference
  ``_defaults`` public API, plus the .pth → params converter.
"""

__version__ = "0.1.0"
