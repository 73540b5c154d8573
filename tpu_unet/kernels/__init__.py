from tpu_unet.kernels.postprocess import (argmax_mask, fused_argmax_mask,
                                          fused_mask_palette)
from tpu_unet.kernels.preprocess import normalize_images
