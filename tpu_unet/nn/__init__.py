from tpu_unet.nn.resize import resize_bilinear, upsample2x
from tpu_unet.nn import blocks
