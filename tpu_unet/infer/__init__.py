from tpu_unet.infer.convert import convert_pth, CONVERTERS
from tpu_unet.infer.wrapper import Unet
