from tpu_unet.infer.convert import convert_pth, CONVERTERS
