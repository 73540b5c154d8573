from tpu_unet.models.registry import MODELS, build_model, count_params
