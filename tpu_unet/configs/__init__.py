from tpu_unet.configs.presets import TrainConfig, PRESETS, get_preset
