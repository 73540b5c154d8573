from tpu_unet.train.losses import ce_loss, dice_loss, focal_loss, f_score
from tpu_unet.train.schedules import get_lr_scheduler, adaptive_lr
