from tpu_unet.eval.metrics import (confusion_matrix, per_class_iou,
                                   per_class_pa_recall, per_class_precision,
                                   per_accuracy, compute_miou_from_hist)
