from tpu_unet.data.datasets import (DefectSegDataset, MedicalSegDataset,
                                    VOCSegDataset, read_split)
from tpu_unet.data.loader import Loader
