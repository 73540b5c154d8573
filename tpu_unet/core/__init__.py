from tpu_unet.core.mesh import create_mesh, shard_batch, replicate, local_batch_slice
from tpu_unet.core.precision import Precision, DEFAULT_PRECISION
from tpu_unet.core.rng import RngStream
