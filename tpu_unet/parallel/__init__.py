from tpu_unet.parallel.spatial import (create_2d_mesh, spatial_batch_sharding,
                                       shard_batch_spatial)
