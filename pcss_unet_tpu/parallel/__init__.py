from pcss_unet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_sharding, shard_train_inputs,
)

__all__ = ["make_mesh", "batch_sharding", "replicate_sharding",
           "shard_train_inputs"]
