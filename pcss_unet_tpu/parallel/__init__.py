from pcss_unet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_sharding, shard_train_inputs,
)
from pcss_unet_tpu.parallel.dp import (
    Zero1State, build_explicit_dp_train_step, build_zero1_dp_train_step,
    create_zero1_state,
)

__all__ = ["make_mesh", "batch_sharding", "replicate_sharding",
           "shard_train_inputs", "build_explicit_dp_train_step",
           "Zero1State", "create_zero1_state", "build_zero1_dp_train_step"]
