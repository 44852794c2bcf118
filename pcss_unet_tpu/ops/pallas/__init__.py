from pcss_unet_tpu.ops.pallas.fused import (
    fused_mask_to_u8, fused_scrub_standardize, fused_shuffle_sigmoid,
    pallas_available,
)
from pcss_unet_tpu.ops.pallas.blend import blend_tiles_device

__all__ = ["fused_mask_to_u8", "fused_scrub_standardize",
           "fused_shuffle_sigmoid", "pallas_available", "blend_tiles_device"]
