from pcss_unet_tpu.ops.pallas.fused import (
    fused_mask_to_u8, fused_scrub_standardize, pallas_available,
)
from pcss_unet_tpu.ops.pallas.blend import blend_tiles_device
from pcss_unet_tpu.ops.pallas.convblock import (
    fused_conv_block_nhwc, pack_convblock_params,
)

__all__ = ["fused_mask_to_u8", "fused_scrub_standardize",
           "pallas_available", "blend_tiles_device",
           "fused_conv_block_nhwc", "pack_convblock_params"]
