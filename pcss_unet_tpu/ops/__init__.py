"""TPU-shaped primitive ops: align-corners bilinear resize, space/depth
shuffles with torch channel ordering, average pooling, and Pallas kernels."""

from pcss_unet_tpu.ops.resize import resize_bilinear_align_corners, upsample2x_align_corners
from pcss_unet_tpu.ops.pixelshuffle import (pixel_shuffle_nhwc,
                                            pixel_shuffle_nhwc_mxu,
                                            pixel_unshuffle_nhwc,
                                            pixel_unshuffle_nhwc_mxu)
from pcss_unet_tpu.ops.pooling import avg_pool_2x

__all__ = [
    "resize_bilinear_align_corners",
    "upsample2x_align_corners",
    "pixel_unshuffle_nhwc",
    "pixel_unshuffle_nhwc_mxu",
    "pixel_shuffle_nhwc",
    "pixel_shuffle_nhwc_mxu",
    "avg_pool_2x",
]
