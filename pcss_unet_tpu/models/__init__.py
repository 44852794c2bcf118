from pcss_unet_tpu.models.unet import (
    ConvBlock, UNet, unet_for_variables, unet_from_config,
    widths_from_params,
)
from pcss_unet_tpu.models.vgg import VGG19Features

__all__ = ["ConvBlock", "UNet", "unet_for_variables", "unet_from_config",
           "widths_from_params", "VGG19Features"]
