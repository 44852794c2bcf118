from pcss_unet_tpu.models.unet import ConvBlock, UNet, unet_from_config
from pcss_unet_tpu.models.vgg import VGG19Features

__all__ = ["ConvBlock", "UNet", "unet_from_config", "VGG19Features"]
