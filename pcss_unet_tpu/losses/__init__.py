from pcss_unet_tpu.losses.composite import LossBundle, standard_loss, enhanced_loss
from pcss_unet_tpu.losses.vgg import PerceptualLoss
from pcss_unet_tpu.losses.perturbation import perturbation_loss
from pcss_unet_tpu.losses.extras import (
    high_freq_loss, penumbra_weighted_l1, sobel_gradient_loss,
)
from pcss_unet_tpu.losses.ssim import ssim, ssim_loss
from pcss_unet_tpu.losses.temporal import measure_temporal_instability

__all__ = [
    "LossBundle", "standard_loss", "enhanced_loss", "PerceptualLoss",
    "perturbation_loss", "high_freq_loss", "penumbra_weighted_l1",
    "sobel_gradient_loss", "measure_temporal_instability", "ssim", "ssim_loss",
]
