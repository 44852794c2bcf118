from pcss_unet_tpu.utils.logging import setup_logger
from pcss_unet_tpu.utils.memory import estimate_memory_usage, device_memory_stats
from pcss_unet_tpu.utils.prng import set_seed

__all__ = ["setup_logger", "estimate_memory_usage", "device_memory_stats",
           "set_seed"]
