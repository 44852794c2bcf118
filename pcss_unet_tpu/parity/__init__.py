from pcss_unet_tpu.parity.consistency import (
    compare_outputs, validate_train_infer_consistency,
)

__all__ = ["compare_outputs", "validate_train_infer_consistency"]
