from pcss_unet_tpu.infer.frame import InferenceEngine, load_variables
from pcss_unet_tpu.infer.tiled import infer_sharded, infer_tiled

__all__ = ["InferenceEngine", "load_variables", "infer_sharded", "infer_tiled"]
