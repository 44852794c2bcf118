"""pcss_unet_tpu — a TPU-native (JAX / Flax / Pallas / pjit) framework for
Neural Shadow Mapping (Datta et al., SIGGRAPH '22).

Re-implements, TPU-first, every capability of the PyTorch reference
SDU-Gary/PCSS-Unet (see SURVEY.md for the structural map of the reference):

- ``pcss_unet_tpu.io``      — EXR/PNG codecs (native C++ EXR decoder + pure-Python
                              fallback); reference: setdata.py:34-110 read_exr.
- ``pcss_unet_tpu.data``    — scene organization, streaming record packing,
                              per-channel statistics, device input pipeline;
                              reference: organize_data.py / prepare_dataset.py /
                              calculate_dataset_stats.py / setdata.py.
- ``pcss_unet_tpu.models``  — NHWC Flax U-Net (pixel-unshuffle front, additive
                              skips, bilinear align-corners upsampling, sigmoid
                              head); reference: Unetmodel.py.
- ``pcss_unet_tpu.ops``     — TPU-shaped primitives (align-corners resize,
                              space/depth shuffles, Pallas kernels).
- ``pcss_unet_tpu.losses``  — L1 + multi-layer VGG-19 perceptual loss +
                              input-perturbation temporal-stability loss;
                              reference: customLoss.py / pert_loss.py.
- ``pcss_unet_tpu.train``   — jitted train step, warmup+cosine schedule, Orbax
                              checkpointing with resume; reference: main.py.
- ``pcss_unet_tpu.infer``   — batched full-frame and spatially-sharded tiled
                              inference; reference: infer.py / inference.py.
- ``pcss_unet_tpu.parallel``— mesh construction and sharding rules (DP over
                              batch, spatial partitioning for full frames).
- ``pcss_unet_tpu.parity``  — train-vs-infer consistency and torch-checkpoint
                              parity harnesses; reference: validate_consistency.py.
"""

__version__ = "0.1.0"
