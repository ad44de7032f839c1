"""smow_net_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for bi-temporal
remote-sensing change detection, providing the full capability surface of the
SMOW-Net reference codebase (models, zoo, data pipeline, training/eval drivers)
re-designed TPU-first.

Layout conventions (TPU-friendly, channels-last):
  * 2D feature maps: (B, H, W, C)      — "NHWC"
  * 3D (temporal) feature maps: (B, T, H, W, C) — "NDHWC" with D==T

All models take a pair of RGB images and produce change-mask probabilities or
logits; see `smow_net_tpu.models.registry`.
"""

__version__ = "0.1.0"
