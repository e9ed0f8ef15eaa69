"""Model zoo: TPU-native rebuilds of the reference's inference engines.

Covers the reference's three backbones (reference models.py + the Keras
``model.h5``) plus the SegFormer configuration from BASELINE.json:

- :class:`~.enet.ENet`          — reference models.py:14-95 (enet.pb)
- :class:`~.deeplab.DeepLabV3`  — reference models.py:98-136 (deeplab.pb,
  capability-equivalent MobileNetV2 variant)
- :class:`~.xception.Xception65DeepLab` — the architecture-faithful twin
  of the actual deeplab.pb export (Xception-65 backbone)
- :class:`~.unet.UNet`          — the Keras model.h5 configuration
- :class:`~.segformer.SegFormer`— BASELINE.json config 5 (ViT/attention)

plus the shared pieces:

- :mod:`~.preprocess` — fused camera-frame preprocessing
- :mod:`~.remap`      — 15-class → 3-class drivability remap epilogue
- :mod:`~.api`        — the jitted :class:`~.api.Engine` wrapper
"""

from . import preprocess, remap
from .api import Engine, build_engine

__all__ = ["Engine", "build_engine", "preprocess", "remap"]
