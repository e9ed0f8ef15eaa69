"""Camera-frame preprocessing, fused into the jitted forward pass.

The reference preprocesses on the host with cv2/numpy before every
``sess.run`` (reference models.py:84-95): resize to the model input size,
BGR→RGB, ``/256``, ImageNet mean/std, HWC→CHW, add batch dim.  That is a
full-frame CPU pass plus an extra host→device copy per frame.

Here the raw uint8 camera frame is what crosses the PCIe boundary; every
arithmetic step below runs on device inside the same XLA program as the
conv stack, where it fuses with the first convolution's input pipeline:

  uint8 BGR (H, W, 3) → bilinear resize → channel flip → scale/normalize
  → bfloat16 NHWC

Layout note: the reference feeds NCHW (models.py:92) because cuDNN prefers
it; TPU convs want NHWC (channels-last maps onto the MXU's lane dimension),
so the entire stack here is NHWC and the converter transposes weights once
at load time instead of transposing activations every frame.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import resize as resize_ops
from ..configs import ModelConfig

# ImageNet statistics (reference models.py:17-18).
IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


def preprocess_frame(frame_bgr: jax.Array,
                     input_hw: Tuple[int, int],
                     mean: Tuple[float, float, float] = IMAGE_MEAN,
                     std: Tuple[float, float, float] = IMAGE_STD,
                     scale: float = 1.0 / 256.0,
                     dtype=jnp.bfloat16) -> jax.Array:
    """uint8 BGR (..., H, W, 3) → normalized (..., h, w, 3) in ``dtype``.

    Matches reference models.py:84-95 semantics: note the reference divides
    by 256 (not 255) before normalizing — kept for parity.
    Jit-safe, batched over any leading axes.
    """
    x = frame_bgr.astype(jnp.float32)
    if frame_bgr.shape[-3:-1] != tuple(input_hw):
        # Resize operates on trailing (H, W); move channels before them.
        x = jnp.moveaxis(x, -1, -3)                  # (..., 3, H, W)
        x = resize_ops.resize_bilinear(x, input_hw)  # (..., 3, h, w)
        x = jnp.moveaxis(x, -3, -1)                  # (..., h, w, 3)
    x = x[..., ::-1]                                 # BGR → RGB
    x = x * scale
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.astype(dtype)


def preprocess_for_config(frame_bgr: jax.Array,
                          cfg: ModelConfig) -> jax.Array:
    return preprocess_frame(
        frame_bgr,
        (cfg.input_height, cfg.input_width),
        mean=cfg.image_mean,
        std=cfg.image_std,
        dtype=jnp.dtype(cfg.dtype),
    )


__all__ = ["preprocess_frame", "preprocess_for_config",
           "IMAGE_MEAN", "IMAGE_STD"]
