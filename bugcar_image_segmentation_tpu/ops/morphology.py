"""Grayscale/binary morphology on TPU via shifted-slice min/max chains.

Replaces ``cv2.morphologyEx`` / erode / dilate (reference bev.py:130-131,
198-199 speckle removal; image_processing_utils.py:9 gap closing).  OpenCV's
default border handling pads erode with +inf and dilate with -inf — i.e. the
border never constrains the reduction — reproduced here by padding with the
reduction's identity (verified bit-exact against cv2 on random binary and
grayscale images).

Lowering note: ``lax.reduce_window`` is pathologically slow on TPU for
small windows (measured ~0.45 ms for a 3x3 over 400x400 u8); the same
reduction as kh*kw shifted slices + elementwise min/max is an order of
magnitude faster and fuses with neighbors (see ops/pooling.py).

All ops take (..., H, W) arrays and rectangular all-ones kernels (the only
structuring elements the reference uses).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _window_reduce(x: jax.Array, ksize: Tuple[int, int], op: str) -> jax.Array:
    kh, kw = ksize
    if kh < 1 or kw < 1:
        raise ValueError(f"kernel must be >= 1x1, got {ksize}")
    # cv2's default anchor is k//2 and — verified empirically on cv2 5.0 —
    # BOTH erode and dilate reduce over src[x - anchor : x + k - anchor)
    # (no structuring-element mirroring for the all-ones rect kernel).
    ah, aw = kh // 2, kw // 2
    if jnp.issubdtype(x.dtype, jnp.integer):
        init = (jnp.iinfo(x.dtype).max if op == "min"
                else jnp.iinfo(x.dtype).min)
    else:
        init = (jnp.inf if op == "min" else -jnp.inf)
    combine = jnp.minimum if op == "min" else jnp.maximum

    nd = x.ndim
    pad_width = ((0, 0),) * (nd - 2) + ((ah, kh - 1 - ah),
                                        (aw, kw - 1 - aw))
    padded = jnp.pad(x, pad_width, constant_values=init)
    h, w = x.shape[-2], x.shape[-1]
    out = None
    for dy in range(kh):
        for dx in range(kw):
            v = padded[..., dy:dy + h, dx:dx + w]
            out = v if out is None else combine(out, v)
    return out


def erode(x: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    """Min-filter; cv2.erode with an all-ones kernel and default border."""
    return _window_reduce(x, ksize, "min")


def dilate(x: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    """Max-filter; cv2.dilate with an all-ones kernel and default border."""
    return _window_reduce(x, ksize, "max")


def morph_open(x: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    """Erosion then dilation — removes speckles smaller than the kernel
    (cv2.MORPH_OPEN, used at reference bev.py:130-131, 198-199)."""
    return dilate(erode(x, ksize), ksize)


def morph_close(x: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    """Dilation then erosion — fills gaps smaller than the kernel
    (cv2.MORPH_CLOSE, used at reference image_processing_utils.py:9)."""
    return erode(dilate(x, ksize), ksize)


__all__ = ["erode", "dilate", "morph_open", "morph_close"]
