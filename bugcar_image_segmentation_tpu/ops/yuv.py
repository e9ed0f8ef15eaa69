"""I420 (YUV 4:2:0) frame transport: half the link bytes per frame.

The reference ships full BGR frames from the camera thread into the
model process (reference models.py:83-87).  On a bandwidth-bound
host↔device link (the tunneled bench TPU measures 5-85 MB/s — PERF.md),
the 3 B/px BGR frame IS the bottleneck, and cameras natively emit YUV
4:2:0 at 1.5 B/px anyway — so the TPU-native pipeline can ship what the
sensor produces and do the color conversion on device, fused into the
preprocess stage (models/preprocess.py) where it is VPU noise.

Host side packs cv2's I420 layout ((3H/2, W) uint8: full-res Y plane,
then the 2x2-subsampled U and V planes); device side applies the
ITU-R BT.601 video-range inverse — verified within ±1 of
``cv2.COLOR_YUV2BGR_I420`` (tests/test_ops_parity.py), so a consumer
feeding real camera NV12/I420 buffers gets cv2-equivalent colors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .resize import upsample_nearest_int


def i420_shape(frame_hw: tuple) -> tuple:
    """(H, W) → the packed I420 buffer shape (3H/2, W)."""
    h, w = frame_hw
    if h % 2 or w % 2:
        raise ValueError(f"I420 needs even H, W; got {(h, w)}")
    return (h * 3 // 2, w)


def bgr_to_i420_host(frame_bgr: np.ndarray) -> np.ndarray:
    """Host-side packing via cv2 (what a camera driver would hand us)."""
    import cv2
    return cv2.cvtColor(np.asarray(frame_bgr), cv2.COLOR_BGR2YUV_I420)


def i420_to_bgr(packed: jax.Array, frame_hw: tuple) -> jax.Array:
    """Device-side I420 → uint8 BGR, jit-safe.

    BT.601 video-range coefficients matching cv2's fixed-point
    ``YUV2BGR_I420`` within ±1 (the measured max deviation; the result
    feeds a conv net, so sub-LSB parity is irrelevant).

    Batch-aware: accepts ``(..., 3H/2, W)`` and converts the trailing
    frame axes — the batched streaming path calls it directly on the
    ``(K, 3H/2, W)`` transfer batch (a ``vmap`` of the 2D form measured
    +0.18 ms/frame at K=4; the explicit leading-dims form does not —
    PERF.md round 5b).
    """
    h, w = frame_hw
    lead = packed.shape[:-2]
    y = packed[..., :h, :].astype(jnp.float32)
    u = packed[..., h:h * 5 // 4, :].reshape(
        lead + (h // 2, w // 2)).astype(jnp.float32)
    v = packed[..., h * 5 // 4:, :].reshape(
        lead + (h // 2, w // 2)).astype(jnp.float32)

    # Chroma ×2 via broadcast+reshape (ops/resize.py) — jnp.repeat
    # lowers to gathers, the per-index cost class this runs every frame.
    uu = upsample_nearest_int(u, 2) - 128.0
    vv = upsample_nearest_int(v, 2) - 128.0
    yy = 1.164 * (y - 16.0)
    r = yy + 1.596 * vv
    g = yy - 0.813 * vv - 0.391 * uu
    b = yy + 2.018 * uu
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(bgr), 0, 255).astype(jnp.uint8)


__all__ = ["i420_shape", "bgr_to_i420_host", "i420_to_bgr"]
