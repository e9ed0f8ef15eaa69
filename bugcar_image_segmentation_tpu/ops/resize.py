"""Image resizing with cv2 coordinate conventions, as TPU gathers.

Two resamplers cover everything the reference does with ``cv2.resize``:

- ``resize_nearest``: INTER_NEAREST with cv2's ``sx = floor(dx * src/dst)``
  convention (reference bev.py:139-141, 209-212 — the template→cell binning
  step).  Verified **bit-exact** against cv2 on arbitrary shapes.
- ``resize_bilinear``: INTER_LINEAR with half-pixel-centre sampling and
  replicated edges (reference models.py:87, 129 — camera frame → model
  input).  cv2 5.0's u8 path differs from exact float bilinear by at most
  ±1 on ~12% of pixels (internal arithmetic order); this feeds a conv net,
  so exactness is irrelevant — we keep the clean float form, which also
  fuses into the jitted preprocessing.

Like the warp, index/weight plans are host-precomputed per (src, dst) shape
pair; the device side is gathers + VPU math with static shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _nearest_indices(src: int, dst: int) -> np.ndarray:
    scale = src / dst
    idx = np.minimum((np.arange(dst) * scale).astype(np.int64), src - 1)
    return idx.astype(np.int32)


def resize_nearest(img: jax.Array, dst_hw: Tuple[int, int]) -> jax.Array:
    """cv2.resize(..., interpolation=INTER_NEAREST) for (..., H, W) arrays."""
    dh, dw = dst_hw
    sh, sw = img.shape[-2], img.shape[-1]
    ys = jnp.asarray(_nearest_indices(sh, dh))
    xs = jnp.asarray(_nearest_indices(sw, dw))
    return img[..., ys, :][..., :, xs]


@functools.lru_cache(maxsize=64)
def _linear_axis(src: int, dst: int):
    x = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    x0 = np.floor(x).astype(np.int64)
    frac = (x - x0).astype(np.float32)
    i0 = np.clip(x0, 0, src - 1).astype(np.int32)
    i1 = np.clip(x0 + 1, 0, src - 1).astype(np.int32)
    return i0, i1, frac


def resize_bilinear(img: jax.Array, dst_hw: Tuple[int, int]) -> jax.Array:
    """Half-pixel-centre bilinear resize for (..., H, W[, C]) float arrays.

    Channel-last inputs are handled by resizing the last two *spatial* dims,
    assumed to be the trailing two unless the array is (..., H, W, C) with
    C <= 4 — callers with channels should move them leading or pass HW-last.
    This function treats the trailing two axes as (H, W).
    """
    dh, dw = dst_hw
    sh, sw = img.shape[-2], img.shape[-1]
    iy0, iy1, fy = _linear_axis(sh, dh)
    ix0, ix1, fx = _linear_axis(sw, dw)
    fy = jnp.asarray(fy)[:, None]
    fx = jnp.asarray(fx)[None, :]
    x = img.astype(jnp.float32)
    top = x[..., iy0, :]
    bot = x[..., iy1, :]
    row = top * (1.0 - fy) + bot * fy
    left = row[..., :, ix0]
    right = row[..., :, ix1]
    return left * (1.0 - fx) + right * fx


def resize_bilinear_u8(img: jax.Array, dst_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with u8 in/out and cv2-style round-half-even."""
    out = resize_bilinear(img, dst_hw)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def _up_axis(x: jax.Array, f: int, axis: int) -> jax.Array:
    """One axis of :func:`upsample_bilinear_int`: f phase images, each a
    2-tap blend of edge-clamped ±1 shifts, interleaved by reshape."""
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim

    def shifted(delta):
        a, b = list(sl), list(sl)
        if delta < 0:
            a[axis] = slice(0, 1)
            b[axis] = slice(0, n - 1)
        else:
            a[axis] = slice(1, n)
            b[axis] = slice(n - 1, n)
        return jnp.concatenate([x[tuple(a)], x[tuple(b)]], axis=axis)

    xm1, xp1 = shifted(-1), shifted(+1)
    phases = []
    for p in range(f):
        d = (p + 0.5) / f - 0.5   # in-coord offset of output phase p
        if d < 0:
            phases.append(x * (1.0 + d) + xm1 * (-d))
        elif d > 0:
            phases.append(x * (1.0 - d) + xp1 * d)
        else:
            phases.append(x)
    y = jnp.stack(phases, axis=axis % x.ndim + 1)   # (..., n, f, ...)
    shape = list(x.shape)
    shape[axis % x.ndim] = n * f
    return y.reshape(shape)


def upsample_nearest_int(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor nearest upsample of the trailing (H, W) axes by
    exact pixel replication — a broadcast + reshape, no gather.

    For integer factors this is bit-identical to both
    ``cv2.resize(..., INTER_NEAREST)`` and
    ``jax.image.resize(method="nearest")``: every destination block of
    ``factor``² pixels maps to the single source pixel it covers.  Used
    to lift quarter-resolution LABEL maps (SegFormer
    ``head_upsample="quarter"``) back to input resolution — replicating
    1 B/px labels instead of bilinearly upsampling 60 B/px f32 logits
    (the resize role of reference models.py:87,129, moved to after the
    argmax).
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if factor == 1:
        return x
    h, w = x.shape[-2], x.shape[-1]
    y = jnp.broadcast_to(x[..., :, None, :, None],
                         x.shape[:-2] + (h, factor, w, factor))
    return y.reshape(x.shape[:-2] + (h * factor, w * factor))


def upsample_bilinear_int(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor bilinear upsample of the trailing (H, W) axes,
    exactly matching ``jax.image.resize(method="bilinear")`` (half-pixel
    centres; out-of-range taps renormalize to the edge pixel — identical
    to edge clamping when only one tap is in range).

    Decomposed into ``factor`` fixed 2-tap phase blends per axis + a
    reshape interleave: pure shifts and VPU math, no gather.  NOTE —
    measured on the v5e this LOSES to ``jax.image.resize`` for large
    upsamples (1.07 vs 0.77 ms on the SegFormer head tail; the lane-dim
    phase interleave forces a Mosaic relayout that dominates — PERF.md
    round 3b), so the hot decode-head path does not use it.  Kept as the
    exact-parity building block for host-side / small-tensor use.

    Rebuilds the upsampling role of reference models.py:87,129 at the
    decode-head scale.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if factor == 1:
        return x
    return _up_axis(_up_axis(x, factor, -2), factor, -1)


__all__ = ["resize_nearest", "resize_bilinear", "resize_bilinear_u8",
           "upsample_nearest_int", "upsample_bilinear_int"]
