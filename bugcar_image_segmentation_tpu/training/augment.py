"""Jittable batched data augmentation for segmentation training.

The reference has no training code at all (its models arrive frozen —
reference utils.py:49-83 is the only train→deploy tool), so it also has
no augmentation story.  A usable fine-tuning loop needs one: this module
provides the standard segmentation augmentations as a single jittable,
statically-shaped batch transform, designed for TPU:

- all outputs keep the input shapes (XLA never recompiles across steps);
- per-sample randomness comes from ``jax.random`` keys (pure, replayable);
- geometric transforms move image and label together — bilinear for the
  image, nearest for the label, out-of-view label pixels become
  ``ignore_label`` so the loss (training/trainer.py) skips them;
- everything is expressed as gathers/selects that XLA fuses into the
  host→device preprocessing program, so augmentation rides the training
  step instead of a host-side Python loop.

Use :func:`augment_batch` (or wire ``--augment`` in scripts/train.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    """Knobs for :func:`augment_batch`.  Ranges are per-sample uniform."""

    flip: bool = True                       # horizontal mirror, p=0.5
    scale: Tuple[float, float] = (0.75, 1.25)   # random zoom (area crop)
    brightness: float = 0.2                 # +/- additive, [0,1] space
    contrast: float = 0.2                   # +/- multiplicative
    saturation: float = 0.2                 # +/- around the gray axis
    noise_std: float = 0.01                 # gaussian, [0,1] space
    ignore_label: int = 255                 # fill for out-of-view labels


def _affine_resample(image: jax.Array, label: jax.Array,
                     scale: jax.Array, cx: jax.Array, cy: jax.Array,
                     ignore_label: int) -> Tuple[jax.Array, jax.Array]:
    """Resample ONE (H, W, C) image + (H, W) label through a zoom.

    Output pixel (i, j) reads source (cy + (i - H/2) * scale,
    cx + (j - W/2) * scale): ``scale < 1`` zooms in (crop), ``scale > 1``
    zooms out (the view leaves the frame; those pixels become 0 /
    ``ignore_label``).  Bilinear image taps, nearest label tap — the
    same split the serving grid uses for class maps (ops/warp.py
    warps labels nearest for the same reason: blending class ids
    invents classes).
    """
    h, w = label.shape
    ys = cy + (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0) * scale
    xs = cx + (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0) * scale
    sy = ys[:, None] + jnp.zeros((1, w), jnp.float32)
    sx = xs[None, :] + jnp.zeros((h, 1), jnp.float32)

    inb = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)

    y0 = jnp.clip(jnp.floor(sy), 0, h - 1)
    x0 = jnp.clip(jnp.floor(sx), 0, w - 1)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    flat = image.reshape(h * w, -1)

    def tap(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    top = tap(y0i, x0i) * (1 - fx)[..., None] + tap(y0i, x1i) * fx[..., None]
    bot = tap(y1i, x0i) * (1 - fx)[..., None] + tap(y1i, x1i) * fx[..., None]
    img = top * (1 - fy)[..., None] + bot * fy[..., None]
    img = jnp.where(inb[..., None], img, 0.0).astype(image.dtype)

    yn = jnp.clip(jnp.round(sy), 0, h - 1).astype(jnp.int32)
    xn = jnp.clip(jnp.round(sx), 0, w - 1).astype(jnp.int32)
    lbl = jnp.take(label.reshape(-1), yn * w + xn, axis=0)
    lbl = jnp.where(inb, lbl, jnp.asarray(ignore_label, label.dtype))
    return img, lbl


def augment_batch(key: jax.Array, images: jax.Array, labels: jax.Array,
                  cfg: AugmentConfig = AugmentConfig(),
                  ) -> Tuple[jax.Array, jax.Array]:
    """Apply the configured augmentations to an (N, H, W, 3) float batch
    in [0, 1] and its (N, H, W) integer labels.  Pure and jittable;
    shapes and dtypes are preserved exactly.
    """
    if images.ndim != 4 or labels.ndim != 3:
        raise ValueError(f"expected (N,H,W,C) images + (N,H,W) labels, got "
                         f"{images.shape} / {labels.shape}")
    n, h, w, _ = images.shape
    k_flip, k_scale, k_cx, k_cy, k_b, k_c, k_s, k_n = jax.random.split(key, 8)

    # Horizontal flip (per sample).
    if cfg.flip:
        do = jax.random.bernoulli(k_flip, 0.5, (n,))
        images = jnp.where(do[:, None, None, None], images[:, :, ::-1], images)
        labels = jnp.where(do[:, None, None], labels[:, :, ::-1], labels)

    # Random zoom about a random in-frame center.
    lo, hi = cfg.scale
    if (lo, hi) != (1.0, 1.0):
        s = jax.random.uniform(k_scale, (n,), minval=lo, maxval=hi)
        # Center jitter: keep the crop window inside the frame when
        # zooming in; centered when zooming out.
        slack_y = jnp.maximum((h - 1) * (1 - s) / 2.0, 0.0)
        slack_x = jnp.maximum((w - 1) * (1 - s) / 2.0, 0.0)
        cy = (h - 1) / 2.0 + jax.random.uniform(
            k_cy, (n,), minval=-1.0, maxval=1.0) * slack_y
        cx = (w - 1) / 2.0 + jax.random.uniform(
            k_cx, (n,), minval=-1.0, maxval=1.0) * slack_x
        images, labels = jax.vmap(
            lambda im, lb, ss, xx, yy: _affine_resample(
                im, lb, ss, xx, yy, cfg.ignore_label)
        )(images, labels, s, cx, cy)

    # Photometric: brightness / contrast / saturation (image only).
    f32 = images.astype(jnp.float32)
    if cfg.brightness > 0:
        b = jax.random.uniform(k_b, (n, 1, 1, 1), minval=-cfg.brightness,
                               maxval=cfg.brightness)
        f32 = f32 + b
    if cfg.contrast > 0:
        c = 1.0 + jax.random.uniform(k_c, (n, 1, 1, 1),
                                     minval=-cfg.contrast,
                                     maxval=cfg.contrast)
        mean = jnp.mean(f32, axis=(1, 2, 3), keepdims=True)
        f32 = (f32 - mean) * c + mean
    if cfg.saturation > 0:
        sat = 1.0 + jax.random.uniform(k_s, (n, 1, 1, 1),
                                       minval=-cfg.saturation,
                                       maxval=cfg.saturation)
        gray = jnp.mean(f32, axis=-1, keepdims=True)
        f32 = gray + (f32 - gray) * sat
    if cfg.noise_std > 0:
        f32 = f32 + cfg.noise_std * jax.random.normal(k_n, f32.shape)
    images = jnp.clip(f32, 0.0, 1.0).astype(images.dtype)
    return images, labels


__all__ = ["AugmentConfig", "augment_batch"]
