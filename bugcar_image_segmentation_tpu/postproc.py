"""Post-segmentation cleanup and camera pre-enhancement, device-side.

TPU-native rebuilds of the two host/OpenCV passes the reference ran per
frame (reference image_processing_utils.py):

- :func:`contour_noise_removal` (reference :4-44): keep only road regions
  connected to the vehicle's footwell.  The reference found contours with
  ``cv2.findContours`` (inherently sequential), filled each, and kept those
  whose intersection with the bottom 10% strip exceeds 40% of the strip
  area.  Here the same decision runs as connected-component labeling by
  iterated min-label propagation (a ``lax.while_loop`` to fixed point —
  shape-static, jit-safe, batchable), followed by a per-component
  ``segment_sum`` of strip overlap.  One documented deviation: components
  are pixel-connected regions, not filled polygons, so a component whose
  *hole* overlaps the strip counts slightly differently — the reference's
  fill could annex such holes.
- :func:`clahe` (reference :46-61): CLAHE on the L channel of LAB (clip
  3.0, 8×8 tiles).  Implemented as per-tile 256-bin histograms
  (scatter-add), clip-and-redistribute, CDF LUTs, and bilinearly
  interpolated LUT application — cv2's algorithm, in float, fused into the
  jitted preprocessing when enabled.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops import morphology

# Reference constants (image_processing_utils.py:19-21).
LENGTH_RATIO = 0.1
MASK_AREA_THRESH = 0.4


# ---------------------------------------------------------------------------
# Connected components by min-label propagation
# ---------------------------------------------------------------------------


def label_components(mask: jax.Array) -> jax.Array:
    """8-connected component labels for a {0,1} mask.

    Each foreground pixel gets the minimum flat index of its component
    (+1; background = 0).  Min-propagation via 3x3 window-min steps inside
    a ``lax.while_loop`` that stops at fixed point — convergence is
    bounded by the longest in-component path, with no data-dependent
    shapes anywhere.  Foreground is 8-connected (background 4-connected),
    matching cv2's contour topology.
    """
    h, w = mask.shape
    fg = mask > 0
    big = jnp.int32(h * w + 1)
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1)
    labels = jnp.where(fg, idx, big)

    def propagate(lab):
        padded = jnp.pad(lab, 1, constant_values=big)
        neigh = jnp.minimum(
            jnp.minimum(
                jnp.minimum(padded[:-2, 1:-1], padded[2:, 1:-1]),
                jnp.minimum(padded[1:-1, :-2], padded[1:-1, 2:])),
            jnp.minimum(
                jnp.minimum(padded[:-2, :-2], padded[:-2, 2:]),
                jnp.minimum(padded[2:, :-2], padded[2:, 2:])))
        return jnp.where(fg, jnp.minimum(lab, neigh), big)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = propagate(lab)
        return new, jnp.any(new != lab)

    labels, _ = lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return jnp.where(fg, labels, 0)


def fill_holes(mask: jax.Array) -> jax.Array:
    """Fill interior holes of a {0,1} mask.

    Background connected to the image border stays background; enclosed
    background becomes foreground — the pixel equivalent of
    ``cv2.fillPoly`` over outer contours (reference
    image_processing_utils.py:34-35, 41-42, which rasterizes *filled*
    polygons and therefore annexes holes).  Implemented as border-seeded
    flood fill through the background via the same fixed-point
    ``lax.while_loop`` pattern as :func:`label_components`.
    """
    h, w = mask.shape
    bg = mask == 0

    border = jnp.zeros((h, w), jnp.bool_)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    seed = border & bg

    def dilate4(m):
        p = jnp.pad(m, 1)
        return (p[1:-1, 1:-1] | p[:-2, 1:-1] | p[2:, 1:-1]
                | p[1:-1, :-2] | p[1:-1, 2:])

    def cond(state):
        return state[1]

    def body(state):
        reach, _ = state
        new = dilate4(reach) & bg
        return new, jnp.any(new != reach)

    reachable, _ = lax.while_loop(cond, body, (seed, jnp.bool_(True)))
    return (mask.astype(jnp.bool_) | (bg & ~reachable)).astype(mask.dtype)


def keep_components_by_strip_overlap(mask: jax.Array,
                                     strip_ratio: float = LENGTH_RATIO,
                                     area_thresh: float = MASK_AREA_THRESH,
                                     ) -> jax.Array:
    """Keep components whose bottom-strip overlap exceeds the threshold.

    Reference semantics (image_processing_utils.py:19-39): the strip is the
    bottom ``strip_ratio`` of the frame; a region survives iff
    ``|region ∩ strip| > area_thresh * |strip|``.
    """
    h, w = mask.shape
    strip_h = int(h * strip_ratio)
    strip_area = strip_h * w

    labels = label_components(mask)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    in_strip = (rows >= h - strip_h) & (labels > 0)

    overlap = jnp.zeros((h * w + 1,), jnp.int32).at[
        jnp.where(in_strip, labels, 0).reshape(-1)].add(1)
    overlap = overlap.at[0].set(0)
    keep = overlap > jnp.int32(area_thresh * strip_area)
    return (keep[labels] & (labels > 0)).astype(mask.dtype)


@functools.partial(jax.jit, static_argnames=("strip_ratio", "area_thresh"))
def contour_noise_removal(road_mask: jax.Array,
                          strip_ratio: float = LENGTH_RATIO,
                          area_thresh: float = MASK_AREA_THRESH,
                          ) -> jax.Array:
    """Reference image_processing_utils.py:4-44, device-side.

    Morph-CLOSE with kernel ``min(H, W)//50`` to bridge small gaps, fill
    holes (the reference's fillPoly rasterization annexes them), then drop
    every region not sufficiently connected to the bottom strip.
    Input/output: {0,1} uint8 (H, W).
    """
    h, w = road_mask.shape
    k = max(1, min(h, w) // 50)
    closed = morphology.morph_close(road_mask.astype(jnp.uint8), (k, k))
    filled = fill_holes(closed)
    return keep_components_by_strip_overlap(filled, strip_ratio, area_thresh)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------


def bgr_to_lab_l(bgr: jax.Array) -> jax.Array:
    """L channel of CIELAB from uint8 BGR, cv2 8-bit scaling (L*255/100).

    Float re-derivation of cv2's BGR2LAB for the CLAHE path (sRGB → XYZ
    D65 → L*).
    """
    rgb = bgr[..., ::-1].astype(jnp.float32) / 255.0
    # sRGB linearization.
    lin = jnp.where(rgb > 0.04045,
                    ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    y = (0.212671 * lin[..., 0] + 0.715160 * lin[..., 1]
         + 0.072169 * lin[..., 2])
    fy = jnp.where(y > 0.008856, jnp.cbrt(y), 7.787 * y + 16.0 / 116.0)
    l_star = 116.0 * fy - 16.0
    return l_star * (255.0 / 100.0)


def _tile_luts(l_u8: jax.Array, tiles: Tuple[int, int],
               clip_limit: float) -> jax.Array:
    """(ty, tx, 256) uint8 LUTs: per-tile clipped-histogram CDFs."""
    h, w = l_u8.shape
    ty, tx = tiles
    th, tw = h // ty, w // tx
    tile_pix = th * tw

    tiles_img = l_u8[:ty * th, :tx * tw].reshape(ty, th, tx, tw)
    tiles_img = tiles_img.transpose(0, 2, 1, 3).reshape(ty * tx, tile_pix)

    tile_ids = jax.lax.broadcasted_iota(jnp.int32, tiles_img.shape, 0)
    hist = jnp.zeros((ty * tx, 256), jnp.float32).at[
        tile_ids.reshape(-1), tiles_img.reshape(-1).astype(jnp.int32)
    ].add(1.0)

    # cv2's clip limit scales with tile size (clipLimit * tilePix / 256).
    limit = jnp.maximum(1.0, clip_limit * tile_pix / 256.0)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)
    clipped = clipped + excess / 256.0

    cdf = jnp.cumsum(clipped, axis=1)
    # Scale so the full range maps to [0, 255].
    luts = jnp.clip(jnp.round(cdf * (255.0 / tile_pix)), 0, 255)
    return luts.reshape(ty, tx, 256)


@functools.partial(jax.jit, static_argnames=("tiles",))
def clahe_l_channel(l_u8: jax.Array, clip_limit: float = 3.0,
                    tiles: Tuple[int, int] = (8, 8)) -> jax.Array:
    """CLAHE on one uint8 channel (cv2.createCLAHE semantics, float math).

    Per-pixel output bilinearly interpolates the LUTs of the 4 surrounding
    tile centers (cv2's interpolation scheme).
    """
    h, w = l_u8.shape
    ty, tx = tiles
    th, tw = h // ty, w // tx
    luts = _tile_luts(l_u8, tiles, clip_limit)

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / th - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, ty - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, tx - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, ty - 1)
    x1 = jnp.clip(x0 + 1, 0, tx - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]

    v = l_u8.astype(jnp.int32)

    def look(tyi, txi):
        return luts[tyi[:, None], txi[None, :], v]

    out = ((1 - fy) * (1 - fx) * look(y0, x0)
           + (1 - fy) * fx * look(y0, x1)
           + fy * (1 - fx) * look(y1, x0)
           + fy * fx * look(y1, x1))
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("tiles",))
def clahe(bgr: jax.Array, clip_limit: float = 3.0,
          tiles: Tuple[int, int] = (8, 8)) -> jax.Array:
    """Contrast-limited adaptive histogram equalization of a BGR frame.

    Reference image_processing_utils.py:46-61: equalize L of LAB, keep
    chroma.  Rather than a full LAB round-trip, the equalized/original
    L ratio rescales the BGR values directly (identical effect on
    lightness, chroma preserved to first order, one less color-space
    conversion on device).
    """
    l_orig = jnp.clip(jnp.round(bgr_to_lab_l(bgr)), 0, 255).astype(jnp.uint8)
    l_eq = clahe_l_channel(l_orig, clip_limit, tiles)
    ratio = (l_eq.astype(jnp.float32) + 1.0) / (
        l_orig.astype(jnp.float32) + 1.0)
    out = bgr.astype(jnp.float32) * ratio[..., None]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


__all__ = [
    "contour_noise_removal", "keep_components_by_strip_overlap",
    "label_components", "fill_holes", "clahe", "clahe_l_channel",
    "bgr_to_lab_l", "LENGTH_RATIO", "MASK_AREA_THRESH",
]
