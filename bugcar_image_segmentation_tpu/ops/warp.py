"""Perspective (homography) warp as a TPU-friendly gather.

Replaces ``cv2.warpPerspective`` on the grid hot path (reference bev.py:114,
182 — "warp perspective cost 3-4% cpu").  The homography is calibration-time
constant, so *all* address arithmetic happens once on the host:
``perspective_taps`` precomputes per-output-pixel gather indices and
interpolation weights; the jitted ``apply_warp`` is pure gathers + VPU math.

TPU gather microarchitecture note (measured on v5e): gather cost scales
with the **number of indices**, not the bytes fetched — one gather of a
4-vector costs the same as one gather of a scalar, and 4 separate scalar
gathers cost 4x.  Bilinear therefore uses a *packed* plan: the source is
expanded once per frame into a (H*W, 4) array holding each pixel's 2x2
neighborhood (three shifted copies — cheap VPU slides), and the warp is a
SINGLE gather of 4-vectors with per-pixel weights rearranged into the
block layout (3.5x faster than the naive 4-gather form, measured).

Parity notes (vs OpenCV 5.0, empirically characterised):
- cv2 computes inverse-map coordinates in float32 with FMA contractions.
  We replicate the fma chain on host (``_fma32``); residual coordinate ULP
  differences flip an output pixel only when the interpolated value lands
  within ~1e-5 of a rounding boundary — measured ≈1 pixel per 512x512
  label-map warp (≈4 ppm).  Everything downstream of the warp is bit-exact.
- Interpolation itself is exact float with round-half-to-even (verified by
  a 4096-step sub-pixel staircase: zero deviation).
- Out-of-source samples are 0 (BORDER_CONSTANT default), which the grid
  semantics rely on (0 = outside field of view, reference bev.py:177).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _fma32(a, b, c):
    """Float32 fused multiply-add (single rounding), emulated via float64."""
    return (np.float64(a) * np.float64(b) + np.float64(c)).astype(np.float32)


def cv2_inverse_coords(matrix: np.ndarray,
                       dst_width: int,
                       dst_height: int,
                       dst_offset: Tuple[int, int] = (0, 0),
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Source-image sampling coordinates for each destination pixel.

    Mirrors cv2.warpPerspective's inverse mapping: ``matrix`` maps src→dst,
    so each dst pixel (x, y) samples src at ``inv(matrix) @ (x, y, 1)``,
    computed in float32 with fma contraction order.

    Args:
      matrix: (3, 3) src→dst homography.
      dst_width/dst_height: size of the coordinate grid to generate.
      dst_offset: (ox, oy) added to the dst pixel coordinates before the
        inverse map — used to generate coordinates for a *window* of the
        nominal warp output without materialising the rest.

    Returns:
      (fX, fY) float32 arrays of shape (dst_height, dst_width).
    """
    ox, oy = dst_offset
    xs = (np.arange(dst_width, dtype=np.float32) + np.float32(ox))[None, :]
    ys = (np.arange(dst_height, dtype=np.float32) + np.float32(oy))[:, None]
    xs = np.broadcast_to(xs, (dst_height, dst_width))
    ys = np.broadcast_to(ys, (dst_height, dst_width))
    return _inverse_coords_at(matrix, xs, ys)


def _inverse_coords_at(matrix: np.ndarray, xs: np.ndarray, ys: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """cv2's fma-contracted inverse map at arbitrary dst coordinates."""
    minv = np.linalg.inv(np.asarray(matrix, dtype=np.float64))
    mi = minv.astype(np.float32)
    den = _fma32(mi[2, 0], xs, _fma32(mi[2, 1], ys, np.float32(mi[2, 2])))
    fx = _fma32(mi[0, 0], xs, _fma32(mi[0, 1], ys, np.float32(mi[0, 2]))) / den
    fy = _fma32(mi[1, 0], xs, _fma32(mi[1, 1], ys, np.float32(mi[1, 2]))) / den
    return fx, fy


class WarpTaps(NamedTuple):
    """Precomputed gather plan for one warp.  A pytree of device constants.

    ``indices``: int32 (H, W) flattened source index — the 2x2 block's
    top-left corner (bilinear) or the nearest pixel (nearest).
    ``weights``: float32 — (H, W, 4) block-layout bilinear weights (order:
    TL, TR, BL, BR; invalid taps hold weight 0, implementing
    BORDER_CONSTANT(0)), or (H, W) 0/1 validity for nearest.
    """

    indices: jax.Array
    weights: jax.Array
    src_shape: Tuple[int, int]
    mode: str


def perspective_taps(matrix: np.ndarray,
                     src_shape: Tuple[int, int],
                     dst_shape: Tuple[int, int],
                     interpolation: str = "cv2_linear",
                     dst_offset: Tuple[int, int] = (0, 0),
                     valid_rect: Optional[Tuple[int, int, int, int]] = None,
                     ) -> WarpTaps:
    """Build the gather plan for warping src (H, W) into dst (H, W).

    Args:
      matrix: (3, 3) src→dst homography.
      src_shape: (height, width) of the source image.
      dst_shape: (height, width) of the output.
      interpolation: "cv2_linear" (bilinear on values, the reference's
        behaviour for label maps) or "nearest".
      dst_offset: (ox, oy) — output pixel (x, y) behaves like pixel
        (x+ox, y+oy) of the nominal warp output.  Used to fuse the
        crop/pad of reference bev.py:183-194 into the warp itself.
      valid_rect: optional (x0, x1, y0, y1) half-open rectangle in output
        coordinates; pixels outside it are forced to 0 (the zero-padding
        region of the grid template).
    """
    sh, sw = src_shape
    dh, dw = dst_shape
    fx, fy = cv2_inverse_coords(matrix, dw, dh, dst_offset)
    cols = np.broadcast_to(np.arange(dw)[None, :], (dh, dw))
    rows = np.broadcast_to(np.arange(dh)[:, None], (dh, dw))
    window = _window_mask(cols, rows, valid_rect)
    indices, weights = _plan_from_coords(fx, fy, window, src_shape,
                                         interpolation)
    return WarpTaps(indices=jnp.asarray(indices),
                    weights=jnp.asarray(weights),
                    src_shape=(sh, sw), mode=interpolation)


def _window_mask(cols: np.ndarray, rows: np.ndarray,
                 valid_rect: Optional[Tuple[int, int, int, int]]
                 ) -> np.ndarray:
    if valid_rect is None:
        return np.ones(cols.shape, dtype=bool)
    x0, x1, y0, y1 = valid_rect
    return (cols >= x0) & (cols < x1) & (rows >= y0) & (rows < y1)


def _plan_from_coords(fx: np.ndarray, fy: np.ndarray, window: np.ndarray,
                      src_shape: Tuple[int, int], interpolation: str,
                      src_scale: int = 1
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Indices/weights for sampling src at float coords (fx, fy).

    ``src_scale`` > 1 plans against a source array of shape
    ``(sh // src_scale, sw // src_scale)`` whose nearest-lift (pixel
    replication, ops/resize.upsample_nearest_int) is the nominal
    (sh, sw) source: every tap address maps through ``// src_scale``, so
    applying the plan to the SMALL map is bit-identical to applying the
    scale-1 plan to the lifted map — without ever materializing the lift.
    Used by the native grid mode under quarter-resolution model heads
    (grid.py ``label_scale``).  Coordinate math, validity and weights all
    stay in full-resolution pixel space.
    """
    sh, sw = src_shape
    if src_scale != 1 and (sh % src_scale or sw % src_scale):
        raise ValueError(f"src_shape {src_shape} not divisible by "
                         f"src_scale {src_scale}")
    qh, qw = sh // src_scale, sw // src_scale
    fx64 = fx.astype(np.float64)
    fy64 = fy.astype(np.float64)

    def in_bounds(iy, ix):
        return (ix >= 0) & (ix < sw) & (iy >= 0) & (iy < sh)

    if interpolation == "nearest":
        # cv2 INTER_NEAREST: round-half-to-even of the float coordinate.
        ix = np.rint(fx64).astype(np.int64)
        iy = np.rint(fy64).astype(np.int64)
        valid = in_bounds(iy, ix) & window
        indices = (np.clip(iy, 0, sh - 1) // src_scale * qw
                   + np.clip(ix, 0, sw - 1) // src_scale).astype(np.int32)
        weights = valid.astype(np.float32)
    elif interpolation == "cv2_linear":
        ix = np.floor(fx64).astype(np.int64)
        iy = np.floor(fy64).astype(np.int64)
        ffx = fx64 - ix
        ffy = fy64 - iy
        # Anchor a fully in-bounds 2x2 block; re-aim each true tap's weight
        # at its position inside that block (out-of-source taps keep
        # weight 0, so their block slot never matters).  With src_scale,
        # the four full-res taps always land inside one 2x2 block of the
        # small map (consecutive full-res coords differ by ≤1 after
        # ``// scale``), so the packed single-gather form survives; taps
        # that collapse onto the same small pixel accumulate their
        # weights in its slot.
        qy0 = np.clip(iy, 0, sh - 1) // src_scale
        qx0 = np.clip(ix, 0, sw - 1) // src_scale
        base_y = np.clip(qy0, 0, max(qh - 2, 0))
        base_x = np.clip(qx0, 0, max(qw - 2, 0))
        indices = (base_y * qw + base_x).astype(np.int32)
        weights = np.zeros(fx.shape + (4,), np.float32)
        tap_weights = [(iy, ix, (1.0 - ffx) * (1.0 - ffy)),
                       (iy, ix + 1, ffx * (1.0 - ffy)),
                       (iy + 1, ix, (1.0 - ffx) * ffy),
                       (iy + 1, ix + 1, ffx * ffy)]
        for ty, tx, w in tap_weights:
            ok = in_bounds(ty, tx) & window
            qty = np.clip(ty, 0, sh - 1) // src_scale
            qtx = np.clip(tx, 0, sw - 1) // src_scale
            dy = np.clip(qty - base_y, 0, 1)
            dx = np.clip(qtx - base_x, 0, 1)
            slot = (dy * 2 + dx).astype(np.int64)
            w_ok = np.where(ok, w, 0.0).astype(np.float32)
            np.put_along_axis(weights, slot[..., None], np.take_along_axis(
                weights, slot[..., None], axis=2) + w_ok[..., None], axis=2)
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")

    return indices, weights


def cell_center_taps(matrix: np.ndarray,
                     src_shape: Tuple[int, int],
                     tpl_shape: Tuple[int, int],
                     cells_shape: Tuple[int, int],
                     dst_offset: Tuple[int, int] = (0, 0),
                     valid_rect: Optional[Tuple[int, int, int, int]] = None,
                     interpolation: str = "cv2_linear",
                     src_scale: int = 1) -> WarpTaps:
    """Gather plan sampling ONLY the template pixels the cell binning reads.

    The parity path warps the full (tpl_h, tpl_w) template (~160k gather
    indices at 400² — per-INDEX-bound hardware cost, see module
    docstring) and then nearest-resizes down to (cells_h, cells_w); but
    that resize reads exactly one template pixel per cell
    (``sx = floor(dx * src/dst)``, ops/resize.py).  This plan evaluates
    the same fma-contracted inverse map at just those ~6.4k pixels, with
    the same per-pixel interpolation math and validity window — the
    warped cell values are IDENTICAL to warp-then-resize; what a
    consumer gives up is template-resolution morphology in between
    (grid.py "native" mode runs it at cell resolution instead).

    ``src_scale`` > 1: the actual source array is the model's
    reduced-resolution label map, (sh//scale, sw//scale); the plan reads
    it directly, bit-identical to sampling its nearest-lift at (sh, sw)
    (see ``_plan_from_coords``) — composing a quarter-resolution head
    with the native grid without materializing input-res labels.
    """
    sh, sw = src_shape
    th, tw = tpl_shape
    ch, cw = cells_shape
    # Mirror ops/resize._nearest_indices bit-for-bit.
    ty = np.minimum((np.arange(ch) * (th / ch)).astype(np.int64), th - 1)
    tx = np.minimum((np.arange(cw) * (tw / cw)).astype(np.int64), tw - 1)
    ox, oy = dst_offset
    cols = np.broadcast_to(tx[None, :], (ch, cw))
    rows = np.broadcast_to(ty[:, None], (ch, cw))
    xs = cols.astype(np.float32) + np.float32(ox)
    ys = rows.astype(np.float32) + np.float32(oy)
    fx, fy = _inverse_coords_at(matrix, xs, ys)
    window = _window_mask(cols, rows, valid_rect)
    indices, weights = _plan_from_coords(fx, fy, window, src_shape,
                                         interpolation, src_scale)
    return WarpTaps(indices=jnp.asarray(indices),
                    weights=jnp.asarray(weights),
                    src_shape=(sh // src_scale, sw // src_scale),
                    mode=interpolation)


def pack_neighborhood(src: jax.Array) -> jax.Array:
    """(H, W) → (H*W, 4): each pixel's [(y,x), (y,x+1), (y+1,x), (y+1,x+1)].

    Three shifted copies via pad+slice — pure VPU data movement, fused by
    XLA.  Lets the bilinear warp fetch all four taps with ONE gather index
    per output pixel (see module docstring).
    """
    right = jnp.pad(src[:, 1:], ((0, 0), (0, 1)))
    down = jnp.pad(src[1:, :], ((0, 1), (0, 0)))
    down_right = jnp.pad(src[1:, 1:], ((0, 1), (0, 1)))
    return jnp.stack([src, right, down, down_right], axis=-1).reshape(-1, 4)


def apply_warp(src: jax.Array, taps: WarpTaps) -> jax.Array:
    """Warp a (H, W) uint8 image through a precomputed gather plan.

    Jit-safe; one gather + VPU arithmetic.  Returns uint8 (dst_h, dst_w).
    """
    if taps.mode == "nearest":
        vals = jnp.take(src.reshape(-1), taps.indices, axis=0)
        return jnp.where(taps.weights > 0, vals,
                         jnp.zeros((), src.dtype))
    packed = pack_neighborhood(src).astype(jnp.float32)
    vals = jnp.take(packed, taps.indices, axis=0)          # (H, W, 4)
    acc = jnp.einsum("hwt,hwt->hw", vals, taps.weights,
                     preferred_element_type=jnp.float32)
    # cv2 rounds half-to-even and saturates to u8.
    return jnp.clip(jnp.round(acc), 0, 255).astype(src.dtype)


__all__ = ["cv2_inverse_coords", "perspective_taps", "cell_center_taps",
           "pack_neighborhood", "apply_warp", "WarpTaps"]
