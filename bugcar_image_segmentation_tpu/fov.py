"""Field-of-view footprint and outline in BEV/grid space.

The reference's ``create_skeleton`` (reference
image_processing_utils.py:95-105) tried to provide this — warp an all-ones
image through the grid builder and Canny the result to get the camera's
BEV field-of-view outline — but bit-rotted into calling
``create_occupancy_grid`` with a signature that no longer exists
(SURVEY.md §2a: document, don't replicate the breakage).  This is the
working capability: since the warp is a precomputed gather plan, the FOV
*footprint* is simply "which template pixels have any valid warp tap", a
pure host computation off the taps — no Canny, no warp at runtime — and
the outline is its morphological gradient.
"""

from __future__ import annotations

import numpy as np

from .configs import CalibrationConfig, GridConfig
from .grid import OccupancyGridBuilder


def fov_mask(cal: CalibrationConfig, grid: GridConfig) -> np.ndarray:
    """{0,1} uint8 (cells_h, cells_w): grid cells inside the camera FOV.

    A cell is visible iff its template block contains at least one pixel
    whose inverse-homography sample lands inside the source image — read
    straight off the precomputed warp weights (ops/warp.py), which encode
    validity as nonzero tap weight.
    """
    builder = OccupancyGridBuilder(cal, grid, mode="multiclass",
                                   interpolation="nearest")
    valid = np.asarray(builder._taps.weights) > 0  # (tpl_h, tpl_w), nearest
    g = builder.geom
    # Same nearest-binning the grid build applies (ops/resize.py).
    ys = np.minimum((np.arange(g.cells_h) * (valid.shape[0] / g.cells_h))
                    .astype(np.int64), valid.shape[0] - 1)
    xs = np.minimum((np.arange(g.cells_w) * (valid.shape[1] / g.cells_w))
                    .astype(np.int64), valid.shape[1] - 1)
    return valid[ys][:, xs].astype(np.uint8)


def fov_outline(cal: CalibrationConfig, grid: GridConfig) -> np.ndarray:
    """{0,1} uint8 one-cell-thick outline of the FOV footprint
    (the capability reference's ``create_skeleton`` was after)."""
    mask = fov_mask(cal, grid)
    padded = np.pad(mask, 1)
    eroded = np.minimum.reduce([
        padded[:-2, 1:-1], padded[2:, 1:-1],
        padded[1:-1, :-2], padded[1:-1, 2:], mask])
    return (mask & (eroded == 0)).astype(np.uint8)


__all__ = ["fov_mask", "fov_outline"]
