"""Test oracle: numpy/cv2 implementation of the reference's grid semantics.

This module exists ONLY for tests.  It re-expresses what the reference's
``bev_transform_tools.create_occupancy_grid`` / ``create_occupancy_grid_binary``
(reference bev.py:97-246) compute, using the same OpenCV C++ kernels the
reference delegates to — so the JAX/Pallas implementations in the package
can be bit-compared against real cv2 behaviour on random inputs.

Two deliberate deviations from the reference (both bug fixes, flagged here
so parity claims stay honest):

- ``cv2.imshow`` side effects in the reference's hot path (bev.py:132, 213)
  are omitted; returned arrays are unaffected.
- All ``cv2.warpPolar`` calls add ``WARP_FILL_OUTLIERS``.  The reference
  omits it (bev.py:148/160/219/235), which leaves out-of-source destination
  pixels UNINITIALISED — two consecutive cv2 calls return different bytes
  there, i.e. the reference's laserscan mode reads garbage memory.  The
  deterministic 0-fill is the only sane parity target.
"""

from __future__ import annotations

import cv2
import numpy as np


def _template_geometry(cal, grid):
    """Shared pixel geometry: template size and crop/pad offsets.

    Mirrors reference bev.py:172-194 arithmetic exactly (ints truncate).
    """
    cell_px = grid.cell_m * 100.0 / cal.cm_per_px
    cells_w = int(grid.width_m / grid.cell_m)
    cells_h = int(grid.height_m / grid.cell_m)
    tpl_w = int(cells_w * cell_px)
    tpl_h = int(cells_h * cell_px)
    warped_w, warped_h = cal.output_width, cal.output_height
    left_x = int((warped_w - tpl_w) / 2)
    top_y = warped_h - tpl_h
    return cells_w, cells_h, tpl_w, tpl_h, left_x, top_y


def _warp_to_template(segmap_plus1, cal, grid):
    """warpPerspective → crop → pad into the bottom-centre template."""
    cells_w, cells_h, tpl_w, tpl_h, left_x, top_y = _template_geometry(cal, grid)
    warped = cv2.warpPerspective(
        segmap_plus1, cal.matrix_np(), (cal.output_width, cal.output_height))
    src_x0 = max(left_x, 0)
    src_y0 = max(top_y, 0)
    cropped = warped[src_y0:cal.output_height, src_x0:src_x0 + tpl_w]
    dst_x0 = max(-left_x, 0)
    dst_y0 = max(-top_y, 0)
    template = np.zeros((tpl_h, tpl_w), dtype=np.float64)
    template[dst_y0:tpl_h, dst_x0:dst_x0 + cropped.shape[1]] = cropped
    return template.astype(np.uint8), (cells_w, cells_h)


def _morph_open_relabel(template, occupied_mask):
    """3x3 MORPH_OPEN; removed speckles re-labelled as class 2."""
    kernel = np.ones((3, 3), dtype=np.uint8)
    opened = cv2.morphologyEx(occupied_mask.astype(np.uint8), cv2.MORPH_OPEN,
                              kernel=kernel)
    speckles = cv2.subtract(occupied_mask.astype(np.uint8),
                            (opened > 0).astype(np.uint8))
    return np.where(speckles > 0, 2, template).astype(np.uint8)


def create_occupancy_grid(segmap, cal, grid, laserscan=None):
    """Oracle for reference bev.py:166-246 (3-class map → int8 grid)."""
    # (The reference asserts segmap.shape == (width, height) — i.e. numpy
    # (rows, cols) against a (w, h) tuple, bev.py:169-170 — forcing callers
    # to store a transposed "input image size".  The oracle checks the sane
    # orientation instead; the warp itself never uses input_shape.)
    assert segmap.shape == (cal.input_height, cal.input_width)
    use_laserscan = cal.laserscan if laserscan is None else laserscan

    shifted = np.add(segmap, 1)
    template, (cells_w, cells_h) = _warp_to_template(shifted, cal, grid)
    occupied = np.logical_or(template == 1, template == 3)
    template = _morph_open_relabel(template, occupied)

    template = cv2.resize(template, (cells_w, cells_h),
                          interpolation=cv2.INTER_NEAREST)

    if use_laserscan:
        shape = (template.shape[1], template.shape[0])
        longer = max(shape)
        # NOTE: flags=cv2.WARP_POLAR_LINEAR == 0 → INTER_NEAREST interpolation.
        polar = cv2.warpPolar(template, (-1, -1),
                              (shape[0] / 2 - 1, shape[1]), longer,
                              cv2.WARP_POLAR_LINEAR + cv2.WARP_FILL_OUTLIERS)
        canvas = np.zeros(polar.shape)
        ys, xs = np.where(polar == 3)
        if len(ys):
            order = np.argsort(ys, kind="stable")
            ys, xs = ys[order], xs[order]
            first_idx = np.unique(ys, return_index=True)[1]
            rows = ys[first_idx]
            cols = np.minimum.reduceat(xs, first_idx)
            for r, c in zip(rows, cols):
                canvas = cv2.circle(canvas, (int(c), int(r)), 1, 1, -1)
        unpolar = cv2.warpPolar(canvas, shape, (shape[0] / 2 - 1, shape[1]),
                                longer, cv2.WARP_INVERSE_MAP + cv2.WARP_FILL_OUTLIERS)
        new_grid = np.where(template != 3, template, unpolar)
    else:
        new_grid = np.where(template == 3, 1, template)

    return np.where(new_grid == 0, -1, 200 - new_grid * 100).astype(np.int8)


def create_occupancy_grid_binary(segmap, cal, grid, laserscan=None):
    """Oracle for reference bev.py:97-165 ({0,1} road mask → int8 grid).

    Reproduces the reference's quirks deliberately: the uint8 value map
    before the int8 cast (bev.py:143-144), and the tuple return in
    laserscan mode (bev.py:164).
    """
    assert segmap.shape == (cal.input_height, cal.input_width)
    use_laserscan = cal.laserscan if laserscan is None else laserscan

    shifted = np.add(segmap, 1)
    template, (cells_w, cells_h) = _warp_to_template(shifted, cal, grid)
    occupied = template == 1
    template = _morph_open_relabel(template, occupied)

    occ = cv2.resize(template, (cells_w, cells_h),
                     interpolation=cv2.INTER_NEAREST).astype(np.int64) * 100
    occ = np.where(occ == 0, -1, 200 - occ).astype(np.uint8)

    if use_laserscan:
        shape = (occ.shape[1], occ.shape[0])
        longer = max(shape)
        polar = cv2.warpPolar(occ, shape, (occ.shape[1] / 2 - 1, occ.shape[0]),
                              longer, cv2.WARP_POLAR_LINEAR + cv2.WARP_FILL_OUTLIERS)
        canvas = np.zeros(polar.shape)
        ys, xs = np.where(polar == 100)
        if len(ys):
            order = np.argsort(ys, kind="stable")
            ys, xs = ys[order], xs[order]
            first_idx = np.unique(ys, return_index=True)[1]
            rows = ys[first_idx]
            cols = np.minimum.reduceat(xs, first_idx)
            for r, c in zip(rows, cols):
                canvas = cv2.circle(canvas, (int(c), int(r)), 1, 100, -1)
        new_grid = cv2.warpPolar(canvas, shape,
                                 (occ.shape[1] / 2 - 1, occ.shape[0]),
                                 longer, cv2.WARP_INVERSE_MAP + cv2.WARP_FILL_OUTLIERS).astype(np.int8)
        new_grid[occ == 255] = -1
        return occ.astype(np.int8), new_grid
    return occ.astype(np.int8)
