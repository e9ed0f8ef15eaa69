"""FOV footprint/outline — the fixed version of the reference's broken
``create_skeleton`` (image_processing_utils.py:95-105)."""

import numpy as np
import jax.numpy as jnp

from bugcar_image_segmentation_tpu.fov import fov_mask, fov_outline
from bugcar_image_segmentation_tpu.grid import OccupancyGridBuilder

from test_grid_parity import GRID, make_calibration


class TestFov:
    def test_footprint_matches_warped_ones(self):
        """The footprint must equal the grid cells a warped all-ones
        image reaches — the computation the reference attempted."""
        cal = make_calibration(False)
        mask = fov_mask(cal, GRID)
        builder = OccupancyGridBuilder(cal, GRID, interpolation="nearest")
        ones = np.ones((cal.input_height, cal.input_width), np.uint8)
        grid = np.asarray(builder(jnp.asarray(ones)))
        # grid: -1 out of FOV, >=0 inside (ones segmap -> class 2 -> road).
        np.testing.assert_array_equal(mask, (grid != -1).astype(np.uint8))

    def test_outline_is_thin_boundary(self):
        cal = make_calibration(False)
        mask = fov_mask(cal, GRID)
        outline = fov_outline(cal, GRID)
        assert outline.shape == mask.shape
        # outline lies on the mask and vanishes strictly inside it
        assert (mask[outline == 1] == 1).all()
        interior = np.pad(mask, 1)
        interior = np.minimum.reduce([
            interior[:-2, 1:-1], interior[2:, 1:-1],
            interior[1:-1, :-2], interior[1:-1, 2:], mask])
        assert (outline[interior == 1] == 0).all()
        assert outline.sum() > 0
