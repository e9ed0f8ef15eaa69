"""End-to-end grid parity: jitted OccupancyGridBuilder vs the cv2 oracle.

The oracle (tests/reference_impl.py) replays the reference's exact pipeline
with real cv2 kernels.  The only tolerated deviation is the warp's ~4 ppm
float32 tie-pixel effect (ops/warp.py), which can shift a handful of cells
per frame; everything downstream is bit-exact, so we assert a tight
per-frame mismatch budget (and zero mismatch for the nearest-warp runs of
the same machinery against itself).
"""

import cv2
import numpy as np
import pytest

from bugcar_image_segmentation_tpu import geometry
from bugcar_image_segmentation_tpu.configs import CalibrationConfig, GridConfig
from bugcar_image_segmentation_tpu.grid import OccupancyGridBuilder

import reference_impl


def make_calibration(laserscan=False, out=(512, 512), inp=(512, 256),
                     yaw=0.12):
    cal = CalibrationConfig(
        input_shape=inp, output_shape=out, dist2target=(5.0, 110.0),
        tile_length=60.0, cm_per_px=2.0, yaw=yaw, laserscan=laserscan)
    tile = np.array([[210.0, 170.0], [305.0, 168.0],
                     [330.0, 235.0], [185.0, 242.0]])
    m = geometry.calculate_transform_matrix(
        tile, output_shape=out, dist2target=cal.dist2target,
        tile_length=cal.tile_length, cm_per_px=cal.cm_per_px, yaw=cal.yaw)
    return cal.with_matrix(m)


def blobby_segmap(rng, shape, num_classes=3, cells=(12, 24)):
    base = rng.integers(0, num_classes, size=cells).astype(np.uint8)
    return cv2.resize(base, (shape[1], shape[0]),
                      interpolation=cv2.INTER_NEAREST)


GRID = GridConfig(width_m=8.0, height_m=8.0, cell_m=0.1)


class TestMulticlassParity:
    @pytest.mark.parametrize("laserscan", [False, True])
    def test_matches_oracle(self, rng, laserscan):
        cal = make_calibration(laserscan)
        builder = OccupancyGridBuilder(cal, GRID, mode="multiclass")
        budget = 0
        for _ in range(4):
            seg = blobby_segmap(rng, (256, 512))
            want = reference_impl.create_occupancy_grid(seg, cal, GRID)
            got = np.asarray(builder(seg))
            assert got.shape == want.shape == (80, 80)
            assert got.dtype == want.dtype == np.int8
            budget += int((got != want).sum())
        # warp tie pixels can shift a few cells per frame; everything else
        # must agree exactly.
        assert budget <= 8, f"{budget} mismatched cells over 4 frames"

    def test_value_domain(self, rng):
        cal = make_calibration(False)
        builder = OccupancyGridBuilder(cal, GRID)
        got = np.asarray(builder(blobby_segmap(rng, (256, 512))))
        assert set(np.unique(got)) <= {-1, 0, 100}

    def test_batched_matches_single(self, rng):
        cal = make_calibration(False)
        builder = OccupancyGridBuilder(cal, GRID)
        segs = np.stack([blobby_segmap(rng, (256, 512)) for _ in range(3)])
        batched = np.asarray(builder(segs))
        for i in range(3):
            np.testing.assert_array_equal(batched[i],
                                          np.asarray(builder(segs[i])))

    def test_wide_template_crop_branch(self, rng):
        """Template wider than the warp output (left_x < 0) — exercises the
        asymmetric zero-padding of reference bev.py:183-194."""
        cal = make_calibration(False, out=(300, 512))
        builder = OccupancyGridBuilder(cal, GRID)
        seg = blobby_segmap(rng, (256, 512))
        want = reference_impl.create_occupancy_grid(seg, cal, GRID)
        got = np.asarray(builder(seg))
        assert int((got != want).sum()) <= 2

    def test_nearest_interpolation_mode(self, rng):
        cal = make_calibration(False)
        builder = OccupancyGridBuilder(cal, GRID, interpolation="nearest")
        got = np.asarray(builder(blobby_segmap(rng, (256, 512))))
        assert set(np.unique(got)) <= {-1, 0, 100}


class TestNativeFastGrid:
    """interpolation="native": warp at the ~6.4k cell-center pixels only
    (ops/warp.cell_center_taps); the single semantic delta vs the parity
    path is morphology at cell instead of template resolution."""

    def test_exact_when_morphology_is_a_noop(self, rng):
        # All-road segmap → zero occupied pixels → morph-open is identity
        # at EITHER resolution → native must equal parity bit-for-bit.
        cal = make_calibration(False)
        parity = OccupancyGridBuilder(cal, GRID)
        native = OccupancyGridBuilder(cal, GRID, interpolation="native")
        seg = np.full((256, 512), 1, np.uint8)   # all ROAD
        np.testing.assert_array_equal(np.asarray(native(seg)),
                                      np.asarray(parity(seg)))

    @pytest.mark.parametrize("laserscan", [False, True])
    def test_disagreement_bounded_vs_parity(self, rng, laserscan):
        cal = make_calibration(laserscan)
        parity = OccupancyGridBuilder(cal, GRID, mode="multiclass")
        native = OccupancyGridBuilder(cal, GRID, mode="multiclass",
                                      interpolation="native")
        total = disagree = 0
        for _ in range(4):
            seg = blobby_segmap(rng, (256, 512))
            p = np.asarray(parity(seg))
            nv = np.asarray(native(seg))
            assert set(np.unique(nv)) <= {-1, 0, 100}
            total += p.size
            disagree += int((p != nv).sum())
        # morphology-resolution differences only — a few % of cells.
        assert disagree / total < 0.05, (disagree, total)

    def test_binary_native(self, rng):
        cal = make_calibration(False)
        native = OccupancyGridBuilder(cal, GRID, mode="binary",
                                      interpolation="native")
        seg = (blobby_segmap(rng, (256, 512)) > 0).astype(np.uint8)
        got = np.asarray(native(seg))
        assert got.shape == (80, 80)

    def test_batched_matches_single(self, rng):
        cal = make_calibration(False)
        native = OccupancyGridBuilder(cal, GRID, interpolation="native")
        segs = np.stack([blobby_segmap(rng, (256, 512)) for _ in range(2)])
        batched = np.asarray(native(segs))
        for i in range(2):
            np.testing.assert_array_equal(batched[i],
                                          np.asarray(native(segs[i])))


class TestLabelScaleNative:
    """label_scale > 1: the native grid taps a quarter-resolution label
    map directly (ops/warp.py ``src_scale``); must be BIT-identical to
    nearest-lifting the small map and running the scale-1 native build."""

    @pytest.mark.parametrize("scale", [2, 4])
    @pytest.mark.parametrize("mode", ["multiclass", "binary"])
    def test_bit_identical_to_lifted(self, rng, scale, mode):
        from bugcar_image_segmentation_tpu.ops.resize import (
            upsample_nearest_int)
        cal = make_calibration(False)
        lifted = OccupancyGridBuilder(cal, GRID, mode=mode,
                                      interpolation="native")
        direct = OccupancyGridBuilder(cal, GRID, mode=mode,
                                      interpolation="native",
                                      label_scale=scale)
        assert direct.segmap_shape == (256 // scale, 512 // scale)
        for _ in range(3):
            hi = 3 if mode == "multiclass" else 2
            small = rng.integers(0, hi,
                                 (256 // scale, 512 // scale)).astype(np.uint8)
            big = np.asarray(upsample_nearest_int(small, scale))
            np.testing.assert_array_equal(np.asarray(direct(small)),
                                          np.asarray(lifted(big)))

    def test_bit_identical_to_lifted_laserscan(self, rng):
        from bugcar_image_segmentation_tpu.ops.resize import (
            upsample_nearest_int)
        cal = make_calibration(True)
        lifted = OccupancyGridBuilder(cal, GRID, interpolation="native")
        direct = OccupancyGridBuilder(cal, GRID, interpolation="native",
                                      label_scale=4)
        small = rng.integers(0, 3, (64, 128)).astype(np.uint8)
        np.testing.assert_array_equal(
            np.asarray(direct(small)),
            np.asarray(lifted(np.asarray(upsample_nearest_int(small, 4)))))

    def test_scaled_taps_match_lifted_perspective(self, rng):
        """Warp-op level: a scaled cell-center plan over the small map ==
        the scale-1 plan over its nearest-lift, both interpolations."""
        from bugcar_image_segmentation_tpu.ops import warp
        from bugcar_image_segmentation_tpu.ops.resize import (
            upsample_nearest_int)
        cal = make_calibration(False)
        m = cal.matrix_np()
        for interp in ("cv2_linear", "nearest"):
            full = warp.cell_center_taps(
                m, src_shape=(256, 512), tpl_shape=(400, 400),
                cells_shape=(80, 80), dst_offset=(56, 112),
                valid_rect=(0, 400, 0, 400), interpolation=interp)
            scaled = warp.cell_center_taps(
                m, src_shape=(256, 512), tpl_shape=(400, 400),
                cells_shape=(80, 80), dst_offset=(56, 112),
                valid_rect=(0, 400, 0, 400), interpolation=interp,
                src_scale=4)
            assert scaled.src_shape == (64, 128)
            small = rng.integers(0, 255, (64, 128)).astype(np.uint8)
            big = np.asarray(upsample_nearest_int(small, 4))
            np.testing.assert_array_equal(
                np.asarray(warp.apply_warp(small, scaled)),
                np.asarray(warp.apply_warp(big, full)), err_msg=interp)

    def test_parity_mode_rejects_label_scale(self):
        cal = make_calibration(False)
        with pytest.raises(ValueError, match="native"):
            OccupancyGridBuilder(cal, GRID, label_scale=4)


class TestBinaryParity:
    @pytest.mark.parametrize("laserscan", [False, True])
    def test_matches_oracle(self, rng, laserscan):
        cal = make_calibration(laserscan)
        builder = OccupancyGridBuilder(cal, GRID, mode="binary")
        budget = 0
        for _ in range(4):
            seg = (blobby_segmap(rng, (256, 512)) > 0).astype(np.uint8)
            want = reference_impl.create_occupancy_grid_binary(seg, cal, GRID)
            got = builder(seg)
            if laserscan:
                assert isinstance(got, tuple) and len(got) == 2
                for g, w in zip(got, want):
                    budget += int((np.asarray(g) != w).sum())
            else:
                budget += int((np.asarray(got) != want).sum())
        assert budget <= 8, f"{budget} mismatched cells over 4 frames"


class TestShapeValidation:
    def test_wrong_shape_raises(self, rng):
        cal = make_calibration(False)
        builder = OccupancyGridBuilder(cal, GRID)
        with pytest.raises(ValueError, match="segmap shape"):
            builder(np.zeros((128, 512), np.uint8))

    def test_bad_ndim_raises(self):
        cal = make_calibration(False)
        builder = OccupancyGridBuilder(cal, GRID)
        with pytest.raises(ValueError, match="must be"):
            builder(np.zeros((1, 1, 256, 512), np.uint8))
