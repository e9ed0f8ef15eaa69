"""Geometry parity tests: our pure-math solvers vs OpenCV's C++ ones."""

import cv2
import numpy as np
import pytest

from bugcar_image_segmentation_tpu import geometry


def random_quad(rng, spread=200.0):
    """A random non-degenerate convex-ish quad."""
    base = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    return (base * spread + rng.normal(scale=spread * 0.05, size=(4, 2))
            + rng.uniform(0, 100, size=(1, 2)))


class TestPerspectiveTransform:
    def test_matches_cv2_on_random_quads(self, rng):
        for _ in range(50):
            src = random_quad(rng).astype(np.float32)
            dst = random_quad(rng).astype(np.float32)
            ours = geometry.get_perspective_transform(src, dst)
            cv = cv2.getPerspectiveTransform(src, dst)
            np.testing.assert_allclose(ours, cv, rtol=1e-5, atol=1e-5)

    def test_maps_points_exactly(self, rng):
        src = random_quad(rng)
        dst = random_quad(rng)
        m = geometry.get_perspective_transform(src, dst)
        np.testing.assert_allclose(
            geometry.apply_homography(m, src), dst, atol=1e-8)

    def test_identity(self):
        pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=np.float64)
        m = geometry.get_perspective_transform(pts, pts)
        np.testing.assert_allclose(m, np.eye(3), atol=1e-9)

    def test_inverse_roundtrip(self, rng):
        src, dst = random_quad(rng), random_quad(rng)
        m = geometry.get_perspective_transform(src, dst)
        minv = geometry.invert_homography(m)
        np.testing.assert_allclose(
            geometry.apply_homography(minv, dst), src, atol=1e-6)

    def test_rejects_bad_shapes(self):
        with pytest.raises(ValueError):
            geometry.get_perspective_transform(
                np.zeros((3, 2)), np.zeros((4, 2)))


class TestOrderPoints:
    def test_axis_aligned_square(self):
        # Square centred at origin, axis pointing along +x.
        pts = np.array([[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]])
        axis = np.array([[0.0, 0.0], [100.0, 0.0]])
        out = geometry.order_points_counter_clockwise(pts, axis)
        # Left side (y >= 0) sorted by x, then right side (y < 0) sorted by x.
        expected = np.array([[-1.0, 1.0], [1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
        np.testing.assert_allclose(out, expected)

    def test_rotation_invariant_correspondence(self, rng):
        """Rotating both points and axis must preserve the ordering indices."""
        pts = np.array([[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]])
        axis = np.array([[0.0, 0.0], [100.0, 0.0]])
        base = geometry.order_points_counter_clockwise(pts, axis)
        base_order = [int(np.argmin(np.linalg.norm(pts - p, axis=1)))
                      for p in base]
        for theta in rng.uniform(-np.pi, np.pi, size=10):
            c, s = np.cos(theta), np.sin(theta)
            rot = np.array([[c, -s], [s, c]])
            out = geometry.order_points_counter_clockwise(
                pts @ rot.T, axis @ rot.T)
            order = [int(np.argmin(np.linalg.norm(pts @ rot.T - p, axis=1)))
                     for p in out]
            assert order == base_order, f"ordering changed under yaw {theta}"

    def test_does_not_mutate_inputs(self):
        pts = np.ones((4, 2))
        axis = np.array([[1.0, 2.0], [3.0, 4.0]])
        axis_copy = axis.copy()
        geometry.order_points_counter_clockwise(pts, axis)
        np.testing.assert_array_equal(axis, axis_copy)


class TestLineIntersection:
    def test_simple_cross(self):
        p = geometry.find_intersection_line([(0, 0), (2, 2)], [(0, 2), (2, 0)])
        np.testing.assert_allclose(p, [1.0, 1.0])

    def test_vertical_line(self):
        p = geometry.find_intersection_line([(1, -5), (1, 5)], [(0, 0), (2, 2)])
        np.testing.assert_allclose(p, [1.0, 1.0])

    def test_parallel_returns_none(self):
        assert geometry.find_intersection_line(
            [(0, 0), (1, 1)], [(0, 1), (1, 2)]) is None

    def test_two_vertical_parallel(self):
        assert geometry.find_intersection_line(
            [(0, 0), (0, 5)], [(1, 0), (1, 5)]) is None


class TestCornersFromEdgeLines:
    def test_recovers_quad_corners(self, rng):
        corners = np.array([[210.0, 170.0], [305.0, 168.0],
                            [330.0, 235.0], [185.0, 242.0]])
        lines = []
        for i in range(4):
            a, b = corners[i - 1], corners[i]
            t1, t2 = rng.uniform(0.1, 0.4), rng.uniform(0.6, 0.9)
            lines.append((a + t1 * (b - a), a + t2 * (b - a)))
        got = geometry.corners_from_edge_lines(lines)
        np.testing.assert_allclose(got, corners, atol=1e-9)

    def test_parallel_pair_raises(self):
        lines = [((0, 0), (1, 0)), ((0, 1), (1, 1)),     # parallel pair
                 ((0, 0), (0, 1)), ((1, 0), (1, 1))]
        with pytest.raises(ValueError, match="parallel"):
            geometry.corners_from_edge_lines(lines)

    def test_wrong_count_raises(self):
        with pytest.raises(ValueError, match="4 edge lines"):
            geometry.corners_from_edge_lines([((0, 0), (1, 1))])


class TestBEVCorners:
    def test_zero_yaw_geometry(self):
        out = geometry.bev_tile_corners(
            output_shape=(512, 512), dist2target=(0.0, 100.0),
            tile_length=60.0, cm_per_px=1.0, yaw=0.0)
        # Target sits at (256, 412); half tile = 30 px.
        target = np.array([256.0, 412.0])
        np.testing.assert_allclose(np.mean(out, axis=0), target)
        for corner in out:
            np.testing.assert_allclose(
                np.abs(corner - target), [30.0, 30.0])

    def test_full_matrix_maps_tile_to_bev(self, rng):
        tile_img = random_quad(rng, spread=100.0) + np.array([[200.0, 150.0]])
        axis = np.array([[0.0, 0.0], [100.0, 0.0]])
        tile_img = geometry.order_points_counter_clockwise(
            tile_img, axis + np.mean(tile_img, axis=0))
        m = geometry.calculate_transform_matrix(
            tile_img, output_shape=(512, 512), dist2target=(10.0, 120.0),
            tile_length=60.0, cm_per_px=1.0, yaw=0.3)
        expected = geometry.bev_tile_corners(
            (512, 512), (10.0, 120.0), 60.0, 1.0, 0.3)
        got = geometry.apply_homography(m, tile_img.astype(np.float32))
        np.testing.assert_allclose(got, expected, atol=1e-3)


class TestOrderCornersForCalibration:
    """The camera-side labeling must match the BEV-side convention, or
    the solved homography pairs corners diagonally (a twisted warp)."""

    def _camera_corners(self, yaw):
        # Known ground truth: map the BEV tile corners through a
        # plausible BEV→camera homography (forward camera: far edge of
        # the ground shorter than the near edge).  The correspondence
        # camera[i] ↔ bev[i] is then known by construction.
        bev_pts = geometry.bev_tile_corners((512, 512), (5.0, 110.0),
                                            60.0, 2.0, yaw)
        sq = np.array([[0.0, 512.0], [512.0, 512.0],
                       [0.0, 0.0], [512.0, 0.0]])
        trap = np.array([[100.0, 256.0], [412.0, 256.0],
                         [200.0, 120.0], [312.0, 120.0]])
        h_b2c = geometry.get_perspective_transform(sq, trap)
        return geometry.apply_homography(h_b2c, bev_pts), bev_pts

    @pytest.mark.parametrize("yaw", [0.0, 0.12, -0.3])
    def test_recovers_convention_from_any_input_order(self, yaw):
        import itertools
        cam, _ = self._camera_corners(yaw)
        for perm in itertools.permutations(range(4)):
            ordered = geometry.order_corners_for_calibration(
                cam[list(perm)], yaw)
            np.testing.assert_allclose(ordered, cam, atol=1e-9)

    def test_solved_matrix_is_not_twisted(self):
        # End-to-end: shuffled corners → order → solve → each camera
        # corner must land on ITS OWN BEV spot (not a diagonal swap).
        yaw = 0.12
        cam, bev_pts = self._camera_corners(yaw)
        shuffled = cam[[2, 0, 3, 1]]
        ordered = geometry.order_corners_for_calibration(shuffled, yaw)
        m = geometry.calculate_transform_matrix(
            ordered, output_shape=(512, 512), dist2target=(5.0, 110.0),
            tile_length=60.0, cm_per_px=2.0, yaw=yaw)
        got = geometry.apply_homography(m, cam.astype(np.float32))
        np.testing.assert_allclose(got, bev_pts, atol=1e-2)

    def test_rejects_wrong_shape(self):
        with pytest.raises(ValueError, match=r"\(4, 2\)"):
            geometry.order_corners_for_calibration(np.zeros((3, 2)))
