"""Message-adapter parity vs the reference's scipy/cv2 computation
(reference occgrid_to_ros.py:13-61), without any ROS dependency."""

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from bugcar_image_segmentation_tpu import msg as msg_mod


class TestRotationHelpers:
    @pytest.mark.parametrize("angles", [
        (0.0, 0.0, 0.0), (0.3, -0.2, 1.1), (np.pi / 2, 0.0, -np.pi / 3),
        (-1.0, 2.0, 3.0)])
    def test_quaternion_matches_scipy(self, angles):
        got = msg_mod.euler_xyz_to_quaternion(angles)
        want = R.from_euler("xyz", angles).as_quat()
        # quaternions are double covers: q and -q are the same rotation
        sign = np.sign(np.dot(got, want)) or 1.0
        np.testing.assert_allclose(got * sign, want, atol=1e-12)

    @pytest.mark.parametrize("angles", [(0.3, -0.2, 1.1), (-1.0, 2.0, 3.0)])
    def test_matrix_matches_scipy(self, angles):
        np.testing.assert_allclose(
            msg_mod.euler_xyz_to_matrix(angles),
            R.from_euler("xyz", angles).as_matrix(), atol=1e-12)


class TestOccupancyGridMessage:
    def make(self, rng, pose=(1.0, 2.0, 0.5, 0.1, -0.2, 0.7)):
        grid = rng.integers(-1, 101, size=(80, 60)).astype(np.int8)
        return grid, msg_mod.to_occupancy_grid_msg(
            grid, map_resolution=0.1, map_width=6.0, map_height=8.0,
            time_stamp=123.0, frame_id="map", pose=pose)

    def test_data_matches_reference_reorientation(self, rng):
        grid, m = self.make(rng)
        ref = cv2.rotate(cv2.flip(grid, 0),
                         cv2.ROTATE_90_COUNTERCLOCKWISE).flatten()
        np.testing.assert_array_equal(m.data, ref)

    def test_metadata_swap(self, rng):
        _, m = self.make(rng)
        # reference occgrid_to_ros.py:39-41: msg height ← metric width.
        assert m.height == int(6.0 / 0.1)
        assert m.width == int(8.0 / 0.1)
        assert m.resolution == 0.1
        assert m.frame_id == "map" and m.stamp == 123.0

    def test_origin_matches_reference_math(self, rng):
        pose = (1.0, 2.0, 0.5, 0.1, -0.2, 0.7)
        _, m = self.make(rng, pose)
        rot = R.from_euler("xyz", pose[3:])
        first_cell = np.array([0.0, -6.0 / 2.0, 0.0]) + np.array(pose[:3])
        np.testing.assert_allclose(m.origin_position,
                                   rot.as_matrix() @ first_cell, atol=1e-12)
        want_q = rot.as_quat()
        sign = np.sign(np.dot(m.origin_orientation, want_q)) or 1.0
        np.testing.assert_allclose(m.origin_orientation * sign, want_q,
                                   atol=1e-12)

    def test_grid2d_roundtrip(self, rng):
        grid, m = self.make(rng)
        assert m.grid2d().shape == (m.height, m.width)

    def test_publisher_without_ros(self, rng):
        _, m = self.make(rng)
        pub = msg_mod.GridPublisher()
        pub.publish(m)
        assert pub.last_message is m
