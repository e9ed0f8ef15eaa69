"""Property-based tests (hypothesis): geometry and rotation invariants.

These guard the math that everything downstream trusts: homography
algebra, corner ordering stability, quaternion conventions — over the
whole input space, not just the fixtures.
"""

import numpy as np
from hypothesis import given, settings, strategies as st
from scipy.spatial.transform import Rotation as R

from bugcar_image_segmentation_tpu import geometry, msg

finite = st.floats(min_value=-100.0, max_value=100.0,
                   allow_nan=False, allow_infinity=False)
angles = st.floats(min_value=-np.pi, max_value=np.pi,
                   allow_nan=False, allow_infinity=False)


def _cross2(a, b):
    # np.cross on 2-vectors is deprecated in numpy 2.x
    return a[0] * b[1] - a[1] * b[0]


def quad(points):
    """Reject (near-)degenerate quads so the homography solve is sane:
    no two points close, no three points (near-)collinear."""
    pts = np.asarray(points, np.float64).reshape(4, 2)
    for i in range(4):
        for j in range(i + 1, 4):
            if np.linalg.norm(pts[i] - pts[j]) < 2.0:
                return False
    import itertools
    for a, b, c in itertools.combinations(range(4), 3):
        ab, ac = pts[b] - pts[a], pts[c] - pts[a]
        if abs(_cross2(ab, ac)) < 10.0:
            return False
    return True


quads = st.lists(finite, min_size=8, max_size=8).filter(quad)


class TestHomographyProperties:
    @settings(max_examples=60, deadline=None)
    @given(src=quads, dst=quads)
    def test_maps_all_four_correspondences(self, src, dst):
        s = np.asarray(src).reshape(4, 2)
        d = np.asarray(dst).reshape(4, 2)
        try:
            h = geometry.get_perspective_transform(s, d)
        except np.linalg.LinAlgError:
            return  # genuinely singular configuration
        got = geometry.apply_homography(h, s)
        np.testing.assert_allclose(got, d, atol=1e-5, rtol=1e-5)

    @settings(max_examples=60, deadline=None)
    @given(src=quads, dst=quads, pts=st.lists(finite, min_size=6,
                                              max_size=6))
    def test_inverse_round_trips(self, src, dst, pts):
        s = np.asarray(src).reshape(4, 2)
        d = np.asarray(dst).reshape(4, 2)
        try:
            h = geometry.get_perspective_transform(s, d)
            hinv = geometry.invert_homography(h)
        except np.linalg.LinAlgError:
            return
        p = np.asarray(pts).reshape(3, 2)
        w = geometry.apply_homography(h, p)
        denom = h[2, 0] * p[:, 0] + h[2, 1] * p[:, 1] + h[2, 2]
        if np.any(np.abs(denom) < 1e-3) or not np.isfinite(w).all():
            return  # point at/near the horizon line
        back = geometry.apply_homography(hinv, w)
        np.testing.assert_allclose(back, p, atol=1e-4, rtol=1e-4)

    @settings(max_examples=60, deadline=None)
    @given(src=quads, dst=quads, t=st.floats(0.05, 0.95))
    def test_collinearity_preserved(self, src, dst, t):
        s = np.asarray(src).reshape(4, 2)
        d = np.asarray(dst).reshape(4, 2)
        try:
            h = geometry.get_perspective_transform(s, d)
        except np.linalg.LinAlgError:
            return
        a, b = s[0], s[2]
        m = a + t * (b - a)
        wa, wm, wb = geometry.apply_homography(h, np.stack([a, m, b]))
        if not (np.isfinite(wa).all() and np.isfinite(wm).all()
                and np.isfinite(wb).all()):
            return
        span = np.linalg.norm(wb - wa)
        if span < 1e-6 or span > 1e6:
            return
        dev = abs(_cross2(wb - wa, wm - wa)) / span
        assert dev < 1e-4 * max(1.0, span)


class TestRotationProperties:
    @settings(max_examples=100, deadline=None)
    @given(rx=angles, ry=angles, rz=angles)
    def test_quaternion_matches_scipy_everywhere(self, rx, ry, rz):
        got = msg.euler_xyz_to_quaternion((rx, ry, rz))
        want = R.from_euler("xyz", (rx, ry, rz)).as_quat()
        sign = 1.0 if np.dot(got, want) >= 0 else -1.0
        np.testing.assert_allclose(got * sign, want, atol=1e-10)

    @settings(max_examples=100, deadline=None)
    @given(rx=angles, ry=angles, rz=angles)
    def test_quaternion_unit_and_matrix_orthonormal(self, rx, ry, rz):
        q = msg.euler_xyz_to_quaternion((rx, ry, rz))
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        m = msg.quaternion_to_matrix(q)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-12)


class TestCornerOrderingProperties:
    @settings(max_examples=60, deadline=None)
    @given(pts=quads, yaw=angles)
    def test_permutation_invariant(self, pts, yaw):
        """The ordering must be a permutation of the input and stable
        under input shuffling (the property getPerspectiveTransform
        correspondence depends on)."""
        p = np.asarray(pts).reshape(4, 2)
        c, s = np.cos(yaw), np.sin(yaw)
        center = p.mean(0)
        axis = np.stack([center, center + np.array([c, s])])
        base = geometry.order_points_counter_clockwise(p, axis)
        # ties in the rotated y-sign split make ordering input-dependent;
        # skip near-tie configurations
        rot = np.array([[np.cos(-yaw), -np.sin(-yaw)],
                        [np.sin(-yaw), np.cos(-yaw)]])
        rel = (p - center) @ rot.T
        if np.any(np.abs(rel[:, 1]) < 1e-6):
            return  # y-sign split tie: side assignment input-dependent
        dx = np.abs(rel[:, 0][:, None] - rel[:, 0][None, :])
        if np.any(dx[np.triu_indices(4, 1)] < 1e-6):
            return  # x-sort tie within a side: order input-dependent
        for perm in ((1, 0, 3, 2), (3, 2, 1, 0), (2, 3, 0, 1)):
            again = geometry.order_points_counter_clockwise(p[list(perm)],
                                                            axis)
            np.testing.assert_allclose(again, base)
