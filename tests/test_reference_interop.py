"""Interop with the actual reference package, when mounted.

These tests exercise the real compatibility contract: calibration JSON
written by this framework must load through the *reference's own*
``bev_transform_tools.fromJSON``, and vice versa.  Skipped when the
reference snapshot isn't available (CI without the mount).
"""

import json
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference snapshot not mounted")


@pytest.fixture(scope="module")
def reference_bev(tmp_path_factory):
    """Import the reference's bev module as a package member."""
    pkg_dir = tmp_path_factory.mktemp("refpkg")
    os.symlink(REFERENCE, pkg_dir / "bugcar_ref")
    sys.modules.setdefault("numpy_indexed",
                           types.ModuleType("numpy_indexed"))
    sys.path.insert(0, str(pkg_dir))
    try:
        from bugcar_ref.bev import bev_transform_tools
    finally:
        sys.path.pop(0)
    return bev_transform_tools


def our_calibration():
    from bugcar_image_segmentation_tpu.calibration import BEVTransform
    bev = BEVTransform((512, 256), (512, 512), (5.0, 110.0), 60.0, 2.0,
                       0.12)
    bev.calculate_transform_matrix(np.array(
        [[210.0, 170.0], [305.0, 168.0], [330.0, 235.0], [185.0, 242.0]]))
    return bev


class TestJSONInterop:
    def test_reference_loads_our_json(self, reference_bev, tmp_path):
        ours = our_calibration()
        path = str(tmp_path / "calib.json")
        ours.save_to_json(path)
        theirs = reference_bev.fromJSON(path)
        np.testing.assert_allclose(
            np.asarray(theirs._bev_matrix, dtype=np.float64).reshape(3, 3),
            ours.matrix)
        assert (theirs.input_width, theirs.input_height) == ours.input_shape
        assert theirs.cm_per_px == ours.config.cm_per_px

    def test_we_load_reference_written_json(self, reference_bev, tmp_path):
        # The reference's own save_to_JSON (bev.py:44-56) — note it omits
        # the is_laserscan key its loader requires; ours tolerates that.
        ours = our_calibration()
        path = str(tmp_path / "calib.json")
        ours.save_to_json(path)
        theirs = reference_bev.fromJSON(path)
        ref_path = str(tmp_path / "ref_calib.json")
        theirs.save_to_JSON(ref_path)

        from bugcar_image_segmentation_tpu.calibration import BEVTransform
        again = BEVTransform.from_json(ref_path)
        np.testing.assert_allclose(again.matrix, ours.matrix)
        assert again.laserscan is False

    def test_reference_schema_keys_exact(self, tmp_path):
        ours = our_calibration()
        path = str(tmp_path / "calib.json")
        ours.save_to_json(path)
        data = json.load(open(path))
        # exactly the reference's keys (bev.py:47-55) + the is_laserscan
        # key its fromJSON requires (bev.py:37)
        assert set(data) == {
            "input image size", "output image size", "bev matrix",
            "distance to target", "tile_length", "cm_per_px", "yaw",
            "is_laserscan"}
