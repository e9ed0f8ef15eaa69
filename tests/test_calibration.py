"""Calibration JSON interop and BEVTransform behaviour."""

import json

import numpy as np

from bugcar_image_segmentation_tpu.calibration import BEVTransform
from bugcar_image_segmentation_tpu.configs import CalibrationConfig


def make_bev():
    bev = BEVTransform(
        input_shape=(512, 256), output_shape=(512, 512),
        dist2target=(10.0, 120.0), tile_length=60.0,
        cm_per_px=2.0, yaw=0.1, laserscan=True)
    tile = np.array([[200.0, 180.0], [300.0, 175.0],
                     [320.0, 240.0], [190.0, 250.0]])
    bev.calculate_transform_matrix(tile)
    return bev


class TestJSONRoundTrip:
    def test_save_load_identical(self, tmp_path):
        bev = make_bev()
        path = str(tmp_path / "calib.json")
        bev.save_to_json(path)
        loaded = BEVTransform.from_json(path)
        np.testing.assert_allclose(loaded.matrix, bev.matrix)
        assert loaded.config == bev.config

    def test_schema_keys_match_reference(self, tmp_path):
        """Keys must match reference bev.py:47-55 (+ the fixed is_laserscan)."""
        bev = make_bev()
        path = str(tmp_path / "calib.json")
        bev.save_to_json(path)
        with open(path) as f:
            data = json.load(f)
        assert set(data.keys()) == {
            "input image size", "output image size", "bev matrix",
            "distance to target", "tile_length", "cm_per_px", "yaw",
            "is_laserscan"}
        assert np.asarray(data["bev matrix"]).shape == (3, 3)

    def test_loads_reference_written_file_without_is_laserscan(self, tmp_path):
        """The reference's save_to_JSON omits is_laserscan (bev.py:47-55);
        we must still load such files (defaulting to non-laserscan)."""
        data = {
            "input image size": [512, 256],
            "output image size": [512, 512],
            "bev matrix": np.eye(3).tolist(),
            "distance to target": [0.0, 100.0],
            "tile_length": 60.0,
            "cm_per_px": 1.0,
            "yaw": 0.0,
        }
        path = tmp_path / "ref_calib.json"
        path.write_text(json.dumps(data))
        bev = BEVTransform.from_json(str(path))
        assert bev.laserscan is False
        np.testing.assert_allclose(bev.matrix, np.eye(3))

    def test_reference_alias_methods(self, tmp_path):
        bev = make_bev()
        path = str(tmp_path / "calib.json")
        bev.save_to_JSON(path)
        loaded = BEVTransform.fromJSON(path)
        np.testing.assert_allclose(loaded.matrix, bev.matrix)


class TestCalibrationConfig:
    def test_matrix_required_error(self):
        cfg = CalibrationConfig((512, 256), (512, 512), (0, 100), 60, 1.0, 0.0)
        try:
            cfg.matrix_np()
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_with_matrix_immutable(self):
        cfg = CalibrationConfig((512, 256), (512, 512), (0, 100), 60, 1.0, 0.0)
        cfg2 = cfg.with_matrix(np.eye(3))
        assert cfg.matrix is None
        np.testing.assert_allclose(cfg2.matrix_np(), np.eye(3))
