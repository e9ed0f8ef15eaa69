"""Compatibility-layer tests: reference call sites must run unmodified."""

import numpy as np
import pytest

from bugcar_image_segmentation_tpu import compat
from bugcar_image_segmentation_tpu.configs import ModelConfig


@pytest.fixture(scope="module")
def enet():
    # Tiny config keeps CPU compiles quick; same code path as 512x256.
    class TinyENET(compat.ENET):
        _CFG = ModelConfig(input_width=64, input_height=32,
                           dtype="float32")

    with pytest.warns(UserWarning, match="not found"):
        return TinyENET("./pretrained_models/enet.pb")


class TestENETCompat:
    def test_reference_call_sequence(self, enet, rng):
        """The reference's exact usage: preprocess → predict."""
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        batch = enet.preprocess(frame)
        assert batch.shape == (1, 32, 64, 3)
        seg = enet.predict(batch)
        assert seg.shape == (32, 64) and seg.dtype == np.uint8
        assert set(np.unique(seg)) <= {0, 1, 2}

    def test_predict_binary(self, enet, rng):
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        mask = enet.predict_binary(enet.preprocess(frame))
        assert set(np.unique(mask)) <= {0, 1}

    def test_class_constants_match_reference(self):
        assert compat.ENET.INPUT_WIDTH == 512
        assert compat.ENET.INPUT_HEIGHT == 256
        np.testing.assert_allclose(compat.ENET.IMAGE_MEAN,
                                   [0.485, 0.456, 0.406])


class TestBevTransformToolsCompat:
    def make(self):
        bev = compat.bev_transform_tools(
            (64, 32), (128, 128), (2.0, 30.0), 60.0, 4.0, 0.12)
        tile = np.array([[26.0, 21.0], [38.0, 21.0],
                         [41.0, 29.0], [23.0, 30.0]])
        bev.calculate_transform_matrix(tile)
        return bev

    def test_reference_grid_call(self, rng):
        bev = self.make()
        seg = rng.integers(0, 3, size=(32, 64), dtype=np.uint8)
        grid = bev.create_occupancy_grid(seg, 4, 4, 0.2)
        assert grid.shape == (20, 20) and grid.dtype == np.int8
        assert set(np.unique(grid)) <= {-1, 0, 100}

    def test_binary_grid_call(self, rng):
        bev = self.make()
        seg = rng.integers(0, 2, size=(32, 64), dtype=np.uint8)
        grid = bev.create_occupancy_grid_binary(seg, 4, 4, 0.2)
        assert grid.dtype == np.int8

    def test_json_roundtrip_via_reference_names(self, tmp_path):
        bev = self.make()
        path = str(tmp_path / "calib.json")
        bev.save_to_JSON(path)
        again = compat.bev_transform_tools.fromJSON(path)
        np.testing.assert_allclose(again.matrix, bev.matrix)


class TestHelpers:
    def test_contour_noise_removal_signature(self, rng):
        mask = (rng.random((64, 128)) > 0.5).astype(np.uint8)
        out = compat.contour_noise_removal(mask)
        assert out.shape == mask.shape and out.dtype == np.uint8

    def test_clahe_signature(self, rng):
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        out = compat.clahe(img)
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_msg_alias(self, rng):
        grid = rng.integers(-1, 101, size=(20, 20)).astype(np.int8)
        m = compat.convert_to_occupancy_grid_msg(
            grid, 0.2, 4.0, 4.0, 0.0, "base_link", [0, 0, 0, 0, 0, 0])
        assert m.data.shape == (400,)

    def test_geometry_aliases(self):
        pt = compat.find_intersection_line([(0, 0), (1, 1)],
                                           [(1, 0), (0, 1)])
        np.testing.assert_allclose(pt, [0.5, 0.5])
