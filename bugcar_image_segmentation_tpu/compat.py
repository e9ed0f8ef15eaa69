"""Drop-in compatibility layer: the reference's names and signatures.

A user of tranqkhue/bugcar_image_segmentation can switch imports and keep
their calling code: every public symbol of the reference exists here with
the same name and calling convention, implemented on the TPU-native stack.

    from bugcar_image_segmentation_tpu.compat import (
        ENET, DeepLabV3, bev_transform_tools,
        convert_to_occupancy_grid_msg, contour_noise_removal, clahe,
        find_intersection_line, order_points_counter_clockwise, testDevice)

Mapping (reference → here):
  models.py ENET/DeepLabV3 (frozen-graph sessions)  → jitted Engines;
    ``.pb`` paths are converted on load when TF is available, otherwise
    the architecture initializes randomly with a warning (the snapshot
    ships no weight blobs — .MISSING_LARGE_BLOBS).
  bev.py bev_transform_tools                        → calibration +
    jitted grid builders behind the same method names/signature quirks.
  occgrid_to_ros.py convert_to_occupancy_grid_msg   → msg.py (returns the
    ROS-free message; pass it to msg.to_rospy_msg for a rospy object).
  image_processing_utils.py / utils.py helpers      → postproc/geometry.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import geometry, postproc
from .calibration import BEVTransform
from .configs import CalibrationConfig, GridConfig, ModelConfig
from .grid import OccupancyGridBuilder
from .models.api import Engine, build_engine
from .msg import to_occupancy_grid_msg
from .utils import get_logger, probe_cameras

_log = get_logger("compat")


# ---------------------------------------------------------------------------
# Model engines (reference models.py)
# ---------------------------------------------------------------------------


class _FrozenGraphEngine:
    """Shared loader: reference-style constructor around an Engine."""

    _MODEL = "enet"
    _CFG = ModelConfig()

    def __init__(self, pb_path: Optional[str] = None):
        variables = None
        if pb_path and os.path.exists(pb_path):
            try:
                from .convert.tf_graphdef import convert_frozen_graph
                probe = build_engine(self._MODEL, self._CFG)
                variables = convert_frozen_graph(
                    pb_path, probe.module,
                    jnp.zeros((1, self._CFG.input_height,
                               self._CFG.input_width, 3), jnp.float32))
            except Exception as e:  # pragma: no cover - depends on TF/blob
                warnings.warn(f"could not convert {pb_path!r} ({e}); "
                              "using initialized weights")
        elif pb_path:
            warnings.warn(f"{pb_path!r} not found (the reference snapshot "
                          "ships no weight blobs); using initialized "
                          "weights")
        self.engine = build_engine(self._MODEL, self._CFG,
                                   variables=variables)

    # Reference contract (models.py:84-95): classmethod-style preprocess
    # of a BGR frame into the batched model input.
    def preprocess(self, bgr_frame):
        from .models import preprocess as pre
        x = pre.preprocess_for_config(jnp.asarray(bgr_frame),
                                      self.engine.cfg)
        return x[None] if x.ndim == 3 else x

    # Reference contract (models.py:42-69): preprocessed batch → uint8
    # 3-class drivability map (squeezed like the reference's output).
    def predict(self, preprocessed):
        out = self.engine._predict_pre(self.engine.serving_variables,
                                       jnp.asarray(preprocessed))
        return np.asarray(out[0] if out.shape[0] == 1 else out)

    # Reference contract (models.py:70-82): {0,1} uint8 road mask.
    def predict_binary(self, preprocessed):
        out = self.engine._predict_pre_binary(
            self.engine.serving_variables, jnp.asarray(preprocessed))
        return np.asarray(out[0] if out.shape[0] == 1 else out)


class ENET(_FrozenGraphEngine):
    """Reference models.py:14-95 (enet.pb, 512x256, 15 classes)."""

    _MODEL = "enet"
    _CFG = ModelConfig()
    INPUT_WIDTH = 512
    INPUT_HEIGHT = 256
    IMAGE_MEAN = np.array([0.485, 0.456, 0.406])
    IMAGE_STD = np.array([0.229, 0.224, 0.225])

    def __init__(self, pb_path: str = "./pretrained_models/enet.pb"):
        super().__init__(pb_path)


class DeepLabV3(_FrozenGraphEngine):
    """Reference models.py:98-136 (deeplab.pb, long edge 1024).

    The reference's engine returned the already-argmaxed semantic map and
    its ``preprocess`` was dead code; here ``predict`` accepts a raw BGR
    image (as the reference's did, models.py:115-125) and the class map
    comes back at input resolution.
    """

    _MODEL = "deeplab"
    _CFG = ModelConfig(name="deeplab", input_width=1024, input_height=512)
    INPUT_SIZE = 1024
    FROZEN_GRAPH_NAME = "deeplab.pb"

    def __init__(self, pb_path: str = "./pretrained_models/deeplab.pb"):
        super().__init__(pb_path)

    def predict(self, bgr_image):
        return np.asarray(self.engine.predict(jnp.asarray(bgr_image)))


# ---------------------------------------------------------------------------
# BEV transform (reference bev.py)
# ---------------------------------------------------------------------------


class bev_transform_tools(BEVTransform):
    """Reference bev.py:8-92 method surface on the TPU grid builders.

    ``create_occupancy_grid(segmap, w_m, h_m, cell_m)`` and the binary
    variant keep the reference's per-call signatures (bev.py:97, 166) and
    its laserscan tuple-return quirk (bev.py:164).
    """

    def _builder(self, grid: GridConfig, mode: str) -> OccupancyGridBuilder:
        key = (grid, mode, self.config.matrix)
        cache = self.__dict__.setdefault("_builders", {})
        if key not in cache:
            cache[key] = OccupancyGridBuilder(self.config, grid, mode=mode)
        return cache[key]

    def create_occupancy_grid(self, segmap, occupancy_grid_width_in_m,
                              occupancy_grid_height_in_m, cell_size_in_m):
        grid = GridConfig(float(occupancy_grid_width_in_m),
                          float(occupancy_grid_height_in_m),
                          float(cell_size_in_m))
        return np.asarray(self._builder(grid, "multiclass")(segmap))

    def create_occupancy_grid_binary(self, segmap,
                                     occupancy_grid_width_in_m,
                                     occupancy_grid_height_in_m,
                                     cell_size_in_m):
        grid = GridConfig(float(occupancy_grid_width_in_m),
                          float(occupancy_grid_height_in_m),
                          float(cell_size_in_m))
        out = self._builder(grid, "binary")(segmap)
        if isinstance(out, tuple):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)


# ---------------------------------------------------------------------------
# Image-processing + utils helpers (reference image_processing_utils.py /
# utils.py)
# ---------------------------------------------------------------------------


def contour_noise_removal(segmap):
    """Reference image_processing_utils.py:4-44 (device-side here)."""
    return np.asarray(postproc.contour_noise_removal(
        jnp.asarray(np.asarray(segmap, dtype=np.uint8))))


def clahe(img):
    """Reference image_processing_utils.py:46-61 (device-side here)."""
    return np.asarray(postproc.clahe(jnp.asarray(img)))


find_intersection_line = geometry.find_intersection_line
order_points_counter_clockwise = geometry.order_points_counter_clockwise


def testDevice(max_index: int = 10) -> None:
    """Reference utils.py:86-90: warn about unopenable camera sources."""
    available = set(probe_cameras(max_index))
    for i in range(max_index):
        if i not in available:
            _log.warning("Warning: unable to open video source: %s", i)


def freeze_session(variables, path, num_classes=15, input_hw=(256, 512)):
    """Reference utils.py:49-83's train→deploy bridge, for Flax weights.

    Takes trained ENet variables and writes the frozen ``.pb`` the
    reference stack serves (``input0:0`` NCHW → ``CATkrIDy/concat:0``,
    variables folded to constants, device placements cleared).  Returns
    the GraphDef.  See convert/tf_enet.py for the era-correct graph.
    """
    from .convert.tf_enet import export_enet_pb

    return export_enet_pb(variables, num_classes, input_hw, path)


# Reference occgrid_to_ros.py:13 — same positional signature; returns the
# ROS-free message (feed to msg.to_rospy_msg under a ROS runtime).
convert_to_occupancy_grid_msg = to_occupancy_grid_msg


__all__ = [
    "ENET", "DeepLabV3", "bev_transform_tools",
    "convert_to_occupancy_grid_msg", "contour_noise_removal", "clahe",
    "find_intersection_line", "order_points_counter_clockwise",
    "testDevice", "freeze_session",
]
