"""TPU-native camera→occupancy-grid perception framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
tranqkhue/bugcar_image_segmentation (see SURVEY.md): semantic segmentation
backbones, calibrated bird's-eye-view projection, metric occupancy grids,
laserscan-style ray casting, ROS-free message construction — fused into
single XLA programs that go raw camera frame → int8 occupancy grid with
no host round-trips.

Layer map (bottom-up):
  ops/        cv2-parity resamplers, morphology, polar + Pallas kernels
  geometry    calibration-time homography math (host, cold path)
  configs     pytree configs incl. reference-schema calibration JSON
  models/     ENet / DeepLabV3 / UNet / SegFormer engines (Flax, NHWC)
  convert/    frozen TF GraphDef / Keras h5 → Flax weight bridges
  grid        segmap → occupancy grid as one jitted program
  fusion      temporal log-odds evidence accumulation
  pipeline    fused frame→grid; streaming; multi-camera stitch
  postproc    contour filtering, CLAHE (device-side)
  fov         BEV field-of-view footprint/outline
  evaluation  accuracy / IoU / bit-parity harness
  msg         nav_msgs/OccupancyGrid semantics, ROS-free (+rospy edge)
  deploy      AOT frozen-graph artifacts (jax.export StableHLO)
  training/   loss, train state, sharded train steps
  parallel/   device meshes, camera-sharded multi-view inference
  io/         frame sources, capture threads, native C++ frame ring
  utils/      checkpoints, profiling, logging, camera probing
"""

from . import configs, geometry
from .calibration import BEVTransform
from .configs import CalibrationConfig, GridConfig, ModelConfig, RuntimeConfig
from .fusion import FusionState, TemporalGridFusion, fuse_step
from .grid import (OccupancyGridBuilder, create_occupancy_grid,
                   create_occupancy_grid_binary)
from .pipeline import MultiCameraPipeline, Pipeline, stitch_grids

__version__ = "0.1.0"

__all__ = [
    "BEVTransform", "CalibrationConfig", "GridConfig", "ModelConfig",
    "RuntimeConfig", "OccupancyGridBuilder", "create_occupancy_grid",
    "create_occupancy_grid_binary", "Pipeline", "MultiCameraPipeline",
    "stitch_grids", "configs", "geometry",
    "FusionState", "TemporalGridFusion", "fuse_step",
]
