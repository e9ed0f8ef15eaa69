"""Multi-chip multi-camera inference: cameras shard across the mesh.

BASELINE.json config 4 at scale: when the 4-camera rig spans more than one
chip, frames shard over the "data" axis, each chip runs the fused
frame→grid program for its cameras, and the per-camera grids merge with a
``jax.lax.pmax`` over the axis — a max all-reduce riding ICI (SURVEY.md §5:
"the grid stitch is an all_gather/max-merge with zero custom backend
work").  Expressed with ``shard_map`` so the per-chip body is the ordinary
single-chip code from pipeline.py.
"""

from __future__ import annotations


from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..configs import CalibrationConfig, GridConfig
from ..grid import OccupancyGridBuilder
from ..models import remap
from ..models.api import Engine
from ..pipeline import stitch_grids


class ShardedMultiCameraPipeline:
    """N cameras sharded over a device mesh → one stitched vehicle grid.

    Cameras must divide evenly across the mesh's data axis.  Each shard
    batches its local cameras through the backbone, vmap-builds their
    grids (each camera has its own homography taps), max-merges locally,
    then ``pmax`` merges across chips.
    """

    def __init__(self,
                 engine: Engine,
                 cals: Sequence[CalibrationConfig],
                 grid_cfg: GridConfig,
                 mesh: Mesh,
                 axis: str = "data",
                 interpolation: str = "cv2_linear"):
        n_cam = len(cals)
        n_dev = mesh.shape[axis]
        if n_cam % n_dev != 0:
            raise ValueError(f"{n_cam} cameras do not divide over "
                             f"{n_dev} devices")
        self.engine = engine
        self.mesh = mesh
        self.axis = axis
        # Quarter-head engines + native grids tap the small label maps
        # directly (grid.py ``label_scale``); other interpolations lift
        # the labels to input res first (engine._to_input_res).
        scale = (engine.label_scale if interpolation == "native" else 1)
        self._grid_label_scale = scale
        builders = [OccupancyGridBuilder(c, grid_cfg,
                                         interpolation=interpolation,
                                         label_scale=scale)
                    for c in cals]
        if len({(b.geom.cells_h, b.geom.cells_w) for b in builders}) != 1:
            raise ValueError("all cameras must share the grid geometry")
        # Stack per-camera warp gather arrays into one leading axis so the
        # local shard can vmap over its cameras (shared body with the
        # single-chip MultiCameraPipeline — grid.build_grids_vmapped).
        from ..grid import build_grids_vmapped, stack_camera_taps
        self._idx, self._wts, self._taps_static = stack_camera_taps(builders)
        self._builder0 = builders[0]

        def local_body(variables, frames, idx, wts):
            # frames: (cams_per_shard, H, W, 3) on this chip.
            variables = engine._materialize(variables)
            logits = engine._forward(variables, frames)
            segs = remap.logits_to_drivability(logits, engine.remap_table)
            if self._grid_label_scale == 1:
                segs = engine._to_input_res(segs)
            grids = build_grids_vmapped(self._builder0, self._taps_static,
                                        segs, idx, wts)
            local = stitch_grids(grids)
            return jax.lax.pmax(local, axis)

        self._fn = jax.jit(shard_map(
            local_body, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=P(),
        ))

    def __call__(self, frames_bgr) -> jax.Array:
        """(N_cam, H, W, 3) uint8 BGR → stitched int8 grid (replicated)."""
        return self._fn(self.engine.serving_variables,
                        jnp.asarray(frames_bgr), self._idx, self._wts)


__all__ = ["ShardedMultiCameraPipeline"]
