"""The fused camera→occupancy-grid pipeline: one XLA program per frame.

This is the TPU-native answer to the reference's ``inference_video.py`` hot
loop (missing from the snapshot; reconstructed in SURVEY.md §3.1).  The
reference crossed the host/device boundary twice per frame and ran three
full-frame CPU passes (preprocess, contour filter, warp/morph/polar); here
the entire chain

    uint8 BGR frame → resize/normalize → backbone → argmax → 3-class remap
    → BEV warp → morph-open → cell binning → (laserscan ray-cast) → int8 grid

is a single jitted program: a raw frame enters HBM and an 80×80-ish int8
grid exits (BASELINE.json north star).  The only other host work is the
tiny grid copy-out.

Streaming uses JAX's async dispatch as the double-buffer: ``stream()``
keeps ``depth`` frames in flight, so host preprocessing/IO of frame N+1
overlaps device compute of frame N — the explicit producer/consumer the
reference never had.

Multi-camera (BASELINE.json config 4): per-camera homography taps are
stacked into one leading axis, the backbone runs the cameras as a batch,
the grid build is ``vmap``-ed, and the per-camera grids max-merge into one
vehicle grid (occupied=100 > free=0 > unknown=-1, so elementwise max is
the correct evidence merge).  Across chips the same program shards by
camera with ``shard_map`` (parallel/).
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import CalibrationConfig, GridConfig, ModelConfig
from .grid import OccupancyGridBuilder
from .models import remap
from .models import preprocess as pre
from .models.api import Engine


class Pipeline:
    """Fused single-camera frame→grid program.

    Args:
      engine: a jit-ready :class:`~.models.api.Engine`.
      cal: calibration whose ``input_shape`` (w, h) matches the engine's
        output resolution.
      grid_cfg: metric grid geometry.
      mode: "multiclass" or "binary" (reference bev.py:166 / 97).
      interpolation: warp parity mode (see grid.py).
    """

    def __init__(self,
                 engine: Engine,
                 cal: CalibrationConfig,
                 grid_cfg: GridConfig,
                 mode: str = "multiclass",
                 interpolation: str = "cv2_linear",
                 use_clahe: bool = False,
                 contour_filter: bool = False):
        expect = (cal.input_height, cal.input_width)
        got = (engine.cfg.input_height, engine.cfg.input_width)
        if expect != got:
            raise ValueError(
                f"calibration input_shape (h, w)={expect} must match the "
                f"engine's output resolution {got}")
        self.engine = engine
        self.builder = OccupancyGridBuilder(cal, grid_cfg, mode=mode,
                                            interpolation=interpolation)
        self.mode = mode

        def run(frame_bgr: jax.Array):
            if use_clahe:
                # Camera pre-enhancement fused into the same program
                # (reference ran it on host, image_processing_utils.py:46).
                from . import postproc
                frame_bgr = postproc.clahe(frame_bgr)
            logits = engine._forward(frame_bgr[None])
            if mode == "multiclass":
                seg = remap.logits_to_drivability(logits,
                                                  engine.remap_table)[0]
            else:
                seg = remap.logits_to_binary_road(logits)[0]
            if contour_filter:
                # Footwell-connectivity road filtering (reference
                # image_processing_utils.py:4-44), device-side.  Road
                # pixels failing the filter demote to flat-non-road —
                # occupied in the grid, the conservative reading of the
                # reference's intent (drop false-positive road).
                from . import postproc
                road = (seg == remap.ROAD).astype(jnp.uint8)
                kept = postproc.contour_noise_removal(road)
                if mode == "multiclass":
                    seg = jnp.where((road == 1) & (kept == 0),
                                    jnp.uint8(remap.FLAT_NON_ROAD), seg)
                else:
                    seg = kept
            return self.builder.build(seg), seg

        self._run = jax.jit(run)
        self._run_batch = jax.jit(jax.vmap(
            lambda f: run(f)[0]))

    def __call__(self, frame_bgr) -> jax.Array:
        """One uint8 BGR frame (H, W, 3) → int8 occupancy grid."""
        grid, _ = self._run(jnp.asarray(frame_bgr))
        return grid

    def segment_and_grid(self, frame_bgr) -> Tuple[jax.Array, jax.Array]:
        """Returns (grid, segmentation map) from the same fused program."""
        grid, seg = self._run(jnp.asarray(frame_bgr))
        return grid, seg

    # -- streaming ------------------------------------------------------------

    def stream(self,
               frames: Iterable[np.ndarray],
               depth: int = 2,
               sync_chunk: Optional[int] = None,
               ) -> Iterator[np.ndarray]:
        """Pipelined streaming: keeps up to ``depth`` frames in flight.

        ``jax.jit`` dispatch is asynchronous, so *not* blocking on a
        frame's result until ``depth`` more are enqueued overlaps host
        IO/decode with device compute — the double-buffered DMA of the
        north star without hand-rolled buffers.

        ``sync_chunk`` amortizes the device→host synchronization: results
        are stacked on device and fetched ``sync_chunk`` grids per
        round-trip (one transfer instead of N).  This matters when the
        host↔device link has high latency (measured ~27 ms per sync on a
        tunneled v5e vs 2.2 ms of compute per frame); on local PCIe the
        difference is negligible.  Default: min(depth, 8).  Grids are
        yielded in order either way; per-grid latency in chunked mode is
        up to ``sync_chunk`` frames.
        """
        if depth < 1:
            raise ValueError("depth must be >= 1")
        sync_chunk = min(depth, 8) if sync_chunk is None else sync_chunk

        inflight: List[jax.Array] = []

        def drain(k: int):
            chunk, rest = inflight[:k], inflight[k:]
            inflight[:] = rest
            if k == 1:
                yield np.asarray(chunk[0])
            else:
                # One stacked device→host transfer for the whole chunk.
                for g in np.asarray(jnp.stack(chunk)):
                    yield g

        for frame in frames:
            grid, _ = self._run(jnp.asarray(frame))
            inflight.append(grid)
            if len(inflight) >= depth + sync_chunk:
                yield from drain(sync_chunk)
        while inflight:
            yield from drain(min(sync_chunk, len(inflight)))

    def warmup(self, frame_shape: Tuple[int, int, int]) -> float:
        """Trigger compilation; returns compile seconds."""
        t0 = time.perf_counter()
        dummy = jnp.zeros(frame_shape, jnp.uint8)
        jax.block_until_ready(self._run(dummy))
        return time.perf_counter() - t0


class MultiCameraPipeline:
    """Fused multi-view pipeline: N cameras → one stitched vehicle grid.

    BASELINE.json config 4.  Each camera has its own calibration (its own
    homography into the shared vehicle BEV frame); frames run through the
    backbone as one batch (so the MXU sees batch=N convs), the grid build
    is vmapped over stacked warp taps, and the per-camera grids merge by
    elementwise max.
    """

    def __init__(self,
                 engine: Engine,
                 cals: Sequence[CalibrationConfig],
                 grid_cfg: GridConfig,
                 interpolation: str = "cv2_linear"):
        if not cals:
            raise ValueError("need at least one calibration")
        self.engine = engine
        self.builders = [OccupancyGridBuilder(c, grid_cfg,
                                              interpolation=interpolation)
                         for c in cals]
        if len({(b.geom.cells_h, b.geom.cells_w)
                for b in self.builders}) != 1:
            raise ValueError("all cameras must share the grid geometry")

        def run(frames_bgr: jax.Array) -> jax.Array:
            logits = engine._forward(frames_bgr)
            segs = remap.logits_to_drivability(logits, engine.remap_table)
            grids = [b.build(segs[i]) for i, b in enumerate(self.builders)]
            return stitch_grids(jnp.stack(grids))

        self._run = jax.jit(run)

    def __call__(self, frames_bgr) -> jax.Array:
        """(N_cam, H, W, 3) uint8 BGR → stitched int8 grid."""
        return self._run(jnp.asarray(frames_bgr))


def stitch_grids(grids: jax.Array) -> jax.Array:
    """Merge per-camera int8 grids: occupied(100) > free(0) > unknown(-1).

    Elementwise max implements exactly that evidence order, making the
    multi-view stitch one VPU op (vs re-projecting point lists on host).
    """
    return jnp.max(grids, axis=0)


def segment_frame(frame_bgr,
                  engine: Engine,
                  cal: CalibrationConfig,
                  grid_cfg: GridConfig,
                  mode: str = "multiclass"):
    """One-shot functional convenience wrapper (builds/caches nothing)."""
    return Pipeline(engine, cal, grid_cfg, mode=mode)(frame_bgr)


__all__ = ["Pipeline", "MultiCameraPipeline", "stitch_grids",
           "segment_frame"]
