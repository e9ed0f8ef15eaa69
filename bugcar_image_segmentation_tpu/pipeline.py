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

Multi-camera (BASELINE.json config 4): the backbone runs the cameras as
a batch, the grid builds unroll per camera (constant-index gathers; the
vmapped/batched-gather form measured 2.4x slower, PERF.md round 2b), and
the per-camera grids max-merge into one vehicle grid (occupied=100 >
free=0 > unknown=-1, so elementwise max is the correct evidence merge).
Across chips the same program shards by camera with ``shard_map``
(parallel/), one camera per chip.
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import (CalibrationConfig, GridConfig, ModelConfig,
                      RuntimeConfig)
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
                 contour_filter: bool = False,
                 host_resize: bool = False,
                 transport: str = "bgr"):
        expect = (cal.input_height, cal.input_width)
        got = (engine.cfg.input_height, engine.cfg.input_width)
        if expect != got:
            raise ValueError(
                f"calibration input_shape (h, w)={expect} must match the "
                f"engine's output resolution {got}")
        if transport not in ("bgr", "i420"):
            raise ValueError(f"unknown transport {transport!r}")
        if transport == "i420" and not host_resize:
            # The packed plane layout is built at model resolution on the
            # host (a real camera would hand us YUV at capture size and
            # the resize would happen on the Y/UV planes; out of scope).
            raise ValueError("transport='i420' requires host_resize=True")
        # "i420" ships frames as YUV 4:2:0 planes — 1.5 B/px instead of
        # 3 — and converts to BGR on device inside the fused program
        # (ops/yuv.py).  Halves host→device link bytes; the right choice
        # when the link, not compute, bounds throughput (tunneled TPU,
        # PERF.md round 3).
        self.transport = transport
        self.engine = engine
        # Quarter-resolution heads + the native grid compose: the
        # cell-center warp samples the model's small label map directly
        # (bit-identical to nearest-lifting it first — grid.py
        # ``label_scale``), so the input-res label map never enters the
        # grid path.  The contour filter runs at input res, so it keeps
        # the lifted path.
        self._grid_label_scale = (
            engine.label_scale
            if interpolation == "native" and not contour_filter else 1)
        self.builder = OccupancyGridBuilder(
            cal, grid_cfg, mode=mode, interpolation=interpolation,
            label_scale=self._grid_label_scale)
        self.mode = mode
        # When the accelerator sits behind a high-latency/low-bandwidth
        # link (remote TPU), resizing on the host before the transfer cuts
        # link bytes ~2.3x (the reference also resized host-side,
        # models.py:87).  On local PCIe leave it off and let the device
        # resize inside the fused program.
        self.host_resize = host_resize
        self._model_hw = got
        self.default_depth = 2

        def run(variables: dict, frame_bgr: jax.Array):
            # Accepts either the plain tree or the packed flat buffers
            # (engine.serving_variables / engine.pack_weights) — packing
            # removes the per-dispatch per-argument marshaling on remote
            # accelerators (models/packing.py, PERF.md round 3f).
            variables = engine._materialize(variables)
            if self.transport == "i420":
                from .ops import yuv
                frame_bgr = yuv.i420_to_bgr(frame_bgr, self._model_hw)
            if use_clahe:
                # Camera pre-enhancement fused into the same program
                # (reference ran it on host, image_processing_utils.py:46).
                from . import postproc
                frame_bgr = postproc.clahe(frame_bgr)
            logits = engine._forward(variables, frame_bgr[None])
            if mode == "multiclass":
                seg = remap.logits_to_drivability(logits,
                                                  engine.remap_table)[0]
            else:
                seg = remap.logits_to_binary_road(logits)[0]
            # Reduced-resolution heads (SegFormer head_upsample="quarter")
            # argmax below input res; replicate the uint8 LABELS back up
            # so the calibrated warp/contour stages see the resolution
            # the homography was solved for (engine._to_input_res
            # rationale — 1 B/px labels instead of 60 B/px f32 logits).
            # When the native grid reads the small map directly
            # (_grid_label_scale > 1), it taps ``seg_head`` below and
            # the lift survives only for the returned segmentation map.
            seg_head = seg
            seg = engine._to_input_res(seg)
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
            out = self.builder.build(
                seg_head if self._grid_label_scale > 1 else seg)
            if isinstance(out, tuple):
                # binary+laserscan returns (plain, laserscan-like)
                # (reference bev.py:164); stack so the streaming machinery
                # sees one array — grid[0] plain, grid[1] ray-cast.
                out = jnp.stack(out)
            return out, seg

        def run_chunk(variables: dict, frames: jax.Array) -> jax.Array:
            # One <=4-frame chunk: the backbone runs the frames as ONE
            # batch (batch convs amortize per-op fixed costs on the MXU),
            # but the grid builds UNROLL per frame — vmapping `run` would
            # turn the warp's packed gather into a BATCHED gather, which
            # XLA lowers ~2.4x slower than K constant-index gathers (the
            # multi-camera pipeline's round-2b lesson; re-measured as the
            # round-5 batch-gap fix — the vmapped form cost ~0.2 ms/frame,
            # PERF.md round 5b).  The elementwise stages (i420, clahe,
            # remap, label lift) stay batched — they vectorize trivially.
            variables = engine._materialize(variables)
            if self.transport == "i420":
                from .ops import yuv
                # Unrolled per frame: converting the (K, 3H/2, W) batch
                # in one op costs +0.22 ms/frame at K=4 — the batched
                # chroma reshape (W → W/2 across the lane dim) is a
                # relayout whether vmapped or explicit; K independent 2D
                # conversions are near the single-frame cost (0.17 vs
                # 0.14 ms — PERF.md round 5b).
                frames = jnp.stack(
                    [yuv.i420_to_bgr(frames[j], self._model_hw)
                     for j in range(frames.shape[0])])
            if use_clahe:
                from . import postproc
                frames = jax.vmap(postproc.clahe)(frames)
            logits = engine._forward(variables, frames)
            if mode == "multiclass":
                segs = remap.logits_to_drivability(logits,
                                                   engine.remap_table)
            else:
                segs = remap.logits_to_binary_road(logits)
            seg_heads = segs
            segs = engine._to_input_res(segs)
            if contour_filter:
                from . import postproc
                road = (segs == remap.ROAD).astype(jnp.uint8)
                kept = jax.vmap(postproc.contour_noise_removal)(road)
                if mode == "multiclass":
                    segs = jnp.where((road == 1) & (kept == 0),
                                     jnp.uint8(remap.FLAT_NON_ROAD), segs)
                else:
                    segs = kept
            src = seg_heads if self._grid_label_scale > 1 else segs
            outs = []
            for j in range(frames.shape[0]):
                out = self.builder.build(src[j])
                if isinstance(out, tuple):
                    out = jnp.stack(out)
                outs.append(out)
            return jnp.stack(outs)

        def run_batch(variables: dict, frames: jax.Array) -> jax.Array:
            # Batches beyond 4 overflow VMEM (the packed warp sources
            # alone are 2 MB f32 each, plus stem activations) and turn
            # the program HBM-bound — measured 2x/frame at batch 8
            # (PERF.md round 2).  Chunk the batch through a lax.map so
            # the working set stays one 4-frame chunk.
            k = frames.shape[0]
            chunk = 4
            if k <= chunk:
                return run_chunk(variables, frames)
            # Never run more than `chunk` frames in one chunk — pad
            # ragged batches up to a chunk multiple (recomputing a few
            # head frames) and drop the extras, instead of silently
            # falling back to a whole-batch program whose working set
            # spills VMEM (measured 2x/frame at batch 8, PERF.md).
            pad = -k % chunk
            if pad:
                frames = jnp.concatenate([frames, frames[:pad]], axis=0)
            fr = frames.reshape(((k + pad) // chunk, chunk)
                                + frames.shape[1:])
            grids = jax.lax.map(
                lambda c: run_chunk(variables, c), fr)
            return grids.reshape((k + pad,) + grids.shape[2:])[:k]

        # Variables ride along as a runtime argument (see models/api.py) so
        # engine.load_variables() affects compiled pipelines immediately.
        self._run = jax.jit(run)
        self._run_batch = jax.jit(run_batch)
        self._run_impl = run
        self._run_batch_impl = run_batch  # un-jitted body (bench/export)

    @classmethod
    def from_configs(cls,
                     engine: Engine,
                     cal: CalibrationConfig,
                     grid_cfg: GridConfig,
                     runtime: RuntimeConfig,
                     **overrides) -> "Pipeline":
        """Build a pipeline from a :class:`~.configs.RuntimeConfig`.

        The runtime config's ``warp_interpolation`` selects the parity
        mode and its ``pipeline_depth`` becomes the default streaming
        depth (see :meth:`stream`); keyword overrides win.
        """
        kwargs = dict(interpolation=runtime.warp_interpolation)
        kwargs.update(overrides)
        pipe = cls(engine, cal, grid_cfg, **kwargs)
        pipe.default_depth = runtime.pipeline_depth
        return pipe

    def _prep(self, frame_bgr) -> jax.Array:
        """Optional host-side resize, then the host→device transfer."""
        if not self.host_resize:
            return jnp.asarray(frame_bgr)
        return jnp.asarray(self._prep_host(frame_bgr))

    def __call__(self, frame_bgr) -> jax.Array:
        """One uint8 BGR frame (H, W, 3) → int8 occupancy grid."""
        grid, _ = self._run(self.engine.serving_variables,
                            self._prep(frame_bgr))
        return grid

    def segment_and_grid(self, frame_bgr) -> Tuple[jax.Array, jax.Array]:
        """Returns (grid, segmentation map) from the same fused program."""
        grid, seg = self._run(self.engine.serving_variables,
                              self._prep(frame_bgr))
        return grid, seg

    # -- streaming ------------------------------------------------------------

    def stream(self,
               frames: Iterable[np.ndarray],
               depth: Optional[int] = None,
               sync_chunk: Optional[int] = None,
               transfer_batch: int = 1,
               ) -> Iterator[np.ndarray]:
        """Pipelined streaming: keeps up to ``depth`` dispatches in flight.

        ``jax.jit`` dispatch is asynchronous, so *not* blocking on a
        frame's result until ``depth`` more are enqueued overlaps host
        IO/decode with device compute — the double-buffered DMA of the
        north star without hand-rolled buffers.

        Two knobs amortize per-RPC overhead on high-latency links (a
        tunneled TPU measures ~12 ms per host→device put and ~27 ms per
        sync, vs 2.2 ms of per-frame compute; both are ~free on local
        PCIe):

        - ``sync_chunk``: results are stacked on device and fetched
          ``sync_chunk`` grids per device→host round-trip.
        - ``transfer_batch``: K frames ship as ONE host→device put and run
          through a vmapped program (BASELINE config 3's batched
          streaming).  Adds up to K-1 frames of latency — right for
          recorded video / multi-camera rigs, wrong for a live single
          camera; keep K=1 there.

        Grids are yielded in order in all modes.
        """
        depth = self.default_depth if depth is None else depth
        if depth < 1:
            raise ValueError("depth must be >= 1")
        if transfer_batch < 1:
            raise ValueError("transfer_batch must be >= 1")
        sync_chunk = min(depth, 8) if sync_chunk is None else sync_chunk

        # Reuse the instance's jitted batched program: jit caches by
        # callable identity, so a fresh lambda here would retrace (and pay
        # a full compile) on every stream() call.
        run_batch = self._run_batch if transfer_batch > 1 else None
        inflight: List[Tuple[jax.Array, int]] = []  # ((K, gh, gw), n_valid)
        pending: List[np.ndarray] = []   # host frames awaiting dispatch

        def dispatch():
            if not pending:
                return
            n = len(pending)
            if transfer_batch == 1:
                grid, _ = self._run(self.engine.serving_variables,
                                    self._prep(pending[0]))
                inflight.append((grid[None], 1))
            else:
                # Pad a final partial batch to the compiled shape (the
                # extra rows are dropped at drain) — a short tail is
                # cheaper than a recompile.
                padded = pending + [pending[-1]] * (transfer_batch - n)
                stacked = np.stack([self._prep_host(f) for f in padded])
                inflight.append((run_batch(self.engine.serving_variables,
                                           jnp.asarray(stacked)), n))
            pending.clear()

        def drain(k: int):
            chunk, rest = inflight[:k], inflight[k:]
            inflight[:] = rest
            arrays = [g for g, _ in chunk]
            fetched = (np.asarray(arrays[0]) if k == 1
                       else np.asarray(jnp.concatenate(arrays, axis=0)))
            off = 0
            for g, n in chunk:
                yield from fetched[off:off + n]
                off += g.shape[0]

        for frame in frames:
            pending.append(frame)
            if len(pending) >= transfer_batch:
                dispatch()
            if len(inflight) >= depth + sync_chunk:
                yield from drain(sync_chunk)
        dispatch()
        while inflight:
            yield from drain(min(sync_chunk, len(inflight)))

    def _prep_host(self, frame_bgr) -> np.ndarray:
        """Host-side half of :meth:`_prep` (no device transfer)."""
        frame_bgr = np.asarray(frame_bgr)
        if self.host_resize:
            h, w = self._model_hw
            if frame_bgr.shape[:2] != (h, w):
                import cv2
                frame_bgr = cv2.resize(frame_bgr, (w, h),
                                       interpolation=cv2.INTER_LINEAR)
        if self.transport == "i420":
            from .ops import yuv
            frame_bgr = yuv.bgr_to_i420_host(frame_bgr)
        return frame_bgr

    def warmup(self, frame_shape: Tuple[int, int, int]) -> float:
        """Trigger compilation; returns compile seconds."""
        t0 = time.perf_counter()
        dummy = np.zeros(frame_shape, np.uint8)
        jax.block_until_ready(
            self._run(self.engine.serving_variables, self._prep(dummy)))
        return time.perf_counter() - t0


class MultiCameraPipeline:
    """Fused multi-view pipeline: N cameras → one stitched vehicle grid.

    BASELINE.json config 4.  Each camera has its own calibration (its own
    homography into the shared vehicle BEV frame); frames run through the
    backbone as one batch (so the MXU sees batch=N convs), the grid
    builds unroll per camera (constant-index gathers — measured 2.4x
    faster than the vmapped/batched-gather form, PERF.md round 2b), and
    the per-camera grids merge by elementwise max.
    """

    def __init__(self,
                 engine: Engine,
                 cals: Sequence[CalibrationConfig],
                 grid_cfg: GridConfig,
                 interpolation: str = "cv2_linear"):
        if not cals:
            raise ValueError("need at least one calibration")
        self.engine = engine
        # Quarter-head engines + native grids read the small label maps
        # directly, as in Pipeline (grid.py ``label_scale``).
        scale = engine.label_scale if interpolation == "native" else 1
        self._grid_label_scale = scale
        self.builders = [OccupancyGridBuilder(c, grid_cfg,
                                              interpolation=interpolation,
                                              label_scale=scale)
                         for c in cals]
        if len({(b.geom.cells_h, b.geom.cells_w)
                for b in self.builders}) != 1:
            raise ValueError("all cameras must share the grid geometry")
        # Stacked taps kept for the sharded variant (parallel/multicam.py);
        # the LOCAL build unrolls one grid program per camera instead of
        # vmapping over them: a vmapped warp becomes a batched gather,
        # which XLA lowers ~2.4x slower than four constant-index gathers
        # (4-cam grid build 4.61 -> 1.91 ms, measured on the bench v5e —
        # PERF.md round 2b).  Per-chip the sharded path holds one camera,
        # so its size-1 vmap does not hit the batched lowering.
        from .grid import stack_camera_taps
        self._idx, self._wts, self._taps_static = stack_camera_taps(
            self.builders)

        def run(variables: dict, frames_bgr: jax.Array) -> jax.Array:
            variables = engine._materialize(variables)
            logits = engine._forward(variables, frames_bgr)
            segs = remap.logits_to_drivability(logits, engine.remap_table)
            if self._grid_label_scale == 1:
                segs = engine._to_input_res(segs)
            grids = [b.build(segs[k]) for k, b in enumerate(self.builders)]
            return stitch_grids(jnp.stack(grids))

        self._run = jax.jit(run)
        self._run_impl = run  # un-jitted body for AOT export (deploy.py)

    def __call__(self, frames_bgr) -> jax.Array:
        """(N_cam, H, W, 3) uint8 BGR → stitched int8 grid."""
        return self._run(self.engine.serving_variables,
                         jnp.asarray(frames_bgr))


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
