"""Occupancy-grid construction as one jitted TPU program.

TPU-native rebuild of the reference's ``create_occupancy_grid`` /
``create_occupancy_grid_binary`` (reference bev.py:166-246 / 97-165).  The
reference chains five host/OpenCV passes per frame — warpPerspective, crop/
pad, MORPH_OPEN, INTER_NEAREST resize, warpPolar ray-casting — all on CPU.
Here the homography/grid geometry is calibration-time constant, so
``OccupancyGridBuilder`` precomputes every gather plan on the host once and
compiles the whole frame path into a single XLA program of static-shape
gathers and VPU ops: no host round-trips, batchable with ``vmap``, and
fusable with the segmentation forward pass (see pipeline.py).

Semantics are bit-matched against the cv2 oracle (tests/reference_impl.py)
with two deliberate, documented fixes:
- the warp's ~4 ppm float32 tie-pixel deviation (see ops/warp.py);
- deterministic 0-fill for out-of-FOV polar pixels (the reference's
  warpPolar calls read uninitialised memory — tests/reference_impl.py).

Value semantics of the returned int8 grid (reference bev.py:242-245):
  -1 = unknown (outside camera FOV / behind obstacle in laserscan mode)
   0 = free (road)
 100 = occupied (flat-non-road in multiclass; non-road in binary)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .configs import CalibrationConfig, GridConfig
from .ops import morphology, polar, resize, warp


class TemplateGeometry(NamedTuple):
    """Pixel geometry shared by warp, crop/pad, and binning.

    Mirrors the int-truncation arithmetic of reference bev.py:172-194.
    """

    cells_w: int
    cells_h: int
    tpl_w: int
    tpl_h: int
    # warp-output window fused into the warp (reference crops the full
    # warped image then pastes into a zero template; we warp straight into
    # the template through a coordinate offset + validity rectangle).
    coord_offset: Tuple[int, int]          # (ox, oy): template → warp coords
    valid_rect: Tuple[int, int, int, int]  # (x0, x1, y0, y1) in template px


def template_geometry(cal: CalibrationConfig,
                      grid: GridConfig) -> TemplateGeometry:
    cell_px = grid.cell_px(cal.cm_per_px)
    cells_w, cells_h = grid.cells_w, grid.cells_h
    tpl_w = int(cells_w * cell_px)
    tpl_h = int(cells_h * cell_px)
    out_w, out_h = cal.output_width, cal.output_height
    left_x = int((out_w - tpl_w) / 2)
    top_y = out_h - tpl_h
    src_x0, src_y0 = max(left_x, 0), max(top_y, 0)
    dst_x0, dst_y0 = max(-left_x, 0), max(-top_y, 0)
    crop_w = min(tpl_w, out_w - src_x0)
    return TemplateGeometry(
        cells_w=cells_w, cells_h=cells_h, tpl_w=tpl_w, tpl_h=tpl_h,
        coord_offset=(src_x0 - dst_x0, src_y0 - dst_y0),
        valid_rect=(dst_x0, dst_x0 + crop_w, dst_y0, tpl_h),
    )


class OccupancyGridBuilder:
    """Compiles segmentation-map → int8 occupancy grid for one calibration.

    Args:
      cal: calibration (homography + BEV geometry).  Unlike the reference
        (bev.py:169-170, which compares ``segmap.shape`` — (rows, cols) —
        against ``(width, height)``), the expected segmap shape here is the
        unsurprising (input_height, input_width).
      grid: metric grid geometry.
      mode: "multiclass" (3-class drivability map, reference bev.py:166) or
        "binary" ({0,1} road mask, reference bev.py:97).
      interpolation: "cv2_linear" warps class *values* bilinearly exactly as
        the reference does (bev.py:182 — including the fractional-label
        artefacts that behaviour implies), "nearest" is the semantically
        clean alternative.  "native" is the fast-grid mode: the warp
        samples ONLY the ~cells² template pixels the binning would keep
        (6.4k gather indices instead of 160k at the default geometry —
        the warp is per-index-bound, ops/warp.py), with identical
        per-pixel value math; morphology then runs at CELL resolution,
        the one measurable semantic delta vs the parity path (bounded in
        tests/test_grid_parity.py, reported in PERF.md).
      laserscan: override the calibration's laserscan flag.
      label_scale: accept the segmap at 1/label_scale of the calibrated
        input resolution (a quarter-resolution model head emitting labels
        at H/4 x W/4).  Native-mode only: the cell-center warp reads the
        small map directly, bit-identical to nearest-lifting it first
        (ops/warp.py ``src_scale``) — the input-res label map is never
        materialized.  The parity path genuinely needs template-res
        morphology, so there it rejects.
    """

    def __init__(self,
                 cal: CalibrationConfig,
                 grid: GridConfig,
                 mode: str = "multiclass",
                 interpolation: str = "cv2_linear",
                 laserscan: bool | None = None,
                 label_scale: int = 1):
        if mode not in ("multiclass", "binary"):
            raise ValueError(f"unknown mode {mode!r}")
        if label_scale != 1 and interpolation != "native":
            raise ValueError(
                "label_scale > 1 requires interpolation='native' (the "
                "parity path warps at template resolution; lift the "
                "labels to input res instead)")
        self.cal = cal
        self.grid = grid
        self.mode = mode
        self.laserscan = cal.laserscan if laserscan is None else laserscan
        self.geom = g = template_geometry(cal, grid)
        full_shape = (cal.input_height, cal.input_width)
        self.segmap_shape = (full_shape[0] // label_scale,
                             full_shape[1] // label_scale)
        self.interpolation = interpolation
        self.label_scale = label_scale

        if interpolation == "native":
            self._taps = warp.cell_center_taps(
                cal.matrix_np(),
                src_shape=full_shape,
                tpl_shape=(g.tpl_h, g.tpl_w),
                cells_shape=(g.cells_h, g.cells_w),
                dst_offset=g.coord_offset,
                valid_rect=g.valid_rect,
                src_scale=label_scale,
            )
        else:
            self._taps = warp.perspective_taps(
                cal.matrix_np(),
                src_shape=self.segmap_shape,
                dst_shape=(g.tpl_h, g.tpl_w),
                interpolation=interpolation,
                dst_offset=g.coord_offset,
                valid_rect=g.valid_rect,
            )

        if self.laserscan:
            ch, cw = g.cells_h, g.cells_w
            longer = float(max(cw, ch))
            centre = (cw / 2 - 1, float(ch))
            if mode == "multiclass":
                # reference bev.py:219 passes dsize=(-1,-1) → auto size.
                pw, ph = polar.auto_polar_dsize(longer)
            else:
                # reference bev.py:148 passes the grid's own (w, h).
                pw, ph = cw, ch
            self._fwd_plan = polar.polar_maps((ch, cw), (pw, ph), centre,
                                              longer)
            self._inv_plan = polar.inverse_polar_maps((ch, cw), (ph, pw),
                                                      centre, longer)
            self._polar_shape = (ph, pw)

        self._jitted = jax.jit(self.build)
        self._jitted_batch = jax.jit(jax.vmap(self.build))

    # -- the pure, jit-safe program -----------------------------------------

    def build(self, segmap: jax.Array) -> Union[jax.Array,
                                                Tuple[jax.Array, jax.Array]]:
        """(H, W) uint8 segmap → int8 grid (or a pair in binary+laserscan).

        Pure function of ``segmap``; safe to call inside an enclosing jit
        (the pipeline fuses it behind the model's argmax epilogue).
        """
        return self.build_with_taps(segmap, self._taps)

    def build_with_taps(self, segmap: jax.Array, taps: warp.WarpTaps,
                        ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """Like :meth:`build` but with the warp taps passed as a pytree
        argument — lets callers vmap one builder over a stack of
        per-camera homographies (parallel/multicam.py)."""
        if segmap.shape != self.segmap_shape:
            raise ValueError(f"segmap shape {segmap.shape} != expected "
                             f"{self.segmap_shape}")
        g = self.geom
        shifted = (segmap + jnp.uint8(1)).astype(jnp.uint8)
        template = warp.apply_warp(shifted, taps)

        if self.mode == "multiclass":
            occupied = ((template == 1) | (template == 3)).astype(jnp.uint8)
        else:
            occupied = (template == 1).astype(jnp.uint8)
        opened = morphology.morph_open(occupied, (3, 3))
        # Opening never adds pixels (anchor inside the kernel), so the
        # saturated subtract of reference bev.py:134/204 is just ">".
        speckles = occupied > opened
        template = jnp.where(speckles, jnp.uint8(2), template)

        if self.interpolation == "native":
            # Fast-grid mode: the warp already sampled at cell
            # resolution (warp.cell_center_taps), so the morph-open
            # above ran per cell and there is nothing to bin.
            cells = template
        else:
            cells = resize.resize_nearest(template, (g.cells_h, g.cells_w))

        if self.mode == "multiclass":
            if self.laserscan:
                pol = polar.apply_gather(cells, self._fwd_plan)
                has, col = polar.first_hit_per_row(pol, jnp.uint8(3))
                canvas = polar.splat_first_hits(has, col, self._polar_shape,
                                                1, jnp.uint8)
                unpolar = polar.apply_gather(canvas, self._inv_plan)
                new = jnp.where(cells != 3, cells, unpolar)
            else:
                new = jnp.where(cells == 3, jnp.uint8(1), cells)
            return jnp.where(new == 0, jnp.int8(-1),
                             (200 - new.astype(jnp.int32) * 100)
                             ).astype(jnp.int8)

        # binary mode (reference bev.py:97-165): value-map *before* the
        # optional laserscan pass, and a tuple return in laserscan mode.
        vals = cells.astype(jnp.int32) * 100
        occ_u8 = jnp.where(vals == 0, 255, 200 - vals).astype(jnp.uint8)
        if not self.laserscan:
            return occ_u8.astype(jnp.int8)
        pol = polar.apply_gather(occ_u8, self._fwd_plan)
        has, col = polar.first_hit_per_row(pol, jnp.uint8(100))
        canvas = polar.splat_first_hits(has, col, self._polar_shape,
                                        100, jnp.uint8)
        new = polar.apply_gather(canvas, self._inv_plan).astype(jnp.int8)
        new = jnp.where(occ_u8 == 255, jnp.int8(-1), new)
        return occ_u8.astype(jnp.int8), new

    # -- convenience entry points -------------------------------------------

    def __call__(self, segmap) -> Union[jax.Array, Tuple[jax.Array, ...]]:
        """Build grid(s).  Accepts (H, W) or a (B, H, W) batch."""
        segmap = jnp.asarray(segmap, dtype=jnp.uint8)
        if segmap.ndim == 2:
            return self._jitted(segmap)
        if segmap.ndim == 3:
            return self._jitted_batch(segmap)
        raise ValueError(f"segmap must be (H, W) or (B, H, W), "
                         f"got {segmap.shape}")


@functools.lru_cache(maxsize=8)
def _cached_builder(cal_key, grid_key, mode, interpolation, laserscan):
    cal = CalibrationConfig(*cal_key)
    grid = GridConfig(*grid_key)
    return OccupancyGridBuilder(cal, grid, mode=mode,
                                interpolation=interpolation,
                                laserscan=laserscan)


def create_occupancy_grid(segmap,
                          cal: CalibrationConfig,
                          grid: GridConfig,
                          interpolation: str = "cv2_linear"):
    """One-shot functional API mirroring reference bev.py:166."""
    b = _cached_builder(
        (cal.input_shape, cal.output_shape, cal.dist2target, cal.tile_length,
         cal.cm_per_px, cal.yaw, cal.laserscan, cal.matrix),
        (grid.width_m, grid.height_m, grid.cell_m),
        "multiclass", interpolation, cal.laserscan)
    return b(segmap)


def create_occupancy_grid_binary(segmap,
                                 cal: CalibrationConfig,
                                 grid: GridConfig,
                                 interpolation: str = "cv2_linear"):
    """One-shot functional API mirroring reference bev.py:97."""
    b = _cached_builder(
        (cal.input_shape, cal.output_shape, cal.dist2target, cal.tile_length,
         cal.cm_per_px, cal.yaw, cal.laserscan, cal.matrix),
        (grid.width_m, grid.height_m, grid.cell_m),
        "binary", interpolation, cal.laserscan)
    return b(segmap)


def stack_camera_taps(builders):
    """Stack per-camera warp taps for a vmapped multi-camera grid build.

    All builders must share grid geometry (and hence tap shapes).  Returns
    ``(indices, weights, static)`` where indices/weights carry a leading
    camera axis and ``static`` is the shared non-array tap metadata to
    rebuild :class:`~.ops.warp.WarpTaps` inside the traced body.
    """
    t0 = builders[0]._taps
    for b in builders[1:]:
        if (b._taps.src_shape, b._taps.mode) != (t0.src_shape, t0.mode):
            raise ValueError("cameras disagree on segmap shape or warp "
                             "interpolation mode")
    idx = jnp.stack([b._taps.indices for b in builders])
    wts = jnp.stack([b._taps.weights for b in builders])
    return idx, wts, (t0.src_shape, t0.mode)


def build_grids_vmapped(builder, static, segs, idx, wts):
    """vmap one builder's grid program over stacked per-camera taps.

    ``segs`` is (N_cam, H, W); ``idx``/``wts``/``static`` come from
    :func:`stack_camera_taps`.  This is the single grid-build body shared
    by the local :class:`~.pipeline.MultiCameraPipeline` and the sharded
    :class:`~.parallel.multicam.ShardedMultiCameraPipeline`.
    """
    src_shape, mode = static

    def one(seg, i, w):
        tap = warp.WarpTaps(indices=i, weights=w,
                            src_shape=src_shape, mode=mode)
        return builder.build_with_taps(seg, tap)

    return jax.vmap(one)(segs, idx, wts)


__all__ = [
    "OccupancyGridBuilder", "TemplateGeometry", "template_geometry",
    "create_occupancy_grid", "create_occupancy_grid_binary",
    "stack_camera_taps", "build_grids_vmapped",
]
