"""Temporal occupancy fusion: accumulate evidence across frames.

The reference publishes each frame's grid independently, so one noisy
segmentation flickers obstacles in and out of the map.  This adds the
standard log-odds temporal filter as a jitted scan-friendly update:

    odds_t = clip(decay * odds_{t-1} + obs_t)

where per-frame grids (int8 {-1, 0, 100}) map to observation increments
(unknown→0, free→-1 step, occupied→+1 step).  Rendering back to the same
int8 alphabet is evidence-gated in both directions: a cell is *occupied*
only above ``occupied_threshold`` (one glitch frame is not enough at the
defaults) and *free* only below ``-free_threshold`` — mere absence of
observations decays toward 0 and renders as **unknown**, never as free,
so the filter cannot invent traversable space for cells it stopped
seeing.  Cells never observed stay -1.

Pure function + tiny state pytree: compose :func:`fuse_step` after the
pipeline inside jit / ``lax.scan``, or use :class:`TemporalGridFusion`
host-side (numpy by default — the per-frame grid is already on the host
there, and a device round-trip for an 80x80 elementwise op would cost
more than it computes on a remote TPU link).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FusionState:
    """Carry for the temporal filter."""

    odds: jax.Array       # float32 (H, W), signed occupancy evidence
    observed: jax.Array   # bool (H, W), ever seen inside the FOV

    def tree_flatten(self):
        return (self.odds, self.observed), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, shape: Tuple[int, int]) -> "FusionState":
        return cls(odds=jnp.zeros(shape, jnp.float32),
                   observed=jnp.zeros(shape, jnp.bool_))


def fuse_step(state: FusionState,
              grid: jax.Array,
              decay: float = 0.9,
              step: float = 1.0,
              max_odds: float = 5.0,
              occupied_threshold: float = 1.5,
              free_threshold: float = 0.25,
              ) -> Tuple[FusionState, jax.Array]:
    """One temporal update; jit/scan-safe.

    Args:
      state: previous :class:`FusionState` (or ``FusionState.create``).
      grid: int8 (H, W) in {-1 unknown, 0 free, 100 occupied}.
      decay: evidence half-life knob (closer to 1 = longer memory).
      step: evidence increment per observation.
      max_odds: saturation bound.
      occupied_threshold: odds above this render occupied.  The default
        (1.5 with step 1.0) requires ≥2 net occupied observations — one
        glitch frame stays unknown/free.
      free_threshold: odds below ``-free_threshold`` render free.  Free
        therefore requires actual free *evidence*; cells whose evidence
        merely decayed away (e.g. they left the FOV) render unknown, not
        free.

    Returns:
      (new state, fused int8 grid in the same {-1, 0, 100} alphabet).
    """
    seen = grid != -1
    obs = jnp.where(grid == 100, step,
                    jnp.where(seen, -step, 0.0)).astype(jnp.float32)
    odds = jnp.clip(decay * state.odds + obs, -max_odds, max_odds)
    observed = state.observed | seen

    fused = jnp.where(~observed, jnp.int8(-1),
                      jnp.where(odds > occupied_threshold, jnp.int8(100),
                                jnp.where(odds < -free_threshold,
                                          jnp.int8(0), jnp.int8(-1))))
    return FusionState(odds=odds, observed=observed), fused


def translate_state(state: FusionState, dy_cells, dx_cells) -> FusionState:
    """Shift accumulated evidence by whole cells (ego-motion compensation).

    The grid is vehicle-anchored (bottom-center, reference bev.py:183-194),
    so when the robot moves between frames the *world* evidence must shift
    the opposite way in grid coordinates.  ``dy_cells > 0`` moves evidence
    down (robot moved forward), ``dx_cells > 0`` moves it right (robot
    moved left).  Cells shifted in from outside become unobserved.  Shifts
    may be traced values — jit/scan-safe (``jnp.roll`` + edge masks).
    """
    h, w = state.odds.shape
    dy = jnp.asarray(dy_cells, jnp.int32)
    dx = jnp.asarray(dx_cells, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # valid source region after the roll
    valid = ((rows - dy >= 0) & (rows - dy < h)
             & (cols - dx >= 0) & (cols - dx < w))
    odds = jnp.roll(jnp.roll(state.odds, dy, axis=0), dx, axis=1)
    observed = jnp.roll(jnp.roll(state.observed, dy, axis=0), dx, axis=1)
    return FusionState(odds=jnp.where(valid, odds, 0.0),
                       observed=jnp.where(valid, observed, False))


def _fuse_step_np(odds: np.ndarray, observed: np.ndarray,
                  grid: np.ndarray, decay: float, step: float,
                  max_odds: float, occupied_threshold: float,
                  free_threshold: float):
    """Host-side twin of :func:`fuse_step` (same math, numpy)."""
    grid = np.asarray(grid)
    seen = grid != -1
    obs = np.where(grid == 100, step,
                   np.where(seen, -step, 0.0)).astype(np.float32)
    odds = np.clip(decay * odds + obs, -max_odds, max_odds)
    observed = observed | seen
    fused = np.full(grid.shape, -1, np.int8)
    fused[observed & (odds < -free_threshold)] = 0
    fused[observed & (odds > occupied_threshold)] = 100
    return odds, observed, fused


class TemporalGridFusion:
    """Stateful convenience wrapper.

    ``backend="numpy"`` (default) runs on the host — right for the
    streaming loop, where grids already live in host memory and a device
    round-trip would dominate the 80x80 elementwise math on a remote
    link.  ``backend="jax"`` wraps the jitted :func:`fuse_step` for
    callers composing on-device.

    ``cell_m`` enables ego-motion compensation: pass
    ``update(grid, motion_m=(forward, left))`` with the robot's metric
    displacement since the previous frame and the accumulated evidence is
    translated to stay world-aligned (fractional cells accumulate across
    frames, so slow motion is not lost to quantization).
    """

    def __init__(self, shape: Tuple[int, int], decay: float = 0.9,
                 step: float = 1.0, max_odds: float = 5.0,
                 occupied_threshold: float = 1.5,
                 free_threshold: float = 0.25,
                 backend: str = "numpy",
                 cell_m: float = 1.0):
        if backend not in ("numpy", "jax"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self._shape = tuple(shape)
        self._cell_m = float(cell_m)
        self._residual = np.zeros(2)   # fractional cells (dy, dx)
        self._params = (decay, step, max_odds, occupied_threshold,
                        free_threshold)
        if backend == "jax":
            self.state = FusionState.create(shape)
            self._step = jax.jit(
                lambda s, g: fuse_step(s, g, decay=decay, step=step,
                                       max_odds=max_odds,
                                       occupied_threshold=occupied_threshold,
                                       free_threshold=free_threshold))
            self._translate = jax.jit(translate_state)
        else:
            self._odds = np.zeros(shape, np.float32)
            self._observed = np.zeros(shape, bool)

    def _motion_to_cells(self, motion_m) -> Tuple[int, int]:
        # forward motion moves world evidence DOWN the grid (+y);
        # leftward motion moves it RIGHT (+x); accumulate fractions.
        fwd, left = motion_m
        self._residual += np.array([fwd, left]) / self._cell_m
        whole = np.trunc(self._residual).astype(int)
        self._residual -= whole
        return int(whole[0]), int(whole[1])

    def update(self, grid, motion_m=None):
        if motion_m is not None:
            dy, dx = self._motion_to_cells(motion_m)
            if dy or dx:
                if self.backend == "jax":
                    self.state = self._translate(self.state, dy, dx)
                else:
                    s = translate_state(
                        FusionState(odds=jnp.asarray(self._odds),
                                    observed=jnp.asarray(self._observed)),
                        dy, dx)
                    self._odds = np.asarray(s.odds)
                    self._observed = np.asarray(s.observed)
        if self.backend == "jax":
            self.state, fused = self._step(self.state, jnp.asarray(grid))
            return fused
        self._odds, self._observed, fused = _fuse_step_np(
            self._odds, self._observed, grid, *self._params)
        return fused

    def reset(self) -> None:
        if self.backend == "jax":
            self.state = FusionState.create(self._shape)
        else:
            self._odds = np.zeros(self._shape, np.float32)
            self._observed = np.zeros(self._shape, bool)


__all__ = ["FusionState", "fuse_step", "translate_state",
           "TemporalGridFusion"]
