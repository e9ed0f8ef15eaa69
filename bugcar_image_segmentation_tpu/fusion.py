"""Temporal occupancy fusion: accumulate evidence across frames.

The reference publishes each frame's grid independently, so one noisy
segmentation flickers obstacles in and out of the map.  This adds the
standard log-odds temporal filter as a jitted scan-friendly update:

    odds_t = clip(decay * odds_{t-1} + obs_t)

where per-frame grids (int8 {-1, 0, 100}) map to observation increments
(unknown→0, free→-1 step, occupied→+1 step).  The fused grid thresholds
the odds back into the same int8 {-1, 0, 100} alphabet, so it drops into
the existing message adapter unchanged.  Cells never observed stay -1.

Pure function + tiny state pytree: compose it after the pipeline inside
jit, vmap it over camera rigs, or run it standalone.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


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
              occupied_threshold: float = 0.5,
              ) -> Tuple[FusionState, jax.Array]:
    """One temporal update; jit/scan-safe.

    Args:
      state: previous :class:`FusionState` (or ``FusionState.create``).
      grid: int8 (H, W) in {-1 unknown, 0 free, 100 occupied}.
      decay: evidence half-life knob (closer to 1 = longer memory).
      step: evidence increment per observation.
      max_odds: saturation bound.
      occupied_threshold: odds above this render as occupied.

    Returns:
      (new state, fused int8 grid in the same {-1, 0, 100} alphabet).
    """
    seen = grid != -1
    obs = jnp.where(grid == 100, step,
                    jnp.where(seen, -step, 0.0)).astype(jnp.float32)
    odds = jnp.clip(decay * state.odds + obs, -max_odds, max_odds)
    observed = state.observed | seen

    fused = jnp.where(~observed, jnp.int8(-1),
                      jnp.where(odds > occupied_threshold,
                                jnp.int8(100), jnp.int8(0)))
    return FusionState(odds=odds, observed=observed), fused


class TemporalGridFusion:
    """Stateful convenience wrapper around :func:`fuse_step`."""

    def __init__(self, shape: Tuple[int, int], decay: float = 0.9,
                 step: float = 1.0, max_odds: float = 5.0,
                 occupied_threshold: float = 0.5):
        self.state = FusionState.create(shape)
        self._step = jax.jit(
            lambda s, g: fuse_step(s, g, decay=decay, step=step,
                                   max_odds=max_odds,
                                   occupied_threshold=occupied_threshold))

    def update(self, grid) -> jax.Array:
        self.state, fused = self._step(self.state, jnp.asarray(grid))
        return fused

    def reset(self) -> None:
        self.state = FusionState.create(self.state.odds.shape)


__all__ = ["FusionState", "fuse_step", "TemporalGridFusion"]
