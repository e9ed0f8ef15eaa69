"""Class-index remapping: backbone classes → drivability classes.

The reference collapses its 15-class Cityscapes-like palette (reference
note_label:1-15) into 3 drivability classes with eager TF ops after every
``sess.run`` (reference models.py:55-58):

  - road(0), lane-marking(1)    → 1 (road / drivable)
  - pavement(2), vegetation(9)  → 0 (flat but not road)
  - everything else             → 2 (obstacle)

and a binary variant ``argmax ∈ {0, 1}`` (reference models.py:78-80).

Here the remap is a 256-entry lookup table folded into the jitted forward
pass — the argmax epilogue and the remap gather fuse into the final conv's
epilogue under XLA, so the remap is free instead of a second device
round-trip (SURVEY.md §3.1 boundary #2).

Class indices are load-bearing (SURVEY.md §7 hard parts): the table is the
single source of truth, pinned by tests/test_models.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Drivability classes (the values the grid builder consumes, grid.py).
FLAT_NON_ROAD = 0
ROAD = 1
OBSTACLE = 2

# The 15-class palette of the ENet model (reference note_label:1-15).
ENET_CLASS_NAMES = (
    "road", "lane_marking", "pavement", "building", "wall", "street_pole",
    "unknown6", "unknown7", "tree", "vegetation", "sky", "pedestrian",
    "car_bus", "motorcycle", "unknown14",
)

# Which backbone classes map to which drivability class
# (reference models.py:57-58).
ROAD_CLASSES = (0, 1)
FLAT_CLASSES = (2, 9)


def remap_table(num_classes: int = 15,
                road_classes: Sequence[int] = ROAD_CLASSES,
                flat_classes: Sequence[int] = FLAT_CLASSES) -> np.ndarray:
    """uint8 lookup table: backbone class id → drivability class id."""
    table = np.full((num_classes,), OBSTACLE, dtype=np.uint8)
    table[list(flat_classes)] = FLAT_NON_ROAD
    table[list(road_classes)] = ROAD
    return table


def remap_classes(class_map: jax.Array,
                  table: np.ndarray | None = None) -> jax.Array:
    """Apply the drivability remap to an integer class map (any shape).

    Lowered as a compare/select chain rather than a LUT gather: on TPU a
    gather costs per index (~1.3 ms for a 512x256 map, measured on v5e)
    while the handful of VPU compares fuses into the argmax epilogue for
    free.  The chain is generated from ``table``, so semantics stay
    table-driven.
    """
    if table is None:
        table = remap_table()
    table = np.asarray(table)
    # Most common target is the default; the rest become selects.
    targets, counts = np.unique(table, return_counts=True)
    default = targets[np.argmax(counts)]
    out = jnp.full(class_map.shape, np.uint8(default), jnp.uint8)
    for t in targets:
        if t == default:
            continue
        mask = jnp.zeros(class_map.shape, jnp.bool_)
        for c in np.nonzero(table == t)[0]:
            mask = mask | (class_map == c)
        out = jnp.where(mask, jnp.uint8(t), out)
    return out


def logits_to_drivability(logits: jax.Array,
                          table: np.ndarray | None = None,
                          channel_axis: int = -1) -> jax.Array:
    """argmax over classes + 3-class remap, as one fused epilogue.

    Equivalent to reference models.py:55-58 (tf.argmax + tf.where chains)
    but runs inside the same XLA program as the model.

    Args:
      logits: (..., C) activations (or any axis via ``channel_axis``).
      table: remap lookup; default ENet table.
      channel_axis: which axis holds classes.

    Returns:
      uint8 drivability map with the class axis removed.
    """
    classes = jnp.argmax(logits, axis=channel_axis)
    return remap_classes(classes, table)


def logits_to_binary_road(logits: jax.Array,
                          road_classes: Sequence[int] = ROAD_CLASSES,
                          channel_axis: int = -1) -> jax.Array:
    """uint8 {0,1} road mask — reference models.py:70-82 semantics.

    The reference computes ``(argmax == 0) | (argmax == 1)``; with more than
    two road classes this generalises to membership in ``road_classes``.
    """
    classes = jnp.argmax(logits, axis=channel_axis)
    mask = jnp.zeros_like(classes, dtype=jnp.bool_)
    for c in road_classes:
        mask = mask | (classes == c)
    return mask.astype(jnp.uint8)


__all__ = [
    "FLAT_NON_ROAD", "ROAD", "OBSTACLE",
    "ENET_CLASS_NAMES", "ROAD_CLASSES", "FLAT_CLASSES",
    "remap_table", "remap_classes",
    "logits_to_drivability", "logits_to_binary_road",
]
