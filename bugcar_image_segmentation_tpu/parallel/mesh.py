"""Device meshes and sharding helpers.

The reference is strictly single-device (SURVEY.md §2c: no DP/TP/PP, no
collectives anywhere).  Scaling here follows the JAX/pjit recipe: build a
named :class:`jax.sharding.Mesh`, annotate array shardings, and let XLA
insert the ICI collectives.  One "data" axis covers the framework's real
parallel dimensions — batches of frames and the multi-camera rig
(BASELINE.json config 4) — with an optional "model" axis reserved for
sharding wide classifier channels (tensor parallelism) at larger scales.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """A named mesh over the first ``n_devices`` devices.

    Args:
      n_devices: defaults to all visible devices.
      axes: axis names; default a pure data mesh.
      shape: explicit per-axis sizes; default puts everything on axis 0.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    grid = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(grid, axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard an array's leading axis across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, small state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of arrays with leading-axis sharding on the mesh."""
    s = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "replicate", "Mesh", "NamedSharding", "P"]
