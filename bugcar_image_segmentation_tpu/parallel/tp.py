"""Tensor-parallel parameter sharding over a "model" mesh axis.

The reference has no TP (SURVEY.md §2c) and ENet-scale models don't need
it on one chip — but wide decoder/classifier layers of the larger
backbones (UNet bottleneck 512ch, SegFormer decoder 256ch) shard cleanly
over channels.  Expressed entirely through ``jax.sharding``: parameters
whose channel axes are large get a NamedSharding over the "model" axis,
activations stay data-sharded, and XLA inserts the all-gathers /
reduce-scatters where the shardings meet (the scaling-book recipe — no
hand-written collectives).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for(path: Tuple[str, ...], leaf, mesh: Mesh,
                axis: str = "model", min_channels: int = 64) -> P:
    """PartitionSpec for one parameter leaf.

    Conv kernels (H, W, I, O) and dense kernels (I, O) shard their output-
    channel axis over ``axis`` when it is large enough and divisible;
    biases/scales shard their (only) axis under the same condition;
    everything else replicates.
    """
    size = mesh.shape[axis]
    shape = np.shape(leaf)
    name = path[-1] if path else ""
    if name == "kernel" and len(shape) >= 2:
        out_ch = shape[-1]
        if out_ch >= min_channels and out_ch % size == 0:
            return P(*((None,) * (len(shape) - 1) + (axis,)))
    elif name in ("bias", "scale", "alpha", "mean", "var") \
            and len(shape) == 1:
        if shape[0] >= min_channels and shape[0] % size == 0:
            return P(axis)
    return P()


def shard_params_tp(tree, mesh: Mesh, axis: str = "model",
                    min_channels: int = 64):
    """Place a variable tree with channel-sharded large layers.

    Returns the same pytree with every leaf ``device_put`` under its TP
    NamedSharding.  Leaves whose shapes don't divide stay replicated, so
    the transform is always safe.
    """

    def place(path, leaf):
        names = tuple(getattr(k, "key", getattr(k, "idx", str(k)))
                      for k in path)
        spec = tp_spec_for(names, leaf, mesh, axis, min_channels)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_engine_tp(engine, mesh: Mesh, axis: str = "model",
                    min_channels: int = 64):
    """Serve an :class:`~..models.api.Engine` tensor-parallel.

    Channel-shards the engine's variable tree over the mesh's ``axis``
    and lets GSPMD propagate: the same jitted predict/pipeline programs
    then run each wide conv/dense column-parallel with XLA-inserted
    collectives — no model-code changes, exactly the mechanism the
    dp×tp train step uses (tests/test_parallel.py).  Flat-buffer
    packing is disabled first: packed buffers concatenate leaves and
    would destroy the per-leaf channel shardings (packing exists for
    remote-link marshaling; TP serving is a multi-chip, co-located
    regime where it does not apply).

    The sharding is installed as the engine's ``weights_placer``, so it
    SURVIVES the weight-management APIs: ``load_variables`` /
    ``cache_weights`` re-place their new tree under the same TP
    shardings, and ``pack_weights(True)`` refuses (models/api.py).

    Returns the engine (mutated in place).  Parity: same labels as the
    unsharded engine (tests/test_parallel.py).
    """
    engine.pack_weights(False)

    def place(tree):
        return shard_params_tp(tree, mesh, axis, min_channels)

    engine.weights_placer = place
    engine.variables = place(engine.variables)
    return engine


__all__ = ["shard_params_tp", "tp_spec_for", "shard_engine_tp"]
