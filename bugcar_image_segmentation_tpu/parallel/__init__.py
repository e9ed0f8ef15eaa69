"""Multi-chip scaling: meshes, shardings, and sharded pipelines.

The reference has no distributed axis at all (SURVEY.md §2c); here
parallelism is expressed the JAX way — named meshes + sharding
annotations, XLA inserting the ICI collectives:

- :mod:`~.mesh` — mesh construction and sharding helpers
- :mod:`~.multicam` — camera-sharded inference with pmax grid stitch
- :mod:`~.tp` — channel-sharded (tensor-parallel) training and serving
- :mod:`~.spatial` — row-sharded single-frame inference (GSPMD spatial
  partitioning with XLA halo exchanges) for single-frame latency
"""

from .mesh import (Mesh, NamedSharding, P, data_sharding, make_mesh,
                   replicate, replicated, shard_batch)
from .multicam import ShardedMultiCameraPipeline
from .spatial import shard_batch_spatial, shard_engine_spatial
from .tp import shard_engine_tp, shard_params_tp, tp_spec_for

__all__ = [
    "Mesh", "NamedSharding", "P", "data_sharding", "make_mesh",
    "replicate", "replicated", "shard_batch", "ShardedMultiCameraPipeline",
    "shard_batch_spatial", "shard_engine_spatial", "shard_engine_tp",
    "shard_params_tp", "tp_spec_for",
]
