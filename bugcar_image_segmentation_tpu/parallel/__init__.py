"""Multi-chip scaling: meshes, shardings, and sharded pipelines.

The reference has no distributed axis at all (SURVEY.md §2c); here
parallelism is expressed the JAX way — named meshes + sharding
annotations, XLA inserting the ICI collectives:

- :mod:`~.mesh` — mesh construction and sharding helpers
- :mod:`~.multicam` — camera-sharded inference with pmax grid stitch
"""

from .mesh import (Mesh, NamedSharding, P, data_sharding, make_mesh,
                   replicate, replicated, shard_batch)
from .multicam import ShardedMultiCameraPipeline
from .tp import shard_engine_tp, shard_params_tp, tp_spec_for

__all__ = [
    "Mesh", "NamedSharding", "P", "data_sharding", "make_mesh",
    "replicate", "replicated", "shard_batch", "ShardedMultiCameraPipeline",
    "shard_engine_tp", "shard_params_tp", "tp_spec_for",
]
