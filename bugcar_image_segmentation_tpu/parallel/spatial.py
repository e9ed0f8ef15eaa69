"""Spatial partitioning: one frame's rows sharded across the mesh.

The reference is strictly single-device (SURVEY.md §2c) and its latency
floor is one GPU's forward pass.  Data/camera parallelism (mesh.py,
multicam.py) scales THROUGHPUT but not single-frame LATENCY — for that,
TPU pods use GSPMD *spatial partitioning*: shard the activation's height
axis across chips and let XLA insert the halo exchanges every
overlapping conv window needs at shard boundaries (the original GSPMD
use case for high-resolution segmentation nets).

Expressed the repo's standard way — shardings only, no hand-written
collectives: parameters replicate, and one ``with_sharding_constraint``
pins the backbone input NHWC activation to ``P(None, axis, None, None)``.
GSPMD propagates the row sharding through every conv/BN/argmax stage and
materializes ppermute halo exchanges on the ICI at each 3x3/5x5 window.
Downstream consumers that address rows globally (the BEV warp's packed
gather, grid.py) trigger an all-gather of the final uint8 label map —
~128 KB at 512x256, negligible next to the activations that stayed
sharded.

Scope: every SERVING backbone in the zoo (the frozen ``enet_fused``
executor is refused — a pallas_call with no SPMD rule and no layout
twin).  The conv nets (enet / deeplab /
xception / unet) partition as-is.  SegFormer needs a layout switch
first: its single-chip serving path runs the Pallas attention kernel in
the transposed (C, pixels) orientation, and pallas_call has no SPMD
partitioning rule, so GSPMD cannot split it — under a spatial mesh the
engine is rebuilt with ``SegFormer(xla_attention=True)`` (stock NHWC
layout + the XLA einsum attention; same parameter tree), where the row
sharding propagates end to end: Q stays token-sharded, the SR-reduced
K/V (<=4k tokens) all-gather per shard, and the conv/resize stages get
halo exchanges like the conv nets.

Single-chip hardware note: this module is validated for label parity on
the 8-device virtual CPU mesh (tests/test_parallel.py) and compiled in
the driver's multi-chip dry run; real-ICI latency numbers need a real
multi-chip slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_engine_spatial(engine, mesh: Mesh, axis: str = "space"):
    """Serve an :class:`~..models.api.Engine` spatially partitioned.

    Replicates the weights over ``mesh`` and wraps the engine's
    ``apply_fn`` so the preprocessed NHWC input is constrained to
    ``P(None, axis, None, None)`` — rows sharded, batch/width/channels
    intact.  The engine's serving programs are rebuilt (the executor
    changed, so the cached traces must not survive —
    ``Engine._build_programs``); pipelines constructed AFTER this call
    inherit the constraint inside their fused frame→grid programs.

    Divisibility contract: the input height must divide
    ``mesh.shape[axis]``, and for SegFormer every STAGE's row count
    must too (``input_height/32 % size == 0``).  GSPMD can pad uneven
    shards, but that padding is not observationally safe — the padded
    rows provably leak through the attention all-gather when the
    exported artifact is replayed (measured 0.30 logits error;
    PERF.md round 4f) — so lopsided partitions are refused outright
    rather than served.

    Packing is disabled first: flat-buffer packing exists to cut
    per-argument marshaling on a remote single chip, while spatial
    serving is a co-located multi-chip regime (same reasoning as
    :func:`~.tp.shard_engine_tp`).

    Returns the engine (mutated in place).  Parity: identical labels to
    the unsharded engine for halo-local backbones; DeepLab's ASPP image
    pooling reduces over the sharded axis, where the reduction-order
    change can flip float ties (budgeted in tests/test_parallel.py).
    """
    size = mesh.shape[axis]
    if engine.cfg.input_height % size:
        raise ValueError(
            f"input height {engine.cfg.input_height} does not divide the "
            f"'{axis}' mesh axis ({size}); pick a mesh the rows split "
            f"evenly over")
    from ..models.enet_fused import FusedENetApply
    if isinstance(engine.apply_fn, FusedENetApply):
        # Like SegFormer's Pallas attention, the fused-bottleneck
        # executor is a pallas_call with no SPMD partitioning rule —
        # but enet_fused has no layout twin to swap to (and is FROZEN
        # as a non-serving alternative anyway, PERF.md round 4c), so
        # refuse instead of silently serving unsharded.
        raise ValueError(
            "enet_fused cannot be spatially partitioned (pallas_call "
            "has no SPMD rule); use the stock 'enet' engine")
    if getattr(engine.module, "fused_sepconv", False):
        # Same reasoning for the frozen Xception "_fs" variant: its
        # banded sepconv pallas_calls have no SPMD rule; the stock
        # xception engine spatial-serves identically (same tree).
        raise ValueError(
            "fused-sepconv (_fs) engines cannot be spatially "
            "partitioned; use the stock engine (identical weights)")
    from ..models.segformer import SegFormer
    is_segformer = isinstance(engine.module, SegFormer)
    if is_segformer and (engine.cfg.input_height // 32) % size:
        # Every stage's row count must divide the mesh, down to the
        # deepest (h/32).  Uneven shards make GSPMD pad, and the padded
        # garbage provably leaks through the attention all-gather in
        # the EXPORTED replay of this program (measured: 0.30 logits
        # error at stage3_rows=2 over 4 shards, exact at even splits —
        # PERF.md round 4f); live serving happened to tolerate it, but
        # one contract for both paths is the only safe rule.
        raise ValueError(
            f"SegFormer spatial partitioning needs the deepest stage's "
            f"rows (input_height/32 = {engine.cfg.input_height // 32}) "
            f"to divide the '{axis}' mesh axis ({size})")

    engine.pack_weights(False)
    rep = NamedSharding(mesh, P())

    def place(tree):
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, rep), tree)

    engine.weights_placer = place
    engine.variables = place(engine.variables)

    rows = NamedSharding(mesh, P(None, axis, None, None))
    inner = engine.apply_fn

    # SegFormer: swap in the SPMD-partitionable layout twin (stock NHWC
    # + XLA attention — see the module docstring).  clone() keeps every
    # other field (preset widths/depths, quant, head_upsample), and the
    # parameter tree is identical, so engine.variables serve unchanged.
    if is_segformer:
        # head_cascade is a transposed-head-only optimization; the
        # stock NHWC layout this twin forces has no folded part-sum to
        # cascade, so drop it EXPLICITLY (the model raises on an
        # unreachable flag rather than silently no-op'ing).  Spatial
        # serving therefore always runs the exact textbook head — the
        # stricter numerics of the two.
        inner = engine.module.clone(xla_attention=True,
                                    head_cascade=False).apply

    def spatial_apply(variables, x, **kwargs):
        x = jax.lax.with_sharding_constraint(x, rows)
        return inner(variables, x, **kwargs)

    engine.apply_fn = spatial_apply
    engine._build_programs()
    return engine


def shard_batch_spatial(batch, mesh: Mesh, axis: str = "space",
                        data_axis: str = "data"):
    """Place a training batch with ROWS sharded for spatial training.

    Every leaf of ``batch`` (images ``(N, H, W, C)``, labels
    ``(N, H, W)``) gets its height axis 1 sharded over ``axis`` — and,
    when the mesh also has ``data_axis``, its batch axis 0 over that —
    so the train step (training/trainer.py, jit/pjit-agnostic by
    design) runs with activations split row-wise: per-chip activation
    HBM scales as 1/shards, which is what lets a resolution that spills
    on one chip train on a slice.  GSPMD derives the conv halo
    exchanges for BOTH the forward and the backward (grad-of-conv is a
    conv), and the parameter gradients pick up a reduce over the space
    axis because every row shard contributes to every (replicated)
    kernel.  No trainer changes, no hand-written collectives — the same
    recipe as data parallelism, one axis deeper.
    """
    has_data = data_axis in mesh.axis_names

    def place(x):
        if np.ndim(x) < 2:
            raise ValueError(
                f"spatial batch leaves need a (N, H, ...) rank-2+ shape, "
                f"got {np.shape(x)}")
        spec = [None] * np.ndim(x)
        if has_data:
            spec[0] = data_axis
        spec[1] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, batch)


__all__ = ["shard_engine_spatial", "shard_batch_spatial"]
