"""Serving-weight packing: one flat device buffer per dtype.

Every PJRT execute names each argument buffer individually; through the
remote-TPU transport this costs ~3 µs PER ARGUMENT PER DISPATCH
(measured round 3f: a trivial program taking ENet's 508 leaves spends
1.63 ms/dispatch on marshaling alone vs 0.04 ms with one packed
buffer).  The reference never pays this — its TF1 ``Session.run``
serves a frozen graph whose weights are constants (reference
models.py:30-40); this module gets the same per-dispatch economics
without baking weights into the executable (weight swaps stay free,
CLAUDE.md invariant: weights are runtime arguments).

:func:`pack_tree` flattens a variable tree into one 1-D buffer per
dtype; :func:`unpack_tree` rebuilds the exact tree inside the jitted
program from static slices + reshapes.  Same values, same compute ops
— bit-identical outputs.  Device-side cost is at most one weight-sized
copy where a slice cannot fuse into its consumer (~0.13 ms per 100 MB
at v5e HBM bandwidth).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PackSpec(NamedTuple):
    """Static recipe to rebuild a tree from the packed payload.

    ``entries`` runs in tree-flatten order: (payload key, offset, size,
    shape) per leaf.  ``offset >= 0``: the leaf is a slice of the flat
    dtype buffer ``payload[key]``; ``offset == -1``: the leaf rides as
    its own payload entry (large kernels — slicing those out of a flat
    buffer forces a per-dispatch relayout back to the tiled weight
    layout, measured +2.5 ms on the 220 MB Xception twin, so big
    leaves stay individual arguments).  Hashable/comparable so jitted
    programs can close over it.
    """

    treedef: Any
    entries: Tuple[Tuple[str, int, int, Tuple[int, ...]], ...]


def pack_tree(tree: Any,
              max_leaf_bytes: int = 1 << 20,
              ) -> Tuple[Dict[str, jax.Array], PackSpec]:
    """Flatten ``tree`` into {dtype-name: 1-D buffer} (+ big leaves
    passed through untouched) and a PackSpec.

    Leaves over ``max_leaf_bytes`` are NOT packed: the marshaling cost
    this module removes scales with argument COUNT (dominated by the
    hundreds of small BN/bias/scale tensors), while the device-side
    unpack cost scales with BYTES (a sliced-out conv kernel must be
    re-laid-out every dispatch).  The hybrid keeps both small.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    offsets: Dict[str, int] = {}
    entries = []
    parts: Dict[str, list] = {}
    buffers: Dict[str, jax.Array] = {}
    for i, leaf in enumerate(leaves):
        leaf = jnp.asarray(leaf)
        if leaf.nbytes > max_leaf_bytes:
            key = f"_leaf{i}"
            entries.append((key, -1, int(leaf.size), tuple(leaf.shape)))
            buffers[key] = leaf
            continue
        key = str(leaf.dtype)
        off = offsets.get(key, 0)
        entries.append((key, off, int(leaf.size), tuple(leaf.shape)))
        offsets[key] = off + int(leaf.size)
        parts.setdefault(key, []).append(jnp.ravel(leaf))
    for k, v in parts.items():
        buffers[k] = jnp.concatenate(v) if len(v) > 1 else v[0]
    return buffers, PackSpec(treedef, tuple(entries))


def unpack_tree(buffers: Dict[str, jax.Array], spec: PackSpec) -> Any:
    """Rebuild the tree (inside or outside jit; static slices only)."""
    leaves = [
        buffers[key] if off < 0 else
        jax.lax.slice(buffers[key], (off,), (off + size,)).reshape(shape)
        for key, off, size, shape in spec.entries
    ]
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


__all__ = ["PackSpec", "pack_tree", "unpack_tree"]
