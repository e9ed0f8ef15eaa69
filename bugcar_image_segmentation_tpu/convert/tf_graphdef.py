"""Frozen TF1 GraphDef (.pb) → Flax parameter trees.

The reference ships its models as const-folded TF1 GraphDefs —
``enet.pb`` / ``deeplab.pb`` loaded via ``tf.import_graph_def`` into a
session (reference models.py:21-31, 105-113).  This module is the
deploy-format bridge in the opposite direction: it walks a frozen
GraphDef, extracts every constant, pattern-matches the parameter-carrying
ops (Conv2D / Conv2DBackpropInput / DepthwiseConv2dNative / MatMul /
BiasAdd / FusedBatchNorm / Prelu) in *graph execution order*, and pours
the weights into a Flax module in *parameter creation order*.

Why order-based, not name-based: the reference graphs use nonstandard
export names (output tensor ``CATkrIDy/concat:0``, reference
models.py:16), so graph names carry no structure.  Execution order of a
frozen sequential graph and Flax's parameter-creation order during
``init`` both follow the network's dataflow, so zipping the two — with a
shape check on every single assignment — is the robust mapping.  Flax's
creation order is captured with an init-time interceptor
(:func:`param_creation_order`); it must be, because JAX's tree utilities
re-sort dict keys alphabetically, destroying definition order.

TensorFlow is imported lazily and only here: it is offline tooling, never
on the inference path.  (The reference's actual blobs are absent from the
snapshot — ``.MISSING_LARGE_BLOBS:1-3`` — so tests freeze small stand-in
graphs with today's TF and round-trip them through this converter.)
"""

from __future__ import annotations

import collections
import contextlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _tf():
    import tensorflow as tf  # deferred: offline tooling only
    return tf


# ---------------------------------------------------------------------------
# GraphDef parsing
# ---------------------------------------------------------------------------


def load_graphdef(pb_path: str):
    """Parse a frozen ``.pb`` file into a GraphDef proto."""
    tf = _tf()
    graph_def = tf.compat.v1.GraphDef()
    with open(pb_path, "rb") as f:
        graph_def.ParseFromString(f.read())
    return graph_def


def extract_constants(graph_def) -> Dict[str, np.ndarray]:
    """All Const node values, name → ndarray."""
    tf = _tf()
    return {node.name: tf.make_ndarray(node.attr["value"].tensor)
            for node in graph_def.node if node.op == "Const"}


class OpExtract(collections.namedtuple("OpExtract",
                                       ["kind", "name", "arrays"])):
    """One parameter-carrying op found in the graph.

    kind ∈ {conv, conv_transpose, depthwise, dense, bias, batchnorm, prelu};
    arrays: kind-dependent numpy weights in TF-native layout.
    """


def extract_ops(graph_def) -> List[OpExtract]:
    """Parameter-carrying ops in graph (execution) order.

    Frozen graphs list nodes in a valid execution order; each compute op is
    paired with the Const feeding its weight input, resolving through
    Identity/ReadVariableOp/Cast indirections.
    """
    consts = extract_constants(graph_def)
    by_name = {n.name: n for n in graph_def.node}

    def resolve_const(name: str) -> Optional[np.ndarray]:
        name = name.split(":")[0].lstrip("^")
        seen = set()
        while name in by_name and name not in seen:
            seen.add(name)
            node = by_name[name]
            if node.op == "Const":
                return consts[node.name]
            if node.op in ("Identity", "ReadVariableOp", "Enter", "Cast"):
                name = node.input[0].split(":")[0]
                continue
            return None
        return None

    ops: List[OpExtract] = []
    for node in graph_def.node:
        if node.op == "Conv2D":
            w = resolve_const(node.input[1])
            if w is not None:
                ops.append(OpExtract("conv", node.name, {"kernel": w}))
        elif node.op == "DepthwiseConv2dNative":
            w = resolve_const(node.input[1])
            if w is not None:
                ops.append(OpExtract("depthwise", node.name, {"kernel": w}))
        elif node.op == "Conv2DBackpropInput":  # transposed conv
            w = resolve_const(node.input[1])
            if w is not None:
                ops.append(OpExtract("conv_transpose", node.name,
                                     {"kernel": w}))
        elif node.op == "MatMul":
            w = resolve_const(node.input[1])
            if w is not None:
                ops.append(OpExtract("dense", node.name, {"kernel": w}))
        elif node.op in ("BiasAdd", "AddV2", "Add"):
            b = resolve_const(node.input[1])
            if b is not None and b.ndim <= 1:
                ops.append(OpExtract("bias", node.name, {"bias": b}))
        elif node.op in ("FusedBatchNorm", "FusedBatchNormV2",
                         "FusedBatchNormV3"):
            arrays = {}
            for key, inp in zip(("scale", "offset", "mean", "variance"),
                                node.input[1:5]):
                val = resolve_const(inp)
                if val is None:
                    arrays = None
                    break
                arrays[key] = val
            if arrays is not None:
                arrays["epsilon"] = np.float32(
                    node.attr["epsilon"].f if "epsilon" in node.attr
                    else 1e-3)
                ops.append(OpExtract("batchnorm", node.name, arrays))
        elif node.op == "Prelu":
            a = resolve_const(node.input[1])
            if a is not None:
                ops.append(OpExtract("prelu", node.name, {"alpha": a}))
    return ops


# ---------------------------------------------------------------------------
# Flax parameter creation order
# ---------------------------------------------------------------------------


LeafRef = Tuple[str, Tuple[str, ...]]  # (collection, path within collection)


@contextlib.contextmanager
def _record_creations(order: List[LeafRef]):
    import flax.linen as nn

    orig_param = nn.Module.param
    orig_variable = nn.Module.variable

    def param(self, name, *args, **kwargs):
        order.append(("params", tuple(self.scope.path) + (name,)))
        return orig_param(self, name, *args, **kwargs)

    def variable(self, col, name, *args, **kwargs):
        if col != "params":
            order.append((col, tuple(self.scope.path) + (name,)))
        return orig_variable(self, col, name, *args, **kwargs)

    nn.Module.param = param
    nn.Module.variable = variable
    try:
        yield
    finally:
        nn.Module.param = orig_param
        nn.Module.variable = orig_variable


def param_creation_order(module, example_input,
                         ) -> Tuple[dict, List[LeafRef]]:
    """Init ``module`` and record the order its variables were created in.

    Returns (variables, ordered leaf refs).  Creation order follows the
    module's dataflow — the same order a frozen graph executes in.
    """
    import jax

    order: List[LeafRef] = []
    with _record_creations(order):
        variables = module.init(jax.random.PRNGKey(0), example_input,
                                train=False)
    # De-duplicate (a variable may be touched twice during init).
    seen = set()
    unique = []
    for ref in order:
        if ref not in seen:
            seen.add(ref)
            unique.append(ref)
    return variables, unique


# ---------------------------------------------------------------------------
# Weight layout conversion
# ---------------------------------------------------------------------------


def convert_conv_kernel(w: np.ndarray) -> np.ndarray:
    """TF Conv2D kernels are HWIO — exactly Flax's layout."""
    return np.asarray(w)


def convert_deconv_kernel(w: np.ndarray) -> np.ndarray:
    """TF Conv2DBackpropInput (H, W, out, in) → Flax ConvTranspose
    (H, W, in, out).

    TF's deconv is the gradient of a correlation (spatially mirrored
    taps); Flax's ``nn.ConvTranspose`` is a fractionally-strided
    correlation — so the conversion both mirrors the spatial axes and
    swaps in/out (verified numerically in tests/test_convert.py).
    """
    return np.asarray(w)[::-1, ::-1].transpose(0, 1, 3, 2)


def convert_depthwise_kernel(w: np.ndarray) -> np.ndarray:
    """TF depthwise (H, W, C, mult) → Flax grouped-conv (H, W, 1, C*mult)."""
    h, ww, c, m = w.shape
    return np.asarray(w).reshape(h, ww, 1, c * m)


def fold_batchnorm(scale, offset, mean, variance, epsilon):
    """Inference-mode BN folded to (multiplier, shift): y = x*mult + shift."""
    inv = scale / np.sqrt(variance + epsilon)
    return inv.astype(np.float32), (offset - mean * inv).astype(np.float32)


# ---------------------------------------------------------------------------
# Pouring
# ---------------------------------------------------------------------------


def _get(tree: dict, path: Sequence[str]):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree: dict, path: Sequence[str], value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def pour_into_module(module, example_input,
                     ops: Sequence[OpExtract]) -> dict:
    """Zip graph-order ops onto creation-order Flax leaves.

    Every assignment is shape-checked; a mismatch raises naming both the
    graph op and the Flax path, so layer-map bugs surface immediately
    instead of silently permuting classes (SURVEY.md §7 hard parts).

    Returns a fresh variable dict with the graph's weights.
    """
    import jax

    variables, order = param_creation_order(module, example_input)
    out = jax.tree_util.tree_map(np.asarray, variables)

    queues: Dict[str, collections.deque] = collections.defaultdict(
        collections.deque)
    for op in ops:
        queues[op.kind].append(op)

    def take(kind: str, flax_path) -> OpExtract:
        if not queues[kind]:
            raise ValueError(
                f"graph has no more {kind!r} weights for Flax leaf "
                f"{'/'.join(flax_path)}")
        return queues[kind].popleft()

    def assign(col, path, value, op_name):
        leaf = _get(out[col], path)
        value = np.asarray(value)
        if value.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch pouring graph op {op_name!r} into "
                f"{col}/{'/'.join(path)}: graph {value.shape} vs model "
                f"{np.shape(leaf)}")
        _set(out[col], path, value.astype(np.asarray(leaf).dtype))

    # BN modules contribute 4 leaves across two collections; remember the
    # extracted arrays per module path.
    bn_arrays: Dict[Tuple[str, ...], dict] = {}

    def module_siblings(col, path):
        return set(_get(out[col], path[:-1]).keys())

    for col, path in order:
        leaf_name = path[-1]
        mod_path = path[:-1]
        sibs = module_siblings(col, path)

        is_bn = ("scale" in sibs) or mod_path in bn_arrays
        if col == "batch_stats" or (col == "params" and is_bn
                                    and leaf_name in ("scale", "bias")):
            if mod_path not in bn_arrays:
                op = take("batchnorm", path)
                bn_arrays[mod_path] = dict(op.arrays, _name=op.name)
            arrays = bn_arrays[mod_path]
            tf_key = {"scale": "scale", "bias": "offset",
                      "mean": "mean", "var": "variance"}[leaf_name]
            assign(col, path, arrays[tf_key], arrays["_name"])
            continue

        if leaf_name == "kernel":
            leaf = _get(out[col], path)
            if queues["depthwise"] and np.shape(leaf)[2] == 1:
                op = take("depthwise", path)
                assign(col, path, convert_depthwise_kernel(
                    op.arrays["kernel"]), op.name)
            elif np.ndim(leaf) == 2:
                op = take("dense", path)
                assign(col, path, op.arrays["kernel"], op.name)
            else:
                # A conv leaf matches whichever conv-family op comes next
                # in graph order (plain vs transposed).
                next_plain = queues["conv"][0] if queues["conv"] else None
                next_tr = (queues["conv_transpose"][0]
                           if queues["conv_transpose"] else None)

                def fits(op, convert):
                    return (op is not None and
                            convert(op.arrays["kernel"]).shape
                            == np.shape(leaf))

                if fits(next_plain, convert_conv_kernel):
                    op = take("conv", path)
                    assign(col, path, convert_conv_kernel(
                        op.arrays["kernel"]), op.name)
                elif fits(next_tr, convert_deconv_kernel):
                    op = take("conv_transpose", path)
                    assign(col, path, convert_deconv_kernel(
                        op.arrays["kernel"]), op.name)
                else:
                    raise ValueError(
                        f"no conv-family graph op matches Flax leaf "
                        f"{'/'.join(path)} of shape {np.shape(leaf)}")
        elif leaf_name == "bias":
            op = take("bias", path)
            assign(col, path, op.arrays["bias"], op.name)
        elif leaf_name == "alpha":
            op = take("prelu", path)
            assign(col, path, np.asarray(op.arrays["alpha"]).reshape(-1),
                   op.name)
        # Other leaves (embeddings, layernorm, …) are left as initialized;
        # extend the kind table when a graph needs them.

    return out


def convert_frozen_graph(pb_path: str, module, example_input) -> dict:
    """One-call conversion: ``.pb`` + Flax module → loaded variables.

    Workflow for the reference's models (once blobs are available):

        eng = build_engine("enet")
        variables = convert_frozen_graph("enet.pb", eng.module,
                                         jnp.zeros((1, 256, 512, 3)))
        eng.load_variables(variables)
    """
    return pour_into_module(module, example_input,
                            extract_ops(load_graphdef(pb_path)))


__all__ = [
    "load_graphdef", "extract_constants", "extract_ops", "OpExtract",
    "param_creation_order", "fold_batchnorm",
    "convert_conv_kernel", "convert_deconv_kernel",
    "convert_depthwise_kernel", "pour_into_module", "convert_frozen_graph",
]
