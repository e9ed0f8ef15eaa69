"""Fused-kernel inference executor for ENet.

Runs the EXACT parameter tree of :class:`models.enet.ENet` (so training,
checkpoints and the pb-converter are untouched) but executes the
stage-2/3 trunk — 16 regular/dilated/asymmetric bottlenecks at 1/8
resolution, where most of the forward time goes (PERF.md) — as one
Pallas kernel per bottleneck (ops/pallas/bottleneck.py) instead of 5–8
XLA ops each.  Stem, down/up-sampling bottlenecks (pool-index
bookkeeping), stages 1/4/5 (whose larger maps don't fit the fused
working set comfortably) and the classifier head reuse the Flax modules
unchanged, applied on their own subtrees.

Inference-only: BatchNorm is folded from the running statistics
(reference equivalence: the frozen ``enet.pb`` graphs fold BN the same
way).  Numerics differ from the Flax path only in accumulation order
(kernel keeps f32 between stages where the bf16 module rounds);
tests/test_enet_fused.py pins f32 parity and bf16 argmax agreement.

Use via ``build_engine("enet_fused")`` (models/api.py) — same Engine
API, same variable tree as ``"enet"``.

STATUS: FROZEN as a documented-slower alternative, now on a CURRENT
A/B (round 4, scripts/bench_enet_fused.py, whole-model serial-scan
slope on the v5e, weights as jit arguments): 0.669 ms vs the stock
engine's 0.571 (x0.85) — far from round 2b's isolated 11.3-vs-0.5
µs/block reading (that harness timed the kernels outside the
surrounding program, where XLA's cross-block fusion is exactly what
the comparison was missing), but still a loss, and w16 weight caching
widens it (0.758, x0.75).
NOT counted as a serving variant; kept because (a) it is the only
whole-block Pallas fusion in the tree (a template for future TPU
generations — re-run scripts/bench_enet_fused.py before trusting
either number on new hardware), and (b) its Mosaic compilation is
pinned by an on-chip test (tests/test_tpu.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.pallas.bottleneck import fold_bn, fused_bottleneck
from .enet import Bottleneck, InitialBlock
from .fastconv import FastConvTranspose2x


def _sub(variables: dict, name: str) -> dict:
    out = {"params": variables["params"][name]}
    stats = variables.get("batch_stats", {})
    if name in stats:
        out["batch_stats"] = stats[name]
    return out


def _cba(p: dict, s: dict, conv: str = "Conv_0"):
    """ConvBNAct subtree → (squeezed kernel, bn scale, bn bias, alpha?)."""
    kern = p[conv]["kernel"]
    scale, bias = fold_bn(p["BatchNorm_0"], s["BatchNorm_0"])
    alpha = p["PReLU_0"]["alpha"] if "PReLU_0" in p else None
    return kern, scale, bias, alpha


def _fused(variables: dict, name: str, x: jax.Array, kind: str,
           dilation: int, interpret: Optional[bool]) -> jax.Array:
    p = variables["params"][name]
    s = variables["batch_stats"][name]
    c = x.shape[-1]

    wp, s1, b1, a1 = _cba(p["proj"], s["proj"])
    mid = wp.shape[-1]
    wp = wp.reshape(c, mid)

    we, s3, b3, _ = _cba(p["expand"], s["expand"])
    we = we.reshape(mid, c)
    ao = p["out_act"]["alpha"]

    if kind == "asymmetric":
        w51 = p["conv_5x1"]["kernel"]                  # (5, 1, mid, mid)
        w15, s2, b2, a2 = _cba(p["conv_1x5"], s["conv_1x5"])
        wcore = (w51, w15)                             # (1, 5, mid, mid)
    else:
        wcore, s2, b2, a2 = _cba(p["conv"], s["conv"])  # (3, 3, mid, mid)

    return fused_bottleneck(
        x, wp, s1, b1, a1, wcore, s2, b2, a2, we, s3, b3, ao,
        kind=kind, dilation=dilation, interpret=interpret)


# The stage-2/3 trunk layout (models/enet.py:262-278): (suffix, kind,
# dilation) applied for stage prefixes b2_ and b3_.
_TRUNK = [
    ("1", "regular", 1), ("2", "dilated", 2), ("3", "asymmetric", 1),
    ("4", "dilated", 4), ("5", "regular", 1), ("6", "dilated", 8),
    ("7", "asymmetric", 1), ("8", "dilated", 16),
]


def enet_fused_apply(variables: dict, x: jax.Array, train: bool = False,
                     *, num_classes: int = 15, dtype: Any = jnp.bfloat16,
                     fast: bool = True,
                     interpret: Optional[bool] = None) -> jax.Array:
    """ENet forward, fused-trunk edition.  Signature-compatible with
    ``ENet().apply`` for inference (train must be False)."""
    if train:
        raise ValueError("enet_fused_apply is inference-only; use the "
                         "Flax ENet module for training")
    dt = jnp.dtype(dtype)
    x = x.astype(dt)

    x = InitialBlock(dtype=dt, fast=fast).apply(
        _sub(variables, "initial"), x, False)

    # Stage 1 (XLA path: 1/4-res maps are large for the fused scratch)
    x, idx1 = Bottleneck(64, "down", dropout_rate=0.01, dtype=dt).apply(
        _sub(variables, "b1_0"), x, False)
    for i in range(1, 5):
        x, _ = Bottleneck(64, "regular", dropout_rate=0.01, dtype=dt).apply(
            _sub(variables, f"b1_{i}"), x, False)

    # Stage 2+3 trunk: fused Pallas bottlenecks
    x, idx2 = Bottleneck(128, "down", dtype=dt).apply(
        _sub(variables, "b2_0"), x, False)
    for stage in (2, 3):
        for suffix, kind, dil in _TRUNK:
            x = _fused(variables, f"b{stage}_{suffix}", x, kind, dil,
                       interpret)

    # Decoder (XLA path: unpool bookkeeping + growing maps)
    x, _ = Bottleneck(64, "up", dtype=dt, fast=fast).apply(
        _sub(variables, "b4_0"), x, False, pool_idx=idx2)
    x, _ = Bottleneck(64, "regular", dtype=dt).apply(
        _sub(variables, "b4_1"), x, False)
    x, _ = Bottleneck(64, "regular", dtype=dt).apply(
        _sub(variables, "b4_2"), x, False)
    x, _ = Bottleneck(16, "up", dtype=dt, fast=fast).apply(
        _sub(variables, "b5_0"), x, False, pool_idx=idx1)
    x, _ = Bottleneck(16, "regular", dtype=dt).apply(
        _sub(variables, "b5_1"), x, False)

    if fast:
        x = FastConvTranspose2x(num_classes, kernel=3, use_bias=True,
                                dtype=dt).apply(
            {"params": variables["params"]["fullconv"]}, x)
    else:
        import flax.linen as nn
        x = nn.ConvTranspose(num_classes, (3, 3), strides=(2, 2),
                             padding="SAME", use_bias=True, dtype=dt,
                             param_dtype=jnp.float32).apply(
            {"params": variables["params"]["fullconv"]}, x)
    return x.astype(jnp.float32)


class FusedENetApply:
    """``module.apply``-shaped adapter so Engine can swap executors."""

    def __init__(self, num_classes: int, dtype: Any = jnp.bfloat16,
                 fast: bool = True):
        self.num_classes = num_classes
        self.dtype = dtype
        self.fast = fast

    def __call__(self, variables: dict, x: jax.Array,
                 train: bool = False) -> jax.Array:
        return enet_fused_apply(variables, x, train,
                                num_classes=self.num_classes,
                                dtype=self.dtype, fast=self.fast)


__all__ = ["enet_fused_apply", "FusedENetApply"]
