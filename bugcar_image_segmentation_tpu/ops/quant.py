"""W8A8 dynamic int8 matmul path for the MXU.

The reference has no quantization story (its frozen graphs are f32,
reference models.py:42-69); this is a TPU-native capability addition for
the matmul-bound SegFormer configuration (BASELINE config 5).  PERF.md's
round-2 A/B showed ENet's forward is NOT conv-arithmetic-bound (int8 would
save ~0.02 ms of 1.03 ms there), so int8 targets the transformer, where
Dense projections dominate: v5e's MXU runs int8 at 2x bf16 throughput.

Scheme (standard symmetric W8A8, "dynamic" = activation scales computed
per call, no calibration set needed):

- weights: per-output-channel symmetric scale ``max|w[:, j]| / 127``,
  quantized INSIDE the jitted program from the float32 params.  This keeps
  the parameter tree bit-identical to the float model, so converters,
  checkpoints, and trained weights pour in unchanged and quantization is a
  pure runtime flag.  The per-call quantize cost is one elementwise pass
  over the weights — noise next to a 65k-token matmul (and XLA dedups it
  across the three QKV uses of the same activation scale).
- activations: per-token (row) symmetric scale ``max|x[i, :]| / 127``.
- product accumulates in int32 on the MXU
  (``preferred_element_type=jnp.int32``), rescaled to f32 by the outer
  product of the two scale vectors.

``Int8Dense`` is a drop-in for ``flax.linen.Dense`` (same param names and
shapes); error vs the bf16 path is ~1% relative — tests/test_quant.py pins
both the numerics and the tree compatibility.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_weight_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a (in, out) kernel.

    Returns ``(w_q int8 (in, out), scale f32 (out,))`` with
    ``w ≈ w_q * scale``.
    """
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activation_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row (token) int8 quantization of (..., k) activations.

    Returns ``(x_q int8, scale f32 (..., 1))`` with ``x ≈ x_q * scale``.
    """
    x = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    x_q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x @ w`` through the int8 MXU with dynamic W8A8 quantization.

    ``x``: (..., k) float; ``w``: (k, n) float.  Returns (..., n) float32.
    """
    x_q, x_s = quantize_activation_int8(x)
    w_q, w_s = quantize_weight_int8(w)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * x_s * w_s


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` running its matmul on the int8 MXU — when the
    shape can actually win.

    Parameter tree (names, shapes, dtypes) is identical to
    ``nn.Dense(features)`` — float32 ``kernel``/``bias`` — so float
    checkpoints and converted weights load unchanged; int8 is purely a
    compute-path choice.  ``dtype`` sets the OUTPUT dtype (matching how the
    float model's bf16 Dense feeds the next op).

    Shape gate (``min_k``/``min_n``): dynamic quantization is an extra
    VPU/HBM pass over the activations, so it only pays when the matmul is
    MXU-bound.  Measured on the bench v5e (PERF.md round 2): at
    (M,K,N)=(4096,1024,1024) dynamic W8A8 is 1.72x FASTER than bf16
    (0.030 vs 0.051 ms, 288 Top/s), while SegFormer-B0's small-K layers
    (K=32..256, 65k tokens) made the whole model 2.5x SLOWER.  Below the
    thresholds this module silently computes in float — same params, same
    answer class — so a quantized model never regresses its small layers.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    min_k: int = 512
    min_n: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32)
        if x.shape[-1] >= self.min_k and self.features >= self.min_n:
            y = int8_matmul(x, kernel)
        else:  # quantize pass would cost more than the MXU saves
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


__all__ = ["Int8Dense", "int8_matmul", "quantize_weight_int8",
           "quantize_activation_int8"]
