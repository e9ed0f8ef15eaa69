"""Transposed (C, pixels) building blocks for transformer stages.

PERF.md round 2b established the layout doctrine on ENet: few-channel
ops want the TRANSPOSED orientation — channels on the 8-deep sublane
dim, pixels on the 128-wide lane dim — because a (C_out, C_in) x
(C_in, M) matmul with a huge M streams the MXU at full width while the
NHWC form leaves 96 of 128 lanes idle at C=32.  SegFormer's stage 1-2
(models/segformer.py, BASELINE config 5) has exactly that disease: 65k
tokens at C=32/64, f32 LayerNorms and Dense projections all running at
25-50% lane occupancy (the measured 1.36 ms/block of PERF.md's round-3
roadmap).

These modules re-express SegFormer's per-block ops over a transposed
``(C, N*H*W)`` activation with the IDENTICAL parameter tree as their
stock Flax counterparts (``nn.LayerNorm``, ``nn.Dense``, the depthwise
and strided ``nn.Conv``) — checkpoints, converters and the training
path (which keeps the NHWC layout) are unaffected; the layout is purely
an inference compute-path choice, exactly like the ENet Chw* family
(models/enet.py).

The reference has no transformer at all (SURVEY.md §2c) — this file
serves the BASELINE config-5 capability the TPU way.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quant import quantize_weight_int8


class ChwLayerNorm(nn.Module):
    """``nn.LayerNorm`` over a transposed (C, M) activation.

    The normalized axis (channels) sits on SUBLANES, so the mean/var
    reductions are cheap cross-sublane ops with all 128 lanes busy —
    versus the stock orientation's cross-lane reductions at C/128
    occupancy.  Params ``scale``/``bias`` (C,) f32, epsilon matching
    ``nn.LayerNorm``'s default; statistics in f32 like the NHWC path.
    """

    features: int
    epsilon: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=0, keepdims=True)            # (1, M)
        var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale[:, None] + bias[:, None]
        return y.astype(self.dtype)


class ChwDense(nn.Module):
    """``nn.Dense`` over a transposed (Cin, M) activation:
    ``y = Wᵀ x + b``.  Param tree identical (``kernel`` (Cin, Cout),
    ``bias`` (Cout,), f32).

    ``quant=True`` runs the matmul on the int8 MXU with the same
    dynamic symmetric W8A8 scheme as :class:`~..ops.quant.Int8Dense`
    (per-output-channel weight scales; per-token activation scales —
    tokens are COLUMNS here, so the activation amax reduces over
    sublanes), behind the same ``min_k``/``min_n`` shape gate.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    quant: bool = False
    min_k: int = 512
    min_n: int = 512

    @nn.compact
    def __call__(self, x: jax.Array,
                 fold: Optional[jax.Array] = None) -> jax.Array:
        """``fold``: optional (features, F2) f32 matrix COMPOSED into the
        layer in-program — ``y = (W @ fold)ᵀ x + (b @ fold)``.  Exactly a
        following bias-free linear layer fused at the weight level (two
        linears with no activation between commute with composition), so
        the big matmul runs once with the composed kernel instead of
        twice; the composition itself is a tiny (Cin, features) ×
        (features, F2) matmul per dispatch.  Param tree unchanged.
        SegFormer's decode head uses this to fold each stage's fuse
        slice into ``linear_c`` at SOURCE resolution (models/segformer.py).
        """
        cin = x.shape[0]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (cin, self.features), jnp.float32)
        features = self.features
        if fold is not None:
            kernel = kernel @ fold            # f32 composition
            features = fold.shape[1]
        dt = jnp.dtype(self.dtype)
        if self.quant and cin >= self.min_k and features >= self.min_n:
            xf = x.astype(jnp.float32)
            x_s = jnp.max(jnp.abs(xf), axis=0, keepdims=True) / 127.0
            x_s = jnp.maximum(x_s, 1e-12)                     # (1, M)
            x_q = jnp.clip(jnp.round(xf / x_s), -127, 127).astype(jnp.int8)
            w_q, w_s = quantize_weight_int8(kernel)           # (cin, co)
            acc = jax.lax.dot_general(
                w_q, x_q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)             # (co, M)
            y = acc.astype(jnp.float32) * w_s[:, None] * x_s
        else:
            y = jax.lax.dot_general(
                kernel.astype(dt), x.astype(dt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (co, M)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            if fold is not None:
                bias = bias @ fold
            y = y + bias[:, None]
        return y.astype(dt)


class ChwConv1x1(nn.Module):
    """``nn.Conv(features, (1, 1))`` over transposed activations, with
    the conv's param tree (``kernel`` (1, 1, Cin, Cout), ``bias``).

    Accepts either one (Cin, M) array or a LIST of (C_k, M) parts whose
    channel counts sum to Cin — the parts case computes
    ``W @ concat(parts)`` as a sum of per-part matmuls WITHOUT
    materializing the concatenation (SegFormer's decode-head fuse over
    4 × decoder_dim channels is a 128 MB concat at 1024² otherwise).

    ``x=None`` (requires ``in_features``) creates/reads the params but
    returns the raw (Cin, Cout) f32 kernel instead of computing —
    callers that fold this layer into an upstream one
    (:meth:`ChwDense.__call__` ``fold``) read the weights here so the
    variable tree keeps the exact conv layout."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    in_features: Optional[int] = None

    @nn.compact
    def __call__(self, x) -> jax.Array:
        if x is None:
            if self.in_features is None:
                raise ValueError("x=None (param-only mode) requires "
                                 "in_features")
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (1, 1, self.in_features, self.features),
                                jnp.float32)
            if self.use_bias:        # keep the tree identical either way
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                return kernel[0, 0], bias
            return kernel[0, 0]
        parts = x if isinstance(x, (list, tuple)) else [x]
        cin = sum(int(p.shape[0]) for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        dt = jnp.dtype(self.dtype)
        w = kernel[0, 0]                                  # (cin, co)
        off = 0
        y = None
        for p in parts:
            ck = int(p.shape[0])
            blk = jax.lax.dot_general(
                w[off:off + ck].astype(dt), p.astype(dt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (co, M)
            y = blk if y is None else y + blk
            off += ck
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias[:, None]
        return y.astype(dt)


class ChwDepthwise3x3(nn.Module):
    """``nn.Conv(C, (3,3), padding='SAME', feature_group_count=C)`` over
    a transposed (C, N*H*W) activation: nine static spatial shifts, each
    scaled by its per-channel tap weight — pure VPU work at full lane
    occupancy (the lane dim carries W).  Param tree identical to the
    stock depthwise conv (``kernel`` (3, 3, 1, C), ``bias`` (C,))."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array,
                 nhw: Tuple[int, int, int]) -> jax.Array:
        c = self.features
        n, h, w = nhw
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, c), jnp.float32)
        dt = jnp.dtype(self.dtype)
        x4 = x.astype(dt).reshape(c, n, h, w)
        xp = jnp.pad(x4, ((0, 0), (0, 0), (1, 1), (1, 1)))
        wk = kernel[:, :, 0, :].astype(dt)                    # (3, 3, C)
        y = None
        for a in range(3):
            for b in range(3):
                tap = xp[:, :, a:a + h, b:b + w] * wk[a, b][:, None, None,
                                                            None]
                y = tap if y is None else y + tap
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (c,), jnp.float32)
            y = y + bias.astype(dt)[:, None, None, None]
        return y.reshape(c, n * h * w)


class ChwSrConv(nn.Module):
    """SegFormer's spatial-reduction conv — ``nn.Conv(dim, (r, r),
    strides=(r, r))`` — over a transposed (C, N*H*W) activation: an r×r
    space-to-depth performed by pure reshapes/transposes of the CHW
    tensor, then ONE dense matmul contracting all r²·C phase channels.
    Param tree identical to the stock conv (``kernel`` (r, r, C, dim),
    ``bias`` (dim,)).  H, W divisible by r ⇒ SAME adds no padding."""

    features: int
    ratio: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array,
                 nhw: Tuple[int, int, int]) -> jax.Array:
        n, h, w = nhw
        r = self.ratio
        c = x.shape[0]
        if h % r or w % r:
            raise ValueError(f"ChwSrConv needs H, W divisible by {r}; "
                             f"got {(h, w)}")
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (r, r, c, self.features), jnp.float32)
        dt = jnp.dtype(self.dtype)
        x6 = x.reshape(c, n, h // r, r, w // r, r)
        # (a, b, ci) phase order matches kernel.reshape(r*r*c, dim).
        xp = x6.transpose(3, 5, 0, 1, 2, 4).reshape(
            r * r * c, n * (h // r) * (w // r))
        wt = kernel.reshape(r * r * c, self.features).T       # (dim, r²c)
        y = jax.lax.dot(wt.astype(dt), xp.astype(dt),
                        preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias[:, None]
        return y.astype(dt)


__all__ = ["ChwLayerNorm", "ChwDense", "ChwConv1x1", "ChwDepthwise3x3",
           "ChwSrConv"]
