"""ENet semantic-segmentation backbone in Flax, NHWC / TPU-native.

Rebuilds the capability of the reference's frozen ``enet.pb`` TF1 graph
(reference models.py:14-95: 512x256 input, 15 classes, tensors
``input0:0`` → ``CATkrIDy/concat:0``) as a first-class JAX model.  The
architecture follows the ENet paper (Paszke et al., 2016) — initial block,
three bottleneck stages with dilated/asymmetric convolutions, max-unpooling
decoder — which is what the frozen graph encodes.

TPU-first design decisions (vs the reference's CUDA/NCHW graph):
- NHWC everywhere: channels ride the MXU lane dimension; weights are
  transposed once at conversion time instead of activations per frame.
- bfloat16 activations, float32 parameters and batchnorm statistics.
- Max-pool argmax indices are kept as a dense 2-bit (values 0..3) uint8
  tensor per downsample and consumed by the decoder's unpool as a one-hot
  multiply — a reshape + compare + multiply chain that XLA fuses, instead
  of the scatter cuDNN uses.
- BatchNorm is folded into inference as scale/bias (the converter folds
  frozen-graph FusedBatchNorm constants; training mode keeps running
  stats).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pooling
from .fastconv import (FastConvTranspose2x, FastDownConv2x, FastStemConv2x,
                       depth_to_space, space_to_depth)


# ---------------------------------------------------------------------------
# Pooling with indices (encoder) / unpooling (decoder)
# ---------------------------------------------------------------------------


def max_pool_with_indices(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2x2/stride-2 max pool returning (pooled, argmax-in-window).

    The window argmax is encoded as uint8 in {0,1,2,3} (row-major within
    the 2x2 window, first maximum wins — TF's ``max_pool_with_argmax`` tie
    rule).  Pure reshapes + reductions: no scatter/gather, static shapes.
    """
    n, h, w, c = x.shape
    patches = x.reshape(n, h // 2, 2, w // 2, 2, c)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // 2, w // 2, 4, c)
    idx = jnp.argmax(patches, axis=3).astype(jnp.uint8)
    pooled = jnp.max(patches, axis=3)
    return pooled, idx


def max_unpool_phase(pooled: jax.Array, idx: jax.Array) -> jax.Array:
    """:func:`max_unpool` in the packed PHASE layout: (N, H, W, 4C) with
    channel order (row-phase, col-phase, c) — i.e. the unpooled tensor
    before its depth-to-space, for callers that keep computing in the
    phase domain (the fast up-bottleneck path below)."""
    n, hh, ww, c = pooled.shape
    slots = jnp.arange(4, dtype=jnp.uint8).reshape(1, 1, 1, 4, 1)
    onehot = (idx[:, :, :, None, :] == slots)
    spread = jnp.where(onehot, pooled[:, :, :, None, :],
                       jnp.zeros((), pooled.dtype))
    return spread.reshape(n, hh, ww, 4 * c)


def max_unpool(pooled: jax.Array, idx: jax.Array) -> jax.Array:
    """Inverse of :func:`max_pool_with_indices`.

    Places each pooled value at its remembered window position, zeros
    elsewhere — expressed as a one-hot multiply so it lowers to VPU
    select/multiply instead of a scatter.
    """
    return depth_to_space(max_unpool_phase(pooled, idx))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


class PReLU(nn.Module):
    """Per-channel parametric ReLU (ENet's activation throughout)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class PhasePReLU(nn.Module):
    """PReLU over the packed phase layout (..., P*C) with an alpha of
    shape (C,) — the identical parameter tree as :class:`PReLU` applied
    after depth-to-space (channel order is phase-major, so the per-channel
    alpha tiles P times)."""

    features: int
    phases: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,), jnp.float32)
        a = jnp.tile(alpha, self.phases).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class PhaseBatchNorm(nn.Module):
    """Inference BatchNorm over the packed phase layout (..., P*C) with
    parameters/statistics of shape (C,) — the identical variable tree as
    ``nn.BatchNorm`` applied after depth-to-space (each phase is just a
    different pixel of the same channel)."""

    features: int
    phases: int = 4
    epsilon: float = 1e-3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        dt = jnp.dtype(self.dtype)
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(dt)
        add = (bias - mean * scale
               * jax.lax.rsqrt(var + self.epsilon)).astype(dt)
        return (x.astype(dt) * jnp.tile(mul, self.phases)
                + jnp.tile(add, self.phases))


class PhaseConv1x1(nn.Module):
    """1x1 conv applied identically to every phase of (..., P*Cin):
    a grouped conv with the (1, 1, Cin, Cout) kernel tiled across groups.
    Parameter tree identical to ``nn.Conv(features, (1, 1),
    use_bias=False)`` after depth-to-space."""

    features: int
    phases: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1] // self.phases
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        wg = jnp.tile(kernel, (1, 1, 1, self.phases)).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), wg, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.phases)


class PhaseExpand(nn.Module):
    """The up-bottleneck's ``expand`` ConvBNAct((1,1), act=False) computed
    in the phase domain (inference only); variable tree matches
    :class:`ConvBNAct` exactly (children Conv_0 + BatchNorm_0)."""

    features: int
    phases: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = PhaseConv1x1(self.features, self.phases, dtype=self.dtype,
                         name="Conv_0")(x)
        return PhaseBatchNorm(self.features, self.phases, dtype=self.dtype,
                              name="BatchNorm_0")(y)


class ChwBatchNorm(nn.Module):
    """Inference BatchNorm over a TRANSPOSED (C, M) activation —
    channels on sublanes, pixels on lanes — with the identical variable
    tree as ``nn.BatchNorm`` on the NHWC tensor.  ``phases > 1`` applies
    the same (C,) statistics to a phase-major (P*C, M) packed tensor
    (each phase is a different pixel of the same channel)."""

    features: int
    phases: int = 1
    epsilon: float = 1e-3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        dt = jnp.dtype(self.dtype)
        rs = jax.lax.rsqrt(var + self.epsilon)
        mul = (scale * rs).astype(dt)
        add = (bias - mean * scale * rs).astype(dt)
        if self.phases > 1:
            mul = jnp.tile(mul, self.phases)
            add = jnp.tile(add, self.phases)
        return x.astype(dt) * mul[:, None] + add[:, None]


class ChwPReLU(nn.Module):
    """PReLU over a transposed (C, M) activation; alpha tree identical to
    :class:`PReLU` on the NHWC tensor.  ``phases > 1``: phase-major
    packed (P*C, M) input, alpha tiled."""

    features: int
    phases: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,), jnp.float32)
        a = alpha
        if self.phases > 1:
            a = jnp.tile(a, self.phases)
        a = a.astype(x.dtype)[:, None]
        return jnp.where(x >= 0, x, a * x)


class ChwConv(nn.Module):
    """1x1 or 3x3 SAME conv over a transposed (Cin, N*H*W) activation as
    a direct ``W @ X`` matmul (3x3 via 9 stacked static-shift taps);
    param tree identical to the NHWC ``nn.Conv`` (kernel (kh,kw,ci,co),
    no bias)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xt: jax.Array,
                 nhw: Tuple[int, int, int]) -> jax.Array:
        kh, kw = self.kernel
        if (kh, kw) not in ((1, 1), (2, 2), (3, 3)):
            # Validate BEFORE self.param so an unsupported kernel never
            # registers a param of that shape (ADVICE r2).
            raise ValueError(f"ChwConv supports 1x1/2x2-down/3x3, "
                             f"got {self.kernel}")
        cin = xt.shape[0]
        dt = jnp.dtype(self.dtype)
        if (kh, kw) == (2, 2):
            # stride-2 down-projection consuming an s2d-packed (4*Cin, M)
            # input: exactly a matmul (cf. FastDownConv2x); param tree is
            # the NHWC (2, 2, Cin, Cout) kernel.
            cin4 = cin
            cin = cin4 // 4
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (2, 2, cin, self.features), jnp.float32)
            wt = kernel.reshape(cin4, self.features).T    # (co, (r,s,ci))
            return jax.lax.dot(wt.astype(dt), xt.astype(dt),
                               preferred_element_type=jnp.float32
                               ).astype(dt)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        if (kh, kw) == (1, 1):
            wt = kernel[0, 0].T                           # (co, ci)
            y = jax.lax.dot(wt.astype(dt), xt.astype(dt),
                            preferred_element_type=jnp.float32)
        else:
            n, h, w = nhw
            x4 = xt.reshape(cin, n, h, w)
            xp = jnp.pad(x4, ((0, 0), (0, 0), (1, 1), (1, 1)))
            taps = [xp[:, :, a:a + h, b:b + w]
                    for a in range(3) for b in range(3)]
            xcat = jnp.concatenate(taps, axis=0).reshape(9 * cin,
                                                         n * h * w)
            wt = kernel.transpose(3, 0, 1, 2).reshape(self.features,
                                                      9 * cin)
            y = jax.lax.dot(wt.astype(dt), xcat.astype(dt),
                            preferred_element_type=jnp.float32)
        return y.astype(dt)


class ChwDeconv2xPhase(nn.Module):
    """``ConvTranspose(features, (3,3), strides=2, SAME)`` in the CHW
    phase domain: input (Cin, M_lo), output phase-major (4*features,
    M_lo) — the caller depth-to-spaces once at the end.  Same kernel
    re-indexing as :class:`~.fastconv.FastConvTranspose2x`; param tree
    identical (``kernel`` (3, 3, ci, co))."""

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = False  # the classifier head's deconv carries one

    @nn.compact
    def __call__(self, xt: jax.Array,
                 nhw: Tuple[int, int, int]) -> jax.Array:
        n, h, w = nhw
        cin = xt.shape[0]
        dt = jnp.dtype(self.dtype)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        # W2[a, b, ci, (r,s)co] = W[2a-r, 2b-s] (cf. fastconv.py)
        wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        rows = []
        for a in (0, 1):
            cols = []
            for b in (0, 1):
                blocks = [wp[2 * a - r + 1, 2 * b - s + 1]
                          for r in (0, 1) for s in (0, 1)]
                cols.append(jnp.stack(blocks, axis=0))
            rows.append(jnp.stack(cols, axis=0))
        w2 = jnp.stack(rows, axis=0)                  # (2, 2, 4, ci, co)
        w2 = w2.transpose(0, 1, 3, 2, 4).reshape(
            2, 2, cin, 4 * self.features)
        x4 = xt.reshape(cin, n, h, w)
        xp = jnp.pad(x4, ((0, 0), (0, 0), (1, 0), (1, 0)))
        taps = [xp[:, :, a:a + h, b:b + w] for a in (0, 1) for b in (0, 1)]
        xcat = jnp.concatenate(taps, axis=0).reshape(4 * cin, n * h * w)
        wt = w2.transpose(3, 0, 1, 2).reshape(4 * self.features, 4 * cin)
        y = jax.lax.dot(wt.astype(dt), xcat.astype(dt),
                        preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + jnp.tile(bias, 4)[:, None]   # phase-major rows
        return y.astype(dt)


class ChwPhaseConv1x1(nn.Module):
    """Per-phase shared-weight 1x1 conv on phase-major (P*Cin, M); param
    tree identical to ``nn.Conv(features, (1,1), use_bias=False)``."""

    features: int
    phases: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        p = self.phases
        cin = z.shape[0] // p
        m = z.shape[1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        k = kernel[0, 0].astype(z.dtype)              # (ci, co)
        z4 = z.reshape(p, cin, m)
        y = jnp.einsum("ic,pin->pcn", k, z4,
                       preferred_element_type=jnp.float32)
        return y.astype(z.dtype).reshape(p * self.features, m)


class ChwPhaseExpand(nn.Module):
    """The up-bottleneck's ``expand`` in the CHW phase domain; variable
    tree matches :class:`ConvBNAct` (children Conv_0 + BatchNorm_0)."""

    features: int
    phases: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        y = ChwPhaseConv1x1(self.features, self.phases, dtype=self.dtype,
                            name="Conv_0")(z)
        return ChwBatchNorm(self.features, phases=self.phases,
                            dtype=self.dtype, name="BatchNorm_0")(y)


class ChwConvBNAct(nn.Module):
    """:class:`ConvBNAct` computed in the transposed (C, M) domain
    (inference); identical variable tree (children Conv_0 / BatchNorm_0 /
    PReLU_0)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xt: jax.Array,
                 nhw: Tuple[int, int, int]) -> jax.Array:
        y = ChwConv(self.features, self.kernel, dtype=self.dtype,
                    name="Conv_0")(xt, nhw)
        y = ChwBatchNorm(self.features, dtype=self.dtype,
                         name="BatchNorm_0")(y)
        if self.act:
            y = ChwPReLU(self.features, name="PReLU_0")(y)
        return y


class ConvBNAct(nn.Module):
    """Conv → BatchNorm → PReLU/none, the repeated ENet motif.

    ``fast`` reroutes a 2x2/stride-2 conv through
    :class:`~.fastconv.FastDownConv2x` (exact same math and param tree;
    measured hotspot fix, PERF.md round 2b)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    act: bool = True
    dtype: Any = jnp.bfloat16
    fast: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if (self.fast and self.kernel == (2, 2)
                and self.strides == (2, 2) and not self.use_bias):
            x = FastDownConv2x(self.features, dtype=self.dtype,
                               name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, self.kernel, strides=self.strides,
                        kernel_dilation=self.dilation, padding="SAME",
                        use_bias=self.use_bias, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        if self.act:
            x = PReLU()(x)
        return x


class InitialBlock(nn.Module):
    """ENet stem: 3x3/2 conv (13 ch) concatenated with 2x2 max pool.

    ``fast`` computes the strided conv as space-to-depth + a dense 2x2
    conv (same params/math, see fastconv.py) — the stride-2 RGB conv was
    a measured stem hotspot (PERF.md).
    """

    dtype: Any = jnp.bfloat16
    fast: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.fast and not train:
            # CHW inference path: ONE space-to-depth feeds both branches;
            # the conv runs transposed (channels on sublanes, pixels on
            # lanes — 6x faster at 3-16 channels, PERF.md round 2b), the
            # pool is a phase-max of the same packed tensor, and BN+PReLU
            # apply in the transposed domain before a single transpose
            # back to NHWC.  Identical math + variable tree.
            n, h, w, _ = x.shape
            xp = space_to_depth(x)                        # (n,h/2,w/2,12)
            conv_t = FastStemConv2x(13, dtype=self.dtype, name="Conv_0")(
                xp, packed=True, chw_out=True)            # (13, NHW)
            pool = jnp.max(xp.reshape(n, h // 2, w // 2, 4, 3), axis=3)
            pool_t = pool.reshape(n * (h // 2) * (w // 2), 3).T
            out_t = jnp.concatenate([conv_t,
                                     pool_t.astype(conv_t.dtype)], axis=0)
            out_t = ChwBatchNorm(16, dtype=self.dtype,
                                 name="BatchNorm_0")(out_t)
            out_t = ChwPReLU(16, name="PReLU_0")(out_t)
            return out_t.T.reshape(n, h // 2, w // 2, 16)

        if self.fast:
            conv = FastStemConv2x(13, dtype=self.dtype, name="Conv_0")(x)
        else:
            conv = nn.Conv(13, (3, 3), strides=(2, 2), padding="SAME",
                           use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32)(x)
        pool = pooling.max_pool_2x2(x)
        out = jnp.concatenate([conv, pool], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        return PReLU()(out)


class Bottleneck(nn.Module):
    """The ENet bottleneck in its four flavours.

    kind: "regular" | "dilated" | "asymmetric" | "down" | "up".
    Main branch: 1x1 (or 2x2/2 when downsampling) projection → core conv
    (3x3, dilated 3x3, 5x1+1x5, or 3x3 transposed) → 1x1 expansion →
    spatial dropout.  Skip branch: identity / pool-with-indices + channel
    zero-pad / 1x1 conv + unpool.  Sum then PReLU.
    """

    features: int
    kind: str = "regular"
    dilation: int = 1
    projection_ratio: int = 4
    dropout_rate: float = 0.1
    dtype: Any = jnp.bfloat16
    fast: bool = True
    # Keep the "up" inference path in the packed phase domain (see below);
    # independent of ``fast`` so the two lowerings can be A/B-measured.
    # Default OFF: measured 26 us SLOWER than the depth-to-space lowering
    # on the bench v5e (stage-5 A/B, PERF.md round 2b) — the grouped conv
    # and tiled-weight forms lower worse than the relayouts they save.
    phase_up: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 pool_idx: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
        mid = self.features // self.projection_ratio
        new_idx = None

        # CHW fast path for undilated regular bottlenecks at narrow
        # widths (inference): the whole block — both 1x1s, the 3x3 core,
        # folded BN, PReLUs and the residual — runs in the transposed
        # (channels, pixels) orientation, where few-channel matmuls fill
        # the MXU (PERF.md round 2b: 6x on the stem conv).  One transpose
        # in, one out; XLA cancels adjacent out/in pairs between
        # consecutive CHW blocks.  Same math, same variable tree.
        if (self.kind == "regular" and self.dilation == 1 and self.fast
                and not train and self.features <= 64
                and self.features == x.shape[-1]):
            # features == Cin gate: the residual add below assumes the
            # identity skip matches (always true in ENet; defense in
            # depth per ADVICE r2).
            n, h, w, c = x.shape
            xt = x.reshape(n * h * w, c).T.astype(self.dtype)
            y = ChwConvBNAct(mid, (1, 1), dtype=self.dtype,
                             name="proj")(xt, (n, h, w))
            y = ChwConvBNAct(mid, (3, 3), dtype=self.dtype,
                             name="conv")(y, (n, h, w))
            y = ChwConvBNAct(self.features, (1, 1), act=False,
                             dtype=self.dtype, name="expand")(y, (n, h, w))
            out = ChwPReLU(self.features, name="out_act")(y + xt)
            return out.T.reshape(n, h, w, c), None

        # CHW fast path for narrow "down" bottlenecks (inference): proj
        # is s2d + a matmul, the 3x3/1x1s run transposed, and the
        # pool-with-indices skip joins in (C, M) form.  Gated to
        # features <= 64 — at 128 channels XLA's strided lowering is
        # already near-free (measured, PERF.md round 2b).
        if (self.kind == "down" and self.fast and not train
                and self.features <= 64):
            n, h, w, c = x.shape
            h2, w2 = h // 2, w // 2
            xp = space_to_depth(x)
            xpt = xp.reshape(n * h2 * w2, 4 * c).T.astype(self.dtype)
            y = ChwConvBNAct(mid, (2, 2), dtype=self.dtype,
                             name="proj")(xpt, (n, h2, w2))
            y = ChwConvBNAct(mid, (3, 3), dtype=self.dtype,
                             name="conv")(y, (n, h2, w2))
            y = ChwConvBNAct(self.features, (1, 1), act=False,
                             dtype=self.dtype, name="expand")(y, (n, h2, w2))
            pooled, new_idx = max_pool_with_indices(x)
            skip_t = pooled.reshape(n * h2 * w2, c).T.astype(y.dtype)
            if self.features > c:
                skip_t = jnp.pad(skip_t, ((0, self.features - c), (0, 0)))
            out = ChwPReLU(self.features, name="out_act")(y + skip_t)
            return out.T.reshape(n, h2, w2, self.features), new_idx

        # CHW phase fast path for "up" (inference): proj and skip_proj
        # run transposed at the LOW resolution, the deconv emits the
        # phase-major packed tensor, BN/PReLU/expand apply phase-aware in
        # (4C, M) form, the unpooled skip is built directly in the phase
        # domain from the encoder indices, and ONE transpose +
        # depth-to-space emits the high-res NHWC output.
        if self.kind == "up" and self.fast and not self.phase_up \
                and not train:
            if pool_idx is None:
                raise ValueError("'up' bottleneck needs the matching "
                                 "encoder pool indices")
            n, h, w, c = x.shape
            m = n * h * w
            xt = x.reshape(m, c).T.astype(self.dtype)
            y = ChwConvBNAct(mid, (1, 1), dtype=self.dtype,
                             name="proj")(xt, (n, h, w))
            z = ChwDeconv2xPhase(mid, dtype=self.dtype,
                                 name="deconv")(y, (n, h, w))
            z = ChwBatchNorm(mid, phases=4, dtype=self.dtype,
                             name="deconv_bn")(z)
            z = ChwPReLU(mid, phases=4, name="deconv_act")(z)
            z = ChwPhaseExpand(self.features, dtype=self.dtype,
                               name="expand")(z)                # (4C, M)
            skip = ChwConvBNAct(self.features, (1, 1), act=False,
                                dtype=self.dtype,
                                name="skip_proj")(xt, (n, h, w))
            idx_t = pool_idx.reshape(m, self.features).T        # (C, M)
            zero = jnp.zeros((), skip.dtype)
            skip_ph = jnp.concatenate(
                [jnp.where(idx_t == p, skip, zero) for p in range(4)],
                axis=0)                                          # (4C, M)
            out = ChwPReLU(self.features, phases=4,
                           name="out_act")(z + skip_ph)
            out = out.T.reshape(n, h, w, 4 * self.features)
            return depth_to_space(out), None

        # Phase-domain fast path for "up" (inference): the deconv's
        # pre-depth-to-space tensor stays packed — BN, PReLU, expand,
        # unpool-skip and the output PReLU all run at the LOW resolution
        # with 4x the channels, and one depth-to-space at the end emits
        # the result.  Same math (phase-major channel order throughout),
        # same variable tree; avoids every lane-starved high-res op
        # (measured stage-5 hotspot, PERF.md round 2b).
        phase = (self.kind == "up" and self.fast and self.phase_up
                 and not train)

        # -- main branch ----------------------------------------------------
        if self.kind == "down":
            # fast s2d proj only at narrow widths — at 128 channels the
            # plain strided conv measured faster (PERF.md round 2b)
            y = ConvBNAct(mid, (2, 2), strides=(2, 2), dtype=self.dtype,
                          fast=self.fast and self.features <= 64,
                          name="proj")(x, train)
        else:
            y = ConvBNAct(mid, (1, 1), dtype=self.dtype, name="proj")(x, train)

        if self.kind == "asymmetric":
            y = nn.Conv(mid, (5, 1), padding="SAME", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv_5x1")(y)
            y = ConvBNAct(mid, (1, 5), dtype=self.dtype, name="conv_1x5")(
                y, train)
        elif self.kind == "up":
            if self.fast:
                y = FastConvTranspose2x(mid, kernel=3, use_bias=False,
                                        dtype=self.dtype, name="deconv")(
                    y, phase_out=phase)
            else:
                y = nn.ConvTranspose(mid, (3, 3), strides=(2, 2),
                                     padding="SAME", use_bias=False,
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name="deconv")(y)
            if phase:
                y = PhaseBatchNorm(mid, dtype=self.dtype,
                                   name="deconv_bn")(y)
                y = PhasePReLU(mid, name="deconv_act")(y)
            else:
                y = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-3,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="deconv_bn")(y)
                y = PReLU(name="deconv_act")(y)
        else:
            d = (self.dilation, self.dilation)
            y = ConvBNAct(mid, (3, 3), dilation=d, dtype=self.dtype,
                          name="conv")(y, train)

        if phase:
            y = PhaseExpand(self.features, dtype=self.dtype,
                            name="expand")(y)
        else:
            y = ConvBNAct(self.features, (1, 1), act=False, dtype=self.dtype,
                          name="expand")(y, train)
        if train and self.dropout_rate > 0:
            # Spatial dropout: drop whole channels (ENet's regulariser).
            y = nn.Dropout(self.dropout_rate,
                           broadcast_dims=(1, 2))(y, deterministic=not train)

        # -- skip branch ----------------------------------------------------
        if self.kind == "down":
            skip, new_idx = max_pool_with_indices(x)
            pad = self.features - skip.shape[-1]
            if pad > 0:
                skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, pad)))
        elif self.kind == "up":
            skip = ConvBNAct(self.features, (1, 1), act=False,
                             dtype=self.dtype, name="skip_proj")(x, train)
            if pool_idx is None:
                raise ValueError("'up' bottleneck needs the matching "
                                 "encoder pool indices")
            skip = (max_unpool_phase(skip, pool_idx) if phase
                    else max_unpool(skip, pool_idx))
        else:
            skip = x

        if phase:
            out = PhasePReLU(self.features, name="out_act")(y + skip)
            return depth_to_space(out), new_idx
        return PReLU(name="out_act")(y + skip), new_idx


# ---------------------------------------------------------------------------
# The full network
# ---------------------------------------------------------------------------


class ENet(nn.Module):
    """ENet, NHWC.  Input (N, H, W, 3) float; output (N, H, W, num_classes).

    Capability-equivalent to the reference's frozen graph at 512x256 with 15
    classes (reference models.py:15-19); resolution and class count are
    free parameters here (H, W divisible by 8).
    """

    num_classes: int = 15
    dtype: Any = jnp.bfloat16
    # Compute stride-2 (de)convs as dense phase-packed convs (fastconv.py);
    # identical params & math, measurably faster on the MXU.  fast=False
    # keeps the textbook lowering for A/B parity tests.
    fast: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim != 4 or x.shape[1] % 8 or x.shape[2] % 8:
            raise ValueError(
                f"ENet needs NHWC input with H, W divisible by 8 "
                f"(3 levels of 2x down/up-sampling); got {x.shape}")
        dt = self.dtype
        x = x.astype(dt)
        x = InitialBlock(dtype=dt, fast=self.fast, name="initial")(x, train)

        # Stage 1 (encoder, 1/4 resolution, 64ch)
        x, idx1 = Bottleneck(64, "down", dropout_rate=0.01, dtype=dt,
                             name="b1_0")(x, train)
        for i in range(1, 5):
            x, _ = Bottleneck(64, "regular", dropout_rate=0.01, dtype=dt,
                              name=f"b1_{i}")(x, train)

        # Stage 2 (encoder, 1/8 resolution, 128ch)
        x, idx2 = Bottleneck(128, "down", dtype=dt, name="b2_0")(x, train)
        for stage in (2, 3):
            x, _ = Bottleneck(128, "regular", dtype=dt,
                              name=f"b{stage}_1")(x, train)
            x, _ = Bottleneck(128, "dilated", dilation=2, dtype=dt,
                              name=f"b{stage}_2")(x, train)
            x, _ = Bottleneck(128, "asymmetric", dtype=dt,
                              name=f"b{stage}_3")(x, train)
            x, _ = Bottleneck(128, "dilated", dilation=4, dtype=dt,
                              name=f"b{stage}_4")(x, train)
            x, _ = Bottleneck(128, "regular", dtype=dt,
                              name=f"b{stage}_5")(x, train)
            x, _ = Bottleneck(128, "dilated", dilation=8, dtype=dt,
                              name=f"b{stage}_6")(x, train)
            x, _ = Bottleneck(128, "asymmetric", dtype=dt,
                              name=f"b{stage}_7")(x, train)
            x, _ = Bottleneck(128, "dilated", dilation=16, dtype=dt,
                              name=f"b{stage}_8")(x, train)

        # Stage 4 (decoder, back to 1/4, 64ch)
        x, _ = Bottleneck(64, "up", dtype=dt, fast=self.fast, name="b4_0")(
            x, train, pool_idx=idx2)
        x, _ = Bottleneck(64, "regular", dtype=dt, name="b4_1")(x, train)
        x, _ = Bottleneck(64, "regular", dtype=dt, name="b4_2")(x, train)

        # Stage 5 (decoder, back to 1/2, 16ch)
        x, _ = Bottleneck(16, "up", dtype=dt, fast=self.fast, name="b5_0")(
            x, train, pool_idx=idx1)
        x, _ = Bottleneck(16, "regular", dtype=dt, name="b5_1")(x, train)

        # Full-resolution classifier head.
        if self.fast and not train:
            # CHW phase head: b5_1's CHW block ends with a transpose
            # that XLA cancels against this entry transpose, so the
            # 16-channel deconv runs as one (60, 64) x (64, M) matmul
            # in the fast orientation + a single depth-to-space.
            n_, h_, w_, c_ = x.shape
            xt = x.reshape(n_ * h_ * w_, c_).T.astype(dt)
            z = ChwDeconv2xPhase(self.num_classes, dtype=dt,
                                 use_bias=True, name="fullconv")(
                                     xt, (n_, h_, w_))
            x = depth_to_space(
                z.T.reshape(n_, h_, w_, 4 * self.num_classes))
        elif self.fast:
            x = FastConvTranspose2x(self.num_classes, kernel=3,
                                    use_bias=True, dtype=dt,
                                    name="fullconv")(x)
        else:
            x = nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                                 padding="SAME", use_bias=True, dtype=dt,
                                 param_dtype=jnp.float32,
                                 name="fullconv")(x)
        return x.astype(jnp.float32)


__all__ = ["ENet", "InitialBlock", "Bottleneck", "PReLU", "PhasePReLU",
           "PhaseBatchNorm", "PhaseConv1x1", "PhaseExpand",
           "ChwBatchNorm", "ChwPReLU", "ChwConv", "ChwConvBNAct",
           "ChwDeconv2xPhase", "ChwPhaseConv1x1", "ChwPhaseExpand",
           "max_pool_with_indices", "max_unpool", "max_unpool_phase"]
