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
from .fastconv import FastConvTranspose2x, FastStemConv2x


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


def max_unpool(pooled: jax.Array, idx: jax.Array) -> jax.Array:
    """Inverse of :func:`max_pool_with_indices`.

    Places each pooled value at its remembered window position, zeros
    elsewhere — expressed as a one-hot multiply so it lowers to VPU
    select/multiply instead of a scatter.
    """
    n, hh, ww, c = pooled.shape
    slots = jnp.arange(4, dtype=jnp.uint8).reshape(1, 1, 1, 4, 1)
    onehot = (idx[:, :, :, None, :] == slots)
    spread = jnp.where(onehot, pooled[:, :, :, None, :],
                       jnp.zeros((), pooled.dtype))
    spread = spread.reshape(n, hh, ww, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return spread.reshape(n, hh * 2, ww * 2, c)


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


class ConvBNAct(nn.Module):
    """Conv → BatchNorm → PReLU/none, the repeated ENet motif."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 pool_idx: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
        mid = self.features // self.projection_ratio
        new_idx = None

        # -- main branch ----------------------------------------------------
        if self.kind == "down":
            y = ConvBNAct(mid, (2, 2), strides=(2, 2), dtype=self.dtype,
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
                                        dtype=self.dtype, name="deconv")(y)
            else:
                y = nn.ConvTranspose(mid, (3, 3), strides=(2, 2),
                                     padding="SAME", use_bias=False,
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name="deconv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32, name="deconv_bn")(y)
            y = PReLU(name="deconv_act")(y)
        else:
            d = (self.dilation, self.dilation)
            y = ConvBNAct(mid, (3, 3), dilation=d, dtype=self.dtype,
                          name="conv")(y, train)

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
            skip = max_unpool(skip, pool_idx)
        else:
            skip = x

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
        if self.fast:
            x = FastConvTranspose2x(self.num_classes, kernel=3,
                                    use_bias=True, dtype=dt,
                                    name="fullconv")(x)
        else:
            x = nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                                 padding="SAME", use_bias=True, dtype=dt,
                                 param_dtype=jnp.float32,
                                 name="fullconv")(x)
        return x.astype(jnp.float32)


__all__ = ["ENet", "InitialBlock", "Bottleneck", "PReLU",
           "max_pool_with_indices", "max_unpool"]
