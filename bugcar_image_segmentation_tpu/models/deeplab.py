"""DeepLabV3+ (MobileNetV2 backbone + ASPP) in Flax, NHWC / TPU-native.

Capability-equivalent of the reference's frozen ``deeplab.pb`` graph
(reference models.py:98-136: tensors ``import/ImageTensor:0`` →
``import/SemanticPredictions:0``, long-edge 1024, uint8 input, argmax
baked into the graph).  The reference's engine fed raw uint8 images and
got back an already-argmaxed class map; :class:`DeepLabV3` reproduces that
contract via ``predictions=True`` while also exposing logits for training.

Notes vs the reference:
- The reference's ``preprocess`` was dead code (models.py:126-136 refers to
  attributes that don't exist) and its aspect-preserving resize was
  commented out (models.py:121).  Here preprocessing is the standard
  mean/std pipeline in models/preprocess.py, applied for real.
- Output stride 16, ASPP rates (6, 12, 18), 1/4-resolution decoder skip —
  the published DeepLabV3+ MobileNetV2 configuration.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: bool = True
    relu6: bool = True  # MobileNetV2 uses ReLU6; Xception plain ReLU.
    dtype: Any = jnp.bfloat16
    # CHW inference path for the RGB stem (3->C stride-2 conv).  Default
    # OFF: it won 6x on ENet's (256,512)->16ch stem but measured the
    # whole DeepLab forward 2.13 -> 2.65 ms at (512,1024)->32ch — the
    # (32, 131k) transpose back to NHWC (~8 MB relayout) outweighs the
    # conv saving at this scale (PERF.md round 2b).  Kept parity-tested
    # for smaller stems.
    fast_stem: bool = False
    # Inference lowering of stride-1 3x3 convs to nine shift+matmuls
    # (fastconv.ShiftMatmulConv3x3).  None = auto: on exactly when the
    # conv is DILATED — XLA's atrous lowering runs ASPP's rate-6/12/18
    # branches at ~30 TF/s vs ~110 for the shifted form (3.3-3.8x,
    # scripts/bench_dilated.py); plain 3x3s (decoder) are left to XLA.
    # Same param tree either way; training always uses nn.Conv.
    shift_matmul: Optional[bool] = None
    # Inference lowering of the 3x3 stride-2 stem to 4x4 space-to-depth
    # + one (px/16, 64*Cin)x(64*Cin, 4*Cout) matmul + depth-to-space
    # (fastconv.S2d4StemConv2x) — the only stem reformulation that
    # BEAT the stock conv at (512, 1024, 3) (0.489 -> 0.363 ms,
    # scripts/bench_entry3.py; CHW / packed-s2d / phase-resident all
    # measured slower, see PERF.md round 3h).  Default OFF; the
    # Xception twin and the MNv2 stem turn it on.
    s2d4_stem: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        use_shift = (not train and self.kernel == (3, 3)
                     and self.strides == (1, 1) and self.groups == 1
                     and (self.dilation != (1, 1)
                          if self.shift_matmul is None
                          else self.shift_matmul))
        if use_shift:
            from .fastconv import ShiftMatmulConv3x3
            y = ShiftMatmulConv3x3(self.features, dilation=self.dilation,
                                   dtype=self.dtype, name="Conv_0")(x)
            y = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="BatchNorm_0")(y)
            if self.act:
                y = jnp.maximum(y, 0)
                if self.relu6:
                    y = jnp.minimum(y, 6)
            return y

        if (self.s2d4_stem and not train and self.kernel == (3, 3)
                and self.strides == (2, 2) and self.groups == 1
                and self.dilation == (1, 1)
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
            from .fastconv import S2d4StemConv2x
            y = S2d4StemConv2x(self.features, dtype=self.dtype,
                               name="Conv_0")(x)
            y = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="BatchNorm_0")(y)
            if self.act:
                y = jnp.maximum(y, 0)
                if self.relu6:
                    y = jnp.minimum(y, 6)
            return y

        if (self.fast_stem and not train and self.kernel == (3, 3)
                and self.strides == (2, 2) and self.groups == 1):
            from .enet import ChwBatchNorm
            from .fastconv import FastStemConv2x
            n, h, w, _ = x.shape
            y = FastStemConv2x(self.features, dtype=self.dtype,
                               name="Conv_0")(x, chw_out=True)
            y = ChwBatchNorm(self.features, epsilon=1e-3,
                             dtype=self.dtype, name="BatchNorm_0")(y)
            if self.act:
                y = jnp.maximum(y, 0)
                if self.relu6:
                    y = jnp.minimum(y, 6)
            return y.T.reshape(n, h // 2, w // 2, self.features)

        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    kernel_dilation=self.dilation, padding="SAME",
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        if self.act:
            x = jnp.maximum(x, 0)
            if self.relu6:
                x = jnp.minimum(x, 6)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted-residual block (expand → depthwise → project)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    expand: int = 6
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inp = x.shape[-1]
        y = x
        if self.expand != 1:
            y = ConvBN(inp * self.expand, (1, 1), dtype=self.dtype,
                       name="expand")(y, train)
        y = ConvBN(y.shape[-1], (3, 3), strides=self.strides,
                   dilation=(self.dilation, self.dilation),
                   groups=y.shape[-1], dtype=self.dtype,
                   name="depthwise")(y, train)
        y = ConvBN(self.features, (1, 1), act=False, dtype=self.dtype,
                   name="project")(y, train)
        if self.strides == (1, 1) and inp == self.features:
            y = y + x
        return y


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: 1x1 + three dilated 3x3 + image pool."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    relu6: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        branches = [ConvBN(self.features, (1, 1), relu6=self.relu6,
                           dtype=self.dtype, name="b0")(x, train)]
        for i, r in enumerate(self.rates):
            branches.append(ConvBN(self.features, (3, 3), dilation=(r, r),
                                   relu6=self.relu6, dtype=self.dtype,
                                   name=f"b{i + 1}")(x, train))
        # Image-level pooling branch: global average, project, broadcast.
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBN(self.features, (1, 1), relu6=self.relu6,
                        dtype=self.dtype, name="image_pool")(pooled, train)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.features))
        branches.append(pooled)
        y = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.features, (1, 1), relu6=self.relu6,
                      dtype=self.dtype, name="merge")(y, train)


def _upsample(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Bilinear upsample to (h, w) — jit-static target shape."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method="bilinear")


class DeepLabV3(nn.Module):
    """DeepLabV3+ head over MobileNetV2, output stride 16.

    Input (N, H, W, 3) float NHWC (H, W divisible by 16); output
    (N, H, W, num_classes) float32 logits.
    """

    num_classes: int = 15
    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16
    # "quarter": inference returns logits at the decoder's native 1/4
    # resolution and Engine nearest-replicates the uint8 LABELS to input
    # res (models/api.py _to_input_res) — skipping the f32 x4 logits
    # upsample (31 MB written at 1024x512), same scheme as SegFormer's
    # quarter head (PERF.md round 3c).  Training always emits full res.
    head_upsample: str = "full"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim != 4 or x.shape[1] % 16 or x.shape[2] % 16:
            raise ValueError(
                f"DeepLabV3 needs NHWC input with H, W divisible by 16 "
                f"(output stride); got {x.shape}")
        if self.head_upsample not in ("full", "quarter"):
            raise ValueError(
                f"head_upsample must be 'full' or 'quarter', "
                f"got {self.head_upsample!r}")
        dt = self.dtype
        x = x.astype(dt)
        h, w = x.shape[1], x.shape[2]

        def ch(c):
            return max(8, int(c * self.width_mult + 4) // 8 * 8)

        y = ConvBN(ch(32), (3, 3), strides=(2, 2), dtype=dt,
                   s2d4_stem=True, name="stem")(x, train)
        y = InvertedResidual(ch(16), expand=1, dtype=dt, name="ir1")(y, train)
        y = InvertedResidual(ch(24), strides=(2, 2), dtype=dt,
                             name="ir2_0")(y, train)
        y = InvertedResidual(ch(24), dtype=dt, name="ir2_1")(y, train)
        low_level = y                                   # 1/4 resolution
        y = InvertedResidual(ch(32), strides=(2, 2), dtype=dt,
                             name="ir3_0")(y, train)
        for i in range(1, 3):
            y = InvertedResidual(ch(32), dtype=dt, name=f"ir3_{i}")(y, train)
        y = InvertedResidual(ch(64), strides=(2, 2), dtype=dt,
                             name="ir4_0")(y, train)
        for i in range(1, 4):
            y = InvertedResidual(ch(64), dtype=dt, name=f"ir4_{i}")(y, train)
        for i in range(3):
            y = InvertedResidual(ch(96), dtype=dt, name=f"ir5_{i}")(y, train)
        # Output stride 16 from here on: stride-1 with dilation 2.
        y = InvertedResidual(ch(160), dilation=2, dtype=dt,
                             name="ir6_0")(y, train)
        for i in range(1, 3):
            y = InvertedResidual(ch(160), dilation=2, dtype=dt,
                                 name=f"ir6_{i}")(y, train)
        y = InvertedResidual(ch(320), dilation=2, dtype=dt,
                             name="ir7")(y, train)

        y = ASPP(dtype=dt, name="aspp")(y, train)

        # Decoder: fuse with the 1/4-resolution low-level features.
        y = _upsample(y, (low_level.shape[1], low_level.shape[2]))
        ll = ConvBN(48, (1, 1), dtype=dt, name="low_proj")(low_level, train)
        y = jnp.concatenate([y, ll.astype(y.dtype)], axis=-1)
        y = ConvBN(256, (3, 3), dtype=dt, name="dec0")(y, train)
        y = ConvBN(256, (3, 3), dtype=dt, name="dec1")(y, train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                    param_dtype=jnp.float32, name="classifier")(y)
        if self.head_upsample == "quarter" and not train:
            return y.astype(jnp.float32)
        return _upsample(y.astype(jnp.float32), (h, w))


__all__ = ["DeepLabV3", "ASPP", "InvertedResidual", "ConvBN"]
