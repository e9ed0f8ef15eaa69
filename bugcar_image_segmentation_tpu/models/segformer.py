"""SegFormer (MiT backbone + all-MLP head) in Flax — BASELINE config 5.

The attention-backbone configuration at 1024x1024 from BASELINE.json.  The
reference has no attention models at all (SURVEY.md §2c); this implements
the SegFormer-B0/B1 family (Xie et al., 2021): four hierarchical stages of
overlapped patch embedding + efficient self-attention + Mix-FFN, fused by
an all-MLP decode head at 1/4 resolution.

TPU-first specifics:
- Attention runs through the Pallas blockwise kernel
  (ops/pallas/attention.py): at 1024² input, stage-1 has 65k tokens — the
  (N, N) score matrix would be 16 GB, the blockwise kernel keeps it in
  VMEM tiles (SURVEY.md §5 long-context note).
- Spatial-reduction attention (sr_ratio) shrinks K/V by conv-pooling, so
  kv-length is at most ~4k — K/V tiles stay resident while Q streams.
- NHWC throughout; LayerNorm in f32, matmuls bf16 → f32 accumulate.
- ``quant=True`` (engine name suffix ``_int8``) runs every Dense
  projection through the dynamic W8A8 int8 MXU path (ops/quant.py) at
  2x bf16 matmul throughput — same float32 parameter tree, so trained /
  converted weights load unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas.attention import (attention_reference, flash_attention,
                                    flash_attention_t)
from ..ops.quant import Int8Dense
from .chw import (ChwConv1x1, ChwDense, ChwDepthwise3x3, ChwLayerNorm,
                  ChwSrConv)
from .enet import ChwBatchNorm
from .fastconv import FastStemConv2x, FastStemConv4x


def _dense(features: int, *, quant: bool, dtype: Any, name: str):
    """nn.Dense or its int8-MXU drop-in (same param tree either way)."""
    if quant:
        return Int8Dense(features, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                    name=name)


class OverlapPatchEmbed(nn.Module):
    """Strided-conv patch embedding (k7s4 for stage 1, k3s2 after).

    The strided convs run phase-packed (fastconv.py: k7s4 as a 3x3 conv
    over 4x4 space-to-depth, k3s2 as a 2x2 conv over 2x2 s2d — exact
    same math and param trees): the stage-1 embed on 1024² RGB was a
    measured 1.3 ms hotspot in the stock strided lowering (PERF.md)."""

    features: int
    kernel: int
    stride: int
    dtype: Any = jnp.bfloat16
    # "same" (this repo's historical convention) or "torch" — the
    # official implementation's centered padding=k//2
    # (convert/torch_segformer.py pours HF checkpoints; the receptive
    # fields only line up under "torch").
    pad: str = "same"

    @nn.compact
    def __call__(self, x: jax.Array, chw_out: bool = False,
                 chw_in_nhw: Optional[Tuple[int, int, int]] = None
                 ) -> jax.Array:
        """``chw_out=True`` (inference CHW stages) emits the TRANSPOSED
        (features, N*H'*W') embedding — the phase-packed convs produce
        that orientation natively, and the embed LayerNorm runs
        transposed too.  ``chw_in_nhw``: x is already transposed
        (C, N*H*W) from the previous CHW stage (k3s2 embeds only) — the
        whole chain then never leaves the orientation.  Identical param
        tree every way."""
        if chw_in_nhw is not None:
            if (self.kernel, self.stride) != (3, 2):
                raise ValueError("chw_in is only for the k3s2 embeds")
            xt = FastStemConv2x(self.features, use_bias=True,
                                dtype=self.dtype, pad=self.pad,
                                name="Conv_0")(x, chw_in_nhw=chw_in_nhw)
            return ChwLayerNorm(self.features, dtype=self.dtype,
                                name="LayerNorm_0")(xt)
        if chw_out:
            if (self.kernel, self.stride) == (7, 4):
                xt = FastStemConv4x(self.features, use_bias=True,
                                    dtype=self.dtype, pad=self.pad,
                                    name="Conv_0")(x, chw_out=True)
            elif (self.kernel, self.stride) == (3, 2):
                xt = FastStemConv2x(self.features, use_bias=True,
                                    dtype=self.dtype, pad=self.pad,
                                    name="Conv_0")(x, chw_out=True)
            else:
                hp = self.kernel // 2
                padding = ([(hp, hp)] * 2 if self.pad == "torch"
                           else "SAME")
                y = nn.Conv(self.features, (self.kernel, self.kernel),
                            strides=(self.stride, self.stride),
                            padding=padding, dtype=self.dtype,
                            param_dtype=jnp.float32, name="Conv_0")(x)
                n_, h_, w_, c_ = y.shape
                xt = y.reshape(n_ * h_ * w_, c_).T
            return ChwLayerNorm(self.features, dtype=self.dtype,
                                name="LayerNorm_0")(xt)
        if (self.kernel, self.stride) == (7, 4):
            x = FastStemConv4x(self.features, use_bias=True,
                               dtype=self.dtype, pad=self.pad,
                               name="Conv_0")(x)
        elif (self.kernel, self.stride) == (3, 2):
            x = FastStemConv2x(self.features, use_bias=True,
                               dtype=self.dtype, pad=self.pad,
                               name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="Conv_0")(x)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                            name="LayerNorm_0")(x).astype(self.dtype)


class EfficientAttention(nn.Module):
    """Self-attention with spatial reduction of K/V (SegFormer's SRA)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: Any = jnp.bfloat16
    quant: bool = False
    # Run inference attention through the plain XLA einsum path instead
    # of the Pallas kernel.  pallas_call has no SPMD partitioning rule,
    # so GSPMD cannot split it — under a spatial mesh
    # (parallel/spatial.py) the XLA path lets the row sharding flow
    # through: scores stay sharded on the Q-token axis and K/V (small,
    # SR-reduced to <=4k tokens) are all-gathered per shard.
    xla_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, hw: Tuple[int, int],
                 chw_n: Optional[int] = None,
                 train: bool = False) -> jax.Array:
        h, w = hw
        head_dim = self.dim // self.num_heads

        if chw_n is not None:
            # Transposed path: x is (C, N*H*W).  Projections are
            # (C_out, C_in) x (C_in, M) matmuls (full-width MXU at any
            # C), the SR conv is a CHW space-to-depth + one matmul, and
            # attention runs through the TRANSPOSED Pallas kernel — the
            # 65k-token activation never changes layout end to end.
            n = chw_n
            l = h * w
            q = ChwDense(self.dim, quant=self.quant, dtype=self.dtype,
                         name="q")(x)
            kv_in, lkv = x, l
            if self.sr_ratio > 1:
                r = self.sr_ratio
                kv_in = ChwSrConv(self.dim, r, dtype=self.dtype,
                                  name="sr")(x, (n, h, w))
                kv_in = ChwLayerNorm(self.dim, dtype=self.dtype,
                                     name="sr_norm")(kv_in)
                lkv = (h // r) * (w // r)
            k = ChwDense(self.dim, quant=self.quant, dtype=self.dtype,
                         name="k")(kv_in)
            v = ChwDense(self.dim, quant=self.quant, dtype=self.dtype,
                         name="v")(kv_in)

            def split_t(t, tokens):
                return t.reshape(self.num_heads, head_dim, n,
                                 tokens).transpose(2, 0, 1, 3)

            out = flash_attention_t(split_t(q, l), split_t(k, lkv),
                                    split_t(v, lkv))     # (n, H, d, l)
            out = out.transpose(1, 2, 0, 3).reshape(self.dim, n * l)
            return ChwDense(self.dim, quant=self.quant, dtype=self.dtype,
                            name="proj")(out)

        n, l, c = x.shape

        q = _dense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="q")(x)

        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio
            kv_in = x.reshape(n, h, w, c)
            kv_in = nn.Conv(self.dim, (r, r), strides=(r, r),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="sr")(kv_in)
            kv_in = kv_in.reshape(n, -1, self.dim)
            kv_in = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                                 name="sr_norm")(kv_in).astype(self.dtype)
        k = _dense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="k")(kv_in)
        v = _dense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="v")(kv_in)

        def split(t):
            return t.reshape(n, t.shape[1], self.num_heads,
                             head_dim).transpose(0, 2, 1, 3)

        if train or self.xla_attention:
            # pallas_call has no JVP rule — the training path uses the
            # naive XLA attention (differentiable; the O(L·Lkv) score
            # tensor is affordable because the SR conv keeps Lkv small).
            # Inference keeps the Pallas kernel, except under
            # ``xla_attention`` (spatial partitioning, see field note).
            out = attention_reference(split(q), split(k), split(v))
        else:
            out = flash_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(n, l, self.dim)
        return _dense(self.dim, quant=self.quant, dtype=self.dtype,
                      name="proj")(out)


class MixFFN(nn.Module):
    """SegFormer's FFN with a 3x3 depthwise conv instead of pos-encoding.

    ``exact_gelu``: use the erf GELU (the official implementation's
    ``nn.GELU()``) instead of flax's default tanh approximation — only
    matters when pouring torch checkpoints (convert/torch_segformer.py).
    """

    dim: int
    expansion: int = 4
    dtype: Any = jnp.bfloat16
    quant: bool = False
    exact_gelu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, hw: Tuple[int, int],
                 chw_n: Optional[int] = None) -> jax.Array:
        h, w = hw
        hidden = self.dim * self.expansion
        if chw_n is not None:
            y = ChwDense(hidden, quant=self.quant, dtype=self.dtype,
                         name="fc1")(x)
            y = ChwDepthwise3x3(hidden, dtype=self.dtype,
                                name="dwconv")(y, (chw_n, h, w))
            y = nn.gelu(y, approximate=not self.exact_gelu)
            return ChwDense(self.dim, quant=self.quant, dtype=self.dtype,
                            name="fc2")(y)
        n, l, c = x.shape
        y = _dense(hidden, quant=self.quant, dtype=self.dtype,
                   name="fc1")(x)
        y = y.reshape(n, h, w, hidden)
        y = nn.Conv(hidden, (3, 3), padding="SAME",
                    feature_group_count=hidden, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dwconv")(y)
        y = y.reshape(n, l, hidden)
        y = nn.gelu(y, approximate=not self.exact_gelu)
        return _dense(self.dim, quant=self.quant, dtype=self.dtype,
                      name="fc2")(y)


class Block(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.bfloat16
    quant: bool = False
    exact_gelu: bool = False
    xla_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, hw: Tuple[int, int],
                 chw_n: Optional[int] = None,
                 train: bool = False) -> jax.Array:
        if chw_n is not None:
            def ln(t, name):
                return ChwLayerNorm(self.dim, dtype=self.dtype,
                                    name=name)(t)
        else:
            def ln(t, name):
                return nn.LayerNorm(dtype=jnp.float32,
                                    param_dtype=jnp.float32,
                                    name=name)(t).astype(self.dtype)
        x = x + EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                                   dtype=self.dtype, quant=self.quant,
                                   xla_attention=self.xla_attention,
                                   name="attn")(ln(x, "norm1"), hw,
                                                chw_n=chw_n, train=train)
        x = x + MixFFN(self.dim, dtype=self.dtype, quant=self.quant,
                       exact_gelu=self.exact_gelu,
                       name="ffn")(ln(x, "norm2"), hw, chw_n=chw_n)
        return x


# MiT backbone size presets (Xie et al., 2021, table 1).  All share the
# head counts (1, 2, 5, 8) and spatial-reduction ratios (8, 4, 2, 1).
SEGFORMER_PRESETS = {
    "b0": dict(widths=(32, 64, 160, 256), depths=(2, 2, 2, 2),
               decoder_dim=256),
    "b1": dict(widths=(64, 128, 320, 512), depths=(2, 2, 2, 2),
               decoder_dim=256),
    "b2": dict(widths=(64, 128, 320, 512), depths=(3, 4, 6, 3),
               decoder_dim=768),
    "b3": dict(widths=(64, 128, 320, 512), depths=(3, 4, 18, 3),
               decoder_dim=768),
}


class SegFormer(nn.Module):
    """MiT-scale hierarchical transformer + all-MLP decode head.

    Defaults are the B0 configuration; ``SegFormer.preset("b2")`` (or the
    ``segformer_b2`` engine name) selects a larger MiT backbone from
    :data:`SEGFORMER_PRESETS`.

    Input (N, H, W, 3) float NHWC (H, W divisible by 32); output
    (N, H, W, num_classes) float32 logits.
    """

    num_classes: int = 15
    widths: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    decoder_dim: int = 256
    dtype: Any = jnp.bfloat16
    quant: bool = False
    # Inference-only layout choice: run the first ``chw_stages`` stages
    # entirely in the transposed (C, pixels) orientation — embed, both
    # LayerNorms, q/k/v/proj, SR conv, Mix-FFN and the Pallas attention
    # kernel (flash_attention_t) — with ONE transpose back per stage at
    # the norm{s} boundary.  The high-res few-channel stages are where
    # NHWC wastes the machine (PERF.md round-3 roadmap); same math,
    # same variable tree, A/B-able per stage.  Training keeps NHWC.
    # Measured on the bench v5e, B0@1024²: 10.85 / 8.89 / 6.88 / 5.65 /
    # 5.28 ms at chw_stages = 0..4 — monotone, so default all-stages.
    chw_stages: int = 4
    # With all four stages transposed, keep the DECODE HEAD transposed
    # too: stage outputs feed k3s2 embeds via a CHW space-to-depth
    # (never transposing back), linear_c/fuse/BN/classifier run in
    # (C, pixels) form, and the 4x-decoder_dim fuse computes as a sum
    # of per-part matmuls with NO 128 MB concat.  One transpose at the
    # tiny (classes, H/4*W/4) end.  The per-stage breakdown put 2.93 of
    # B0's 5.31 ms in embeds+head (PERF.md round 3b).
    chw_head: bool = True
    # "full" (default): logits bilinearly upsampled to input resolution —
    # the textbook SegFormer head and the parity semantics.  "quarter":
    # return logits at the head's native 1/4 resolution and let the
    # consumer argmax there (Engine/Pipeline then nearest-replicate the
    # uint8 LABELS to input res) — skips the f32 ×4 logits upsample
    # (~63 MB HBM write at 1024², 0.77 ms) and shrinks the argmax read
    # 16x.  Differs from "full" only where bilinear blending flips the
    # argmax near class boundaries (the same trade as the grid's
    # interpolation="native"); engine name suffix ``_q``.
    head_upsample: str = "full"
    # Official-implementation compatibility (NVlabs SegFormer / HF
    # transformers): centered (k//2) patch-embed padding and exact erf
    # GELU instead of this repo's SAME + tanh-approx conventions.  Same
    # parameter tree; required for poured torch checkpoints
    # (convert/torch_segformer.py) to reproduce the official numerics —
    # under "same" padding the embed receptive fields are shifted one
    # pixel and real weights lose accuracy silently.
    torch_compat: bool = False
    # SPMD-partitionable inference: force the stock NHWC layout (no CHW
    # stages/head) and the XLA attention path so GSPMD can row-shard the
    # whole forward under a spatial mesh — pallas_call and the
    # transposed (C, pixels) layout both block sharding propagation.
    # Same parameter tree as the default configuration (the CHW/stock
    # paths are layout twins); parallel.spatial.shard_engine_spatial
    # clones the module with this flag, single-chip serving keeps the
    # Pallas kernel.
    xla_attention: bool = False
    # CHW-head part-sum strategy.  False (textbook): every stage's
    # projected part is upsampled straight to 1/4 res and the four
    # full-res (dd, 65536-token) parts are summed — at B2/B3's dd=768
    # that is 4 x 100 MB of bf16 HBM writes plus the 400 MB re-read by
    # the sum.  True: sum CASCADED from the smallest stage up
    # (acc = up2(acc) + part_s), touching each resolution once —
    # ~160 MB total, a pure bandwidth win.  Numerics: up2∘up2 is not
    # bit-equal to up4 for pixel-center bilinear (values interpolated
    # ACROSS an original knot get smoothed by one extra lerp), so this
    # is a budgeted variant, not a parity twin — engine suffix "_hc",
    # label flips budgeted in tests/test_models.py; OFF for
    # torch-compat pours (official numerics).
    head_cascade: bool = False

    @classmethod
    def preset(cls, size: str, **overrides) -> "SegFormer":
        """Build a B0/B1/B2/B3 variant by name."""
        kw = dict(SEGFORMER_PRESETS[size.lower()])
        kw.update(overrides)
        return cls(**kw)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim != 4 or x.shape[1] % 32 or x.shape[2] % 32:
            raise ValueError(
                f"SegFormer needs NHWC input with H, W divisible by 32 "
                f"(4 stages of patch merging); got {x.shape}")
        if self.head_upsample not in ("full", "quarter"):
            raise ValueError(
                f"head_upsample must be 'full' or 'quarter', "
                f"got {self.head_upsample!r}")
        dt = self.dtype
        x = x.astype(dt)
        n, h0, w0, _ = x.shape

        chw_ok = not (train or self.xla_attention)
        full_chw = chw_ok and self.chw_stages >= 4 and self.chw_head
        if self.head_cascade and not train and not full_chw:
            # Never a silent no-op: the cascade is implemented only in
            # the transposed head (where the fuse is folded into
            # linear_c and the part-sum exists).  Training ignores
            # inference-layout flags by design, like chw_stages.
            raise ValueError(
                "head_cascade requires the fully-transposed head "
                "(chw_stages=4, chw_head=True, not xla_attention); "
                "spatial serving drops it explicitly — "
                "parallel/spatial.py")
        epad = "torch" if self.torch_compat else "same"
        egelu = self.torch_compat

        feats = []      # NHWC (stock / partial-chw path)
        feats_t = []    # (xt, (h, w)) — fully-transposed path
        h, w = h0, w0
        for s in range(4):
            k, stride = (7, 4) if s == 0 else (3, 2)
            h, w = h // stride, w // stride
            c = self.widths[s]
            chw = chw_ok and s < self.chw_stages
            if chw:
                if full_chw and s > 0:
                    # previous stage left xt transposed: CHW-in embed
                    xt = OverlapPatchEmbed(
                        c, k, stride, dtype=dt, pad=epad,
                        name=f"embed{s}")(
                            xt, chw_in_nhw=(n, h * stride, w * stride))
                else:
                    xt = OverlapPatchEmbed(c, k, stride, dtype=dt,
                                           pad=epad,
                                           name=f"embed{s}")(x,
                                                             chw_out=True)
                for b in range(self.depths[s]):
                    xt = Block(c, self.num_heads[s], self.sr_ratios[s],
                               dtype=dt, quant=self.quant,
                               exact_gelu=egelu,
                               name=f"stage{s}_block{b}")(xt, (h, w),
                                                          chw_n=n)
                xt = ChwLayerNorm(c, dtype=dt, name=f"norm{s}")(xt)
                if full_chw:
                    feats_t.append((xt, (h, w)))
                else:
                    # The single relayout of the stage: back to NHWC
                    # for the next embed and the decode head.
                    x = xt.T.reshape(n, h, w, c)
                    feats.append(x)
            else:
                x = OverlapPatchEmbed(c, k, stride, dtype=dt,
                                      pad=epad, name=f"embed{s}")(x)
                x = x.reshape(n, h * w, c)
                for b in range(self.depths[s]):
                    x = Block(c, self.num_heads[s], self.sr_ratios[s],
                              dtype=dt, quant=self.quant,
                              exact_gelu=egelu,
                              xla_attention=self.xla_attention,
                              name=f"stage{s}_block{b}")(x, (h, w),
                                                         train=train)
                x = nn.LayerNorm(dtype=jnp.float32,
                                 param_dtype=jnp.float32,
                                 name=f"norm{s}")(x).astype(dt)
                x = x.reshape(n, h, w, c)
                feats.append(x)

        if full_chw:
            # Transposed all-MLP head: per-stage projection, CHW-form
            # bilinear upsample to 1/4 res, concat-free split fuse, BN,
            # classifier — one transpose at (classes, H/4*W/4).  The
            # final ×4 stays jax.image.resize in NHWC: a measured A/B of
            # four strategies (NHWC resize 0.77 ms / CHW resize+T 0.79 /
            # CHW phase-blend+T 1.07 / phase-channels+d2s 2.00 — PERF.md
            # round 3b) showed the phase-decomposed upsample loses to
            # resize-as-matmul here (the lane-dim interleave relayout
            # dominates), so ops/resize.upsample_bilinear_int is NOT
            # used on this path.
            th, tw = feats_t[0][1]
            dd = self.decoder_dim
            # Fold the fuse into each linear_c: the stock head is
            # linear_c → bilinear up → concat → bias-free 1×1 fuse, all
            # linear with no activation between, so
            # fuse(concat(up(proj_s)))  ==  Σ_s up((W_p_s @ W_f_s) x_s)
            # — the fuse's per-part (dd, dd) matmul moves from 1/4 res
            # (4 × H/4·W/4 tokens: 309 GFLOP of B2@1024²'s head, 47% of
            # the forward) into the weight composition, a ~1 GFLOP
            # (C_s, dd) @ (dd, dd) per dispatch.  Kernel layout: the
            # fuse kernel is in concat(parts[::-1]) order (stage 3
            # first), so stage s takes rows (3-s)·dd:(4-s)·dd.  Param
            # tree unchanged (ChwConv1x1 param-only mode).  Same math,
            # float-tie-level numerics (tests budget it).
            w_fuse = ChwConv1x1(dd, use_bias=False, dtype=dt,
                                in_features=4 * dd, name="fuse")(None)
            parts = []
            for s, (ft, (hs, ws)) in enumerate(feats_t):
                fold = w_fuse[(3 - s) * dd:(4 - s) * dd]
                p = ChwDense(dd, quant=self.quant, dtype=dt,
                             name=f"linear_c{s}")(ft, fold=fold)
                parts.append((p, (hs, ws)))
            if self.head_cascade:
                # Smallest stage up: acc = up2(acc) + part, touching
                # each resolution's (dd, tokens) buffer once (see the
                # head_cascade field note for the bandwidth arithmetic
                # and the budgeted up2∘up2-vs-up4 numerics).
                acc = None
                for s in (3, 2, 1, 0):
                    p, (hs, ws) = parts[s]
                    p = p.reshape(dd, n, hs, ws)
                    acc = p if acc is None else p + jax.image.resize(
                        acc, (dd, n, hs, ws), method="bilinear")
                y = acc.reshape(dd, n * th * tw).astype(dt)
            else:
                y = None
                for p, (hs, ws) in parts:
                    if (hs, ws) != (th, tw):
                        p = jax.image.resize(
                            p.reshape(dd, n, hs, ws),
                            (dd, n, th, tw), method="bilinear")
                    p = p.reshape(dd, n * th * tw).astype(dt)
                    y = p if y is None else y + p
            y = ChwBatchNorm(self.decoder_dim, epsilon=1e-5, dtype=dt,
                             name="fuse_bn")(y)
            y = nn.relu(y)
            y = ChwConv1x1(self.num_classes, use_bias=True, dtype=dt,
                           name="classifier")(y)
            y = y.T.reshape(n, th, tw, self.num_classes)
            if self.head_upsample == "quarter":
                return y.astype(jnp.float32)
            return jax.image.resize(
                y.astype(jnp.float32), (n, h0, w0, self.num_classes),
                method="bilinear")

        # All-MLP head: project every stage to decoder_dim, upsample to 1/4,
        # concat, fuse, classify.
        target_hw = (feats[0].shape[1], feats[0].shape[2])
        proj = []
        for s, f in enumerate(feats):
            p = _dense(self.decoder_dim, quant=self.quant, dtype=dt,
                       name=f"linear_c{s}")(f)
            if p.shape[1:3] != target_hw:
                p = jax.image.resize(
                    p, (n, target_hw[0], target_hw[1], self.decoder_dim),
                    method="bilinear")
            proj.append(p.astype(dt))
        y = jnp.concatenate(proj[::-1], axis=-1)
        y = nn.Conv(self.decoder_dim, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32, name="fuse")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt,
                         param_dtype=jnp.float32, name="fuse_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                    param_dtype=jnp.float32, name="classifier")(y)
        if self.head_upsample == "quarter" and not train:
            return y.astype(jnp.float32)
        return jax.image.resize(
            y.astype(jnp.float32), (n, h0, w0, self.num_classes),
            method="bilinear")


__all__ = ["SegFormer", "SEGFORMER_PRESETS", "EfficientAttention", "MixFFN",
           "OverlapPatchEmbed"]
