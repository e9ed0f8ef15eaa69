"""Stride-2 (de)convolutions as dense stride-1 convs + space/depth moves.

TPU rationale: XLA lowers a stride-2 transposed conv via input dilation
(zeros between every pixel) and a stride-2 forward conv by marching the
MXU over a strided window — both waste the systolic array on zeros /
small contraction dims.  The same math reshapes into a *dense* stride-1
conv over phase-packed channels:

- ``ConvTranspose(C, (3,3), strides=2, SAME)``  ==  2x2 conv producing
  4C phase channels, then depth-to-space.  Derivation (verified against
  ``lax.conv_transpose``): ``y[2p+r] = sum_a x[p-1+a] * W[2a-r]``.
- ``ConvTranspose(C, (2,2), strides=2, SAME)``  ==  1x1 conv to 4C
  channels + depth-to-space: ``y[2p+r] = W[1-r] @ x[p]`` (no overlap).
- ``Conv(C, (3,3), strides=2, SAME)``  ==  space-to-depth (2x2 phase
  pack, 4x channels) then a 2x2 stride-1 conv:
  ``y[p] = sum_i x[2p+i-1] W[i]`` with ``i = 2a+r-1``.

The modules below compute exactly that while exposing the **identical
parameter tree** as their stock Flax counterparts (param names ``kernel``
/ ``bias``, shapes ``(kh, kw, Cin, Cout)``) — converted reference weights
(convert/tf_graphdef.py), checkpoints, and the training path all work
unchanged; the kernel re-indexing is a few-microsecond reshape of the
small weight tensor inside the jitted program.

Replaces the work the reference delegates to cuDNN's transposed-conv
kernels (reference models.py:14-95's frozen ENet decoder; SURVEY.md §7
"unpooling ... nastiest op").
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import initializers
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x: jax.Array) -> jax.Array:
    """(N, H, W, C) → (N, H/2, W/2, 4C); channel layout (row-phase,
    col-phase, C) with row-phase major."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


class FastConvTranspose2x(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, (k, k), strides=(2, 2),
    padding='SAME')`` with ``k`` in {2, 3}; same param tree, computed as a
    stride-1 conv over phase channels + depth-to-space."""

    features: int
    kernel: int = 3
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, phase_out: bool = False) -> jax.Array:
        """``phase_out=True`` returns the pre-depth-to-space phase tensor
        (N, H, W, 4*features), channel layout (row-phase, col-phase, c) —
        lets a caller keep computing in the packed domain (see the ENet
        up-bottleneck phase path, models/enet.py) and defer the relayout."""
        if self.kernel not in (2, 3):
            raise ValueError(f"kernel must be 2 or 3, got {self.kernel}")
        cin = x.shape[-1]
        k = self.kernel
        kernel = self.param("kernel", initializers.lecun_normal(),
                            (k, k, cin, self.features), jnp.float32)

        if k == 3:
            # W2[a, b, ci, (r,s), co] = W[2a-r, 2b-s] (0 when out of range)
            wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            rows = []
            for a in (0, 1):
                cols = []
                for b in (0, 1):
                    blocks = [wp[2 * a - r + 1, 2 * b - s + 1]
                              for r in (0, 1) for s in (0, 1)]
                    cols.append(jnp.stack(blocks, axis=0))  # (4, ci, co)
                rows.append(jnp.stack(cols, axis=0))        # (2, 4, ci, co)
            w2 = jnp.stack(rows, axis=0)                    # (2, 2, 4, ci, co)
            w2 = w2.transpose(0, 1, 3, 2, 4).reshape(
                2, 2, cin, 4 * self.features)
            pad = ((1, 0), (1, 0))
        else:
            # Non-overlapping: y[2p+r, 2q+s] = W[1-r, 1-s] @ x[p, q]
            blocks = [kernel[1 - r, 1 - s] for r in (0, 1) for s in (0, 1)]
            w2 = jnp.stack(blocks, axis=0)                  # (4, ci, co)
            w2 = w2.transpose(1, 0, 2).reshape(1, 1, cin, 4 * self.features)
            pad = ((0, 0), (0, 0))

        z = lax.conv_general_dilated(
            x.astype(self.dtype), w2.astype(self.dtype), (1, 1), pad,
            dimension_numbers=_DN)
        if phase_out:
            if self.use_bias:
                bias = self.param("bias", initializers.zeros_init(),
                                  (self.features,), jnp.float32)
                z = z + jnp.tile(bias, 4).astype(z.dtype)
            return z
        y = depth_to_space(z)
        if self.use_bias:
            bias = self.param("bias", initializers.zeros_init(),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class FastStemConv2x(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), strides=(2, 2),
    padding='SAME', use_bias=False)``; same param tree, computed as
    space-to-depth + a dense 2x2 stride-1 conv (contraction 4*Cin instead
    of a strided 3x3 over Cin — matters when Cin is tiny, e.g. the RGB
    stem, reference models.py:19's 512x256x3 input).

    ``pad="torch"`` computes the CENTERED convention instead —
    ``torch.nn.Conv2d(..., padding=1)``, i.e. ``y[p] = Σ_i x[2p+i-1]
    W[i]`` (the official SegFormer overlapped patch embeds) — by
    flipping the pad side of both the weight fold and the phase map:
    taps address blocks ``p-1+a`` with coefficient ``W[2a+r-1]``, so
    ``wp`` lo-pads and the s2d map lo-pads, and the slicing code is
    shared with the SAME path."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    pad: str = "same"

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False,
                 chw_out: bool = False,
                 chw_in_nhw: Optional[Tuple[int, int, int]] = None
                 ) -> jax.Array:
        """``packed=True`` takes the space-to-depth tensor (N, H/2, W/2,
        4*Cin) directly (lets the caller share one s2d).  ``chw_out=True``
        returns the TRANSPOSED result (features, N*H/2*W/2) — channels on
        sublanes, pixels on lanes — the orientation in which a
        few-channel conv actually fills the MXU (measured 8.7 vs 51.5 us
        for the RGB stem on the bench v5e, PERF.md round 2b).
        ``chw_in_nhw=(n, h, w)``: x is already TRANSPOSED (Cin, N*H*W);
        the space-to-depth happens by pure reshapes of the CHW tensor
        and the output is transposed too (a fully-(C, pixels) SegFormer
        stage chain never leaves the orientation)."""
        if self.pad not in ("same", "torch"):
            raise ValueError(f"pad must be 'same' or 'torch', "
                             f"got {self.pad!r}")
        # SAME (even dims) lo-pads nothing: y[p] = Σ x[2p+i] W[i]; torch
        # (padding=1) centers: y[p] = Σ x[2p+i-1] W[i].  Both reduce to
        # the same 2x2-tap code with the pad side of the weight fold AND
        # the phase map flipped (see the class docstring derivation).
        pads = (1, 0) if self.pad == "torch" else (0, 1)
        if chw_in_nhw is not None:
            n, h, w = chw_in_nhw
            cin = x.shape[0]
            h2, w2 = h // 2, w // 2
            kernel = self.param("kernel", initializers.lecun_normal(),
                                (3, 3, cin, self.features), jnp.float32)
            wp = jnp.pad(kernel, (pads, pads, (0, 0), (0, 0)))
            rows = []
            for a in (0, 1):
                cols = []
                for b in (0, 1):
                    blocks = [wp[2 * a + r, 2 * b + s]
                              for r in (0, 1) for s in (0, 1)]
                    cols.append(jnp.stack(blocks, axis=0))   # (4, ci, co)
                rows.append(jnp.stack(cols, axis=0))
            w2k = jnp.stack(rows, axis=0)                # (2, 2, 4, ci, co)
            wt = w2k.reshape(16 * cin, self.features).T  # (co, (a,b,r,s,ci))
            # CHW s2d: (r, s, c) channel order matching the NHWC layout.
            x6 = x.reshape(cin, n, h2, 2, w2, 2)
            xp4 = x6.transpose(3, 5, 0, 1, 2, 4).reshape(4 * cin, n, h2, w2)
            cp = jnp.pad(xp4, ((0, 0), (0, 0), pads, pads))
            taps = [cp[:, :, a:a + h2, b:b + w2]
                    for a in (0, 1) for b in (0, 1)]
            xcat = jnp.concatenate(taps, axis=0).reshape(16 * cin,
                                                         n * h2 * w2)
            y = lax.dot(wt.astype(self.dtype), xcat.astype(self.dtype),
                        preferred_element_type=jnp.float32)
            y = y.astype(self.dtype)
            if self.use_bias:
                bias = self.param("bias", initializers.zeros_init(),
                                  (self.features,), jnp.float32)
                y = y + bias.astype(y.dtype)[:, None]
            return y                                     # (co, N*H2*W2)

        if not packed and (x.shape[1] % 2 or x.shape[2] % 2):
            raise ValueError(
                f"FastStemConv2x needs even H, W (SAME pad_lo is 0 only "
                f"then); got {x.shape}")
        xp = x if packed else space_to_depth(x)
        cin = xp.shape[-1] // 4
        kernel = self.param("kernel", initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        # Even input ⇒ SAME pad is (0, 1): y[p] = sum_i x[2p+i] W[i], so
        # W2[a, b, (r,s,ci), co] = W[2a+r, 2b+s] (0 when out of range);
        # torch pad=1 shifts the fold to W[2a+r-1] via the lo-padded wp.
        wp = jnp.pad(kernel, (pads, pads, (0, 0), (0, 0)))
        rows = []
        for a in (0, 1):
            cols = []
            for b in (0, 1):
                blocks = [wp[2 * a + r, 2 * b + s]
                          for r in (0, 1) for s in (0, 1)]
                cols.append(jnp.stack(blocks, axis=0))      # (4, ci, co)
            rows.append(jnp.stack(cols, axis=0))            # (2, 4, ci, co)
        w2 = jnp.stack(rows, axis=0)                        # (2, 2, 4, ci, co)
        w2 = w2.reshape(2, 2, 4 * cin, self.features)

        if chw_out:
            n, h, w, c4 = xp.shape
            cp = jnp.pad(xp, ((0, 0), pads, pads, (0, 0)))
            taps = [cp[:, a:a + h, b:b + w, :] for a in (0, 1)
                    for b in (0, 1)]
            x16 = jnp.concatenate(taps, axis=-1)        # (n, h, w, 4*c4)
            xt = x16.reshape(n * h * w, 4 * c4).T       # (4*c4, NHW)
            wt = w2.transpose(3, 0, 1, 2).reshape(self.features, 4 * c4)
            y = lax.dot(wt.astype(self.dtype), xt.astype(self.dtype),
                        preferred_element_type=jnp.float32)
            y = y.astype(self.dtype)                    # (features, NHW)
            if self.use_bias:
                bias = self.param("bias", initializers.zeros_init(),
                                  (self.features,), jnp.float32)
                y = y + bias.astype(y.dtype)[:, None]
            return y

        y = lax.conv_general_dilated(
            xp.astype(self.dtype), w2.astype(self.dtype),
            (1, 1), (pads, pads), dimension_numbers=_DN)
        if self.use_bias:
            bias = self.param("bias", initializers.zeros_init(),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def space_to_depth4(x: jax.Array) -> jax.Array:
    """(N, H, W, C) → (N, H/4, W/4, 16C); channel layout (row-phase,
    col-phase, C), phases row-major 0..3."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 4, 4, w // 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 4, w // 4, 16 * c)


class FastStemConv4x(nn.Module):
    """Drop-in for ``nn.Conv(features, (7, 7), strides=(4, 4),
    padding='SAME')`` (H, W divisible by 4): a 3x3 stride-1 conv over the
    4x4 space-to-depth phases.  Exact derivation: with ``X[q, r] =
    x[4q+r]``, ``y[p] = Σ_i x[4p+i-1] W[i]`` becomes ``Σ_{a,r}
    X[p+a, r] W[4a+r+1]`` with a ∈ {-1,0,1} — i.e. W2[a, b, (r,s,ci),
    co] = W[4a+r+1, 4b+s+1] (zero out of range) under SAME (1,1)
    padding, reproducing the original pad-lo-1/hi-2 exactly.  Same param
    tree as the stock conv.  This is SegFormer's stage-1 overlapped patch
    embed (models/segformer.py), a measured 1.3 ms hotspot on RGB at
    1024² (PERF.md).

    ``pad="torch"`` computes ``torch.nn.Conv2d(..., padding=3)`` (the
    official SegFormer convention) instead: ``y[p] = Σ_i x[4p+i-3]
    W[i]`` reads s2d4 blocks ``p-1+a`` with coefficient ``W[4a+r-1]``,
    a ∈ {0, 1} — because 7 = 4+3 aligns the centered window to the
    phase boundary, the fold needs only 2x2 taps (vs SAME's 3x3) over
    the lo-padded phase map."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    pad: str = "same"

    @nn.compact
    def __call__(self, x: jax.Array, chw_out: bool = False) -> jax.Array:
        """``chw_out=True`` returns the TRANSPOSED result (features,
        N*H/4*W/4) via a 9-tap concat + one dense matmul — the dot folds
        the transpose, so a (C, pixels)-layout consumer (the CHW
        SegFormer stage 1) starts transposed for free (cf.
        FastStemConv2x.chw_out; PERF.md round 2b)."""
        if x.shape[1] % 4 or x.shape[2] % 4:
            raise ValueError(
                f"FastStemConv4x needs H, W divisible by 4; got {x.shape}")
        if self.pad not in ("same", "torch"):
            raise ValueError(f"pad must be 'same' or 'torch', "
                             f"got {self.pad!r}")
        cin = x.shape[-1]
        kernel = self.param("kernel", initializers.lecun_normal(),
                            (7, 7, cin, self.features), jnp.float32)
        if self.pad == "torch":
            # W2[a, b, (r, s, ci), co] = W[4a+r-1, 4b+s-1], a ∈ {0, 1}
            # (blocks p-1+a, see the class docstring); lo-padded wp
            # zeroes the one out-of-range tap W[-1].
            wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            taps_ab = (0, 1)
            data_pads = (1, 0)

            def wblock(a, r, b, s):
                return wp[4 * a + r, 4 * b + s]
        else:
            # W2[a, b, (r, s, ci), co] = W[4a+r-3, 4b+s-3] (SAME lo=1);
            # wp's lo-pad 1 makes that wp[4a+r-2].
            wp = jnp.pad(kernel, ((1, 4), (1, 4), (0, 0), (0, 0)))
            taps_ab = (0, 1, 2)                # a-1 ∈ {-1, 0, 1}
            data_pads = (1, 1)

            def wblock(a, r, b, s):
                if 0 <= 4 * a + r - 2 < 11 and 0 <= 4 * b + s - 2 < 11:
                    return wp[4 * a + r - 2, 4 * b + s - 2]
                return jnp.zeros_like(kernel[0, 0])
        nt = len(taps_ab)
        rows = []
        for a in taps_ab:
            cols = []
            for b in taps_ab:
                blocks = [wblock(a, r, b, s)
                          for r in range(4) for s in range(4)]
                cols.append(jnp.stack(blocks, axis=0))   # (16, ci, co)
            rows.append(jnp.stack(cols, axis=0))         # (nt, 16, ci, co)
        w2 = jnp.stack(rows, axis=0)                   # (nt, nt, 16, ci, co)
        w2 = w2.reshape(nt, nt, 16 * cin, self.features)

        if chw_out:
            xp4 = space_to_depth4(x)
            n, h4, w4, c16 = xp4.shape
            cp = jnp.pad(xp4, ((0, 0), data_pads, data_pads, (0, 0)))
            taps = [cp[:, a:a + h4, b:b + w4, :]
                    for a in range(nt) for b in range(nt)]
            xcat = jnp.concatenate(taps, axis=-1)   # (n, h4, w4, nt²*c16)
            xt = xcat.reshape(n * h4 * w4, nt * nt * c16).T
            wt = w2.reshape(nt * nt * c16, self.features).T
            y = lax.dot(wt.astype(self.dtype), xt.astype(self.dtype),
                        preferred_element_type=jnp.float32)
            y = y.astype(self.dtype)                    # (features, N*H4*W4)
            if self.use_bias:
                bias = self.param("bias", initializers.zeros_init(),
                                  (self.features,), jnp.float32)
                y = y + bias.astype(y.dtype)[:, None]
            return y

        y = lax.conv_general_dilated(
            space_to_depth4(x).astype(self.dtype), w2.astype(self.dtype),
            (1, 1), (data_pads, data_pads), dimension_numbers=_DN)
        if self.use_bias:
            bias = self.param("bias", initializers.zeros_init(),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class FastDownConv2x(nn.Module):
    """Drop-in for ``nn.Conv(features, (2, 2), strides=(2, 2),
    padding='SAME', use_bias=False)`` (even H, W ⇒ SAME adds no padding);
    same param tree, computed as space-to-depth + a 1x1 dense conv.

    A 2x2/stride-2 conv has non-overlapping windows, so it is EXACTLY a
    1x1 conv over the phase-packed channels: ``y[p,q] = Σ_{r,s}
    x[2p+r, 2q+s] W[r,s]`` and the s2d channel order (row-phase major)
    matches ``kernel.reshape(4*cin, cout)`` directly.  This is the
    projection conv of every ENet "down" bottleneck
    (models/enet.py:166-168), where XLA's strided lowering over 16-64
    channels was a measured hotspot (PERF.md round 2b)."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(
                f"FastDownConv2x needs even H, W; got {x.shape}")
        cin = x.shape[-1]
        kernel = self.param("kernel", initializers.lecun_normal(),
                            (2, 2, cin, self.features), jnp.float32)
        w2 = kernel.reshape(1, 1, 4 * cin, self.features)
        y = lax.conv_general_dilated(
            space_to_depth(x).astype(self.dtype), w2.astype(self.dtype),
            (1, 1), ((0, 0), (0, 0)), dimension_numbers=_DN)
        if self.use_bias:
            bias = self.param("bias", initializers.zeros_init(),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class S2d4StemConv2x(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), strides=(2, 2),
    padding='SAME', use_bias=False)`` over H, W divisible by 4: 4x4
    space-to-depth, then a 2x2-tap dense matmul emitting the four
    output phases, then depth-to-space.

    Derivation (even dims ⇒ SAME pads (0, 1)): ``y[o] = Σ_i x[2o+i] W[i]``
    with ``o = 2q + u`` (q the 4-block, u the output phase) reads input
    rows ``4q + 2u + i = 4q' * 4 + t``, i.e. s2d4 phase ``t = 2u + i``
    of block ``q + (t >> 2)`` — a 2-tap conv per axis.  The weight
    lands as a (16·Cin per tap → 4·features) matrix: rows ordered
    (a, b, ry, rx, ci), columns (uy, ux, co); entry ``W[4a + ry - 2uy,
    4b + rx - 2ux]`` where in range, else zero.

    Why: the RGB stem's NHWC tensor has 3 channels on 128 lanes; every
    reformulation that *re-touches* it (s2d to 12ch, CHW transpose,
    phase chains) measured SLOWER than XLA's stock conv at (512, 1024)
    — but packing straight to 48 channels with ONE reshape and doing
    the conv as a single (HW/16, 192)@(192, 4·Cout) matmul measured
    0.489 → 0.363 ms on the bench v5e (scripts/bench_entry3.py;
    parity-exact).  Same param tree as the stock conv; the reference's
    few-channel entry convs are reference models.py:98-113 (Xception
    conv1_1) and models.py:100 (DeepLab stem).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.shape[1] % 4 or x.shape[2] % 4:
            raise ValueError(
                f"S2d4StemConv2x needs H, W divisible by 4; got {x.shape}")
        n, h, w, cin = x.shape
        hq, wq = h // 4, w // 4
        kernel = self.param("kernel", initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        kb = kernel.astype(self.dtype)
        zero = jnp.zeros((cin, self.features), self.dtype)
        rows = []
        for a in (0, 1):
            for b in (0, 1):
                for ry in range(4):
                    for rx in range(4):
                        cols = []
                        for uy in (0, 1):
                            for ux in (0, 1):
                                iy = 4 * a + ry - 2 * uy
                                ix = 4 * b + rx - 2 * ux
                                cols.append(kb[iy, ix]
                                            if 0 <= iy < 3 and 0 <= ix < 3
                                            else zero)
                        rows.append(jnp.concatenate(cols, axis=-1))
        wm = jnp.stack(rows, 0).reshape(64 * cin, 4 * self.features)

        xp4 = space_to_depth4(x)                      # (n, hq, wq, 16c)
        xpp = jnp.pad(xp4, ((0, 0), (0, 1), (0, 1), (0, 0)))
        taps = [xpp[:, a:a + hq, b:b + wq, :] for a in (0, 1)
                for b in (0, 1)]
        xm = jnp.concatenate(taps, axis=-1).reshape(n * hq * wq, 64 * cin)
        y = lax.dot(xm.astype(self.dtype), wm,
                    preferred_element_type=jnp.float32)
        y = y.reshape(n, hq, wq, 4 * self.features).astype(self.dtype)
        return depth_to_space(y)



class KernelParam(nn.Module):
    """Param-tree twin of ``nn.Conv(..., use_bias=False)``: declares the
    ``kernel`` param (same name/shape/init/dtype) without running the
    conv — lets custom lowerings (fused Pallas sepconv, phase-space
    convs) read the raw weights while checkpoints and converters pour
    in unchanged (the ShiftMatmulConv3x3 tree-compat idiom).  Pass
    ``use_bias=True`` to also declare the matching ``bias``."""

    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", initializers.lecun_normal(),
                            self.shape, jnp.float32)
        if not self.use_bias:
            return kernel
        bias = self.param("bias", initializers.zeros_init(),
                          (self.shape[-1],), jnp.float32)
        return kernel, bias


class FoldedBNParams(nn.Module):
    """Param-tree twin of ``nn.BatchNorm``: same four variables
    (params scale/bias, batch_stats mean/var — identical names, shapes,
    inits), returned pre-folded as the inference (scale, bias) affine
    (ops/pallas/bottleneck.fold_bn algebra)."""

    features: int
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self):
        f = self.features
        scale = self.param("scale", initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", initializers.zeros, (f,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((f,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((f,), jnp.float32))
        k = scale / jnp.sqrt(var.value + self.epsilon)
        return k, bias - mean.value * k


def fold_conv3x3_phase(w: jax.Array) -> jax.Array:
    """Fold a stride-1 SAME (3, 3, Cin, Cout) kernel into the
    (2, 2, 4Cin, 4Cout) kernel that computes the same conv in 2x2 phase
    space (the :func:`space_to_depth` channel layout, phase-major).

    Derivation: with ``P[u, v, (r, s, c)] = X[2u+r, 2v+s, c]`` and
    output phase (a, b), ``Y[2i+a, 2j+b] = Σ_{dy,dx} X[2i+a+dy,
    2j+b+dx] W[dy, dx]`` reads packed rows ``u = a-1+α`` for
    α ∈ {0, 1} (and symmetrically cols), so a single 2x2 VALID conv
    over the 1-padded packed map produces every phase at spatial
    offset (a, b): tap (α, β) of output group (a, b), input group
    (r, s) carries ``W[a-2+2α+r, b-2+2β+s]`` (center-relative; zero
    when outside the 3x3).  9 of the 16 (α, r) x (β, s) combinations
    are live per phase — the 16/9 MAC overhead phase algebra always
    pays, bought back several-fold in MXU lane occupancy when
    Cout < 128 (4Cout lanes instead of Cout; PERF.md round 5e).
    """
    zero = jnp.zeros_like(w[0, 0])

    def blk(alpha, beta, r, s, a, b):
        dy = a - 2 + 2 * alpha + r
        dx = b - 2 + 2 * beta + s
        if -1 <= dy <= 1 and -1 <= dx <= 1:
            return w[dy + 1, dx + 1]
        return zero

    phases = [(0, 0), (0, 1), (1, 0), (1, 1)]
    return jnp.stack([
        jnp.stack([
            jnp.concatenate([
                jnp.concatenate([blk(alpha, beta, r, s, a, b)
                                 for (a, b) in phases], axis=1)
                for (r, s) in phases], axis=0)
            for beta in (0, 1)], axis=0)
        for alpha in (0, 1)], axis=0)


def phase_conv3x3(p: jax.Array, w: jax.Array, dtype) -> jax.Array:
    """Stride-1 SAME 3x3 conv evaluated in 2x2 phase space.

    ``p``: (N, H/2, W/2, 4Cin) packed (:func:`space_to_depth` layout);
    ``w``: the ordinary (3, 3, Cin, Cout) kernel; returns the packed
    (N, H/2, W/2, 4Cout) result — numerically the conv's value, summed
    in the folded order (float-order differs from the NHWC lowering;
    budgeted, not bit-equal).
    """
    n, h2, w2, c4 = p.shape
    cout = w.shape[-1]
    k = fold_conv3x3_phase(w).astype(dtype)
    pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)))
    r = lax.conv_general_dilated(pp.astype(dtype), k, (1, 1), "VALID",
                                 dimension_numbers=_DN)
    parts = []
    for a in (0, 1):
        for b in (0, 1):
            g = a * 2 + b
            parts.append(r[:, a:a + h2, b:b + w2,
                           g * cout:(g + 1) * cout])
    return jnp.concatenate(parts, axis=-1)


def phase_max_pool(p: jax.Array) -> jax.Array:
    """2x2/2 max pool of the UNPACKED map, computed on the packed one:
    the pool window IS the phase block, so the pool is a max over the
    4 phase groups — bit-exact, no depth-to-space needed."""
    n, h2, w2, c4 = p.shape
    return p.reshape(n, h2, w2, 4, c4 // 4).max(axis=3)


class ShiftMatmulConv3x3(nn.Module):
    """Stride-1 3x3 (optionally dilated) conv as nine shift+matmuls.

    XLA's dilated conv lowering runs the ASPP branches (models/deeplab.py
    ASPP, dilation 6/12/18 on a (32, 64, 2048) map) at ~30 TF/s; the
    algebraically identical form

        y = sum_{dy,dx in 3x3}  shift(x, ((dy-1)r, (dx-1)r)) @ W[dy,dx]

    — one zero-pad, nine static slices, nine (pixels, Cin) x (Cin, Cout)
    matmuls — measures ~105-117 TF/s on the bench v5e (3.3-3.8x;
    scripts/bench_dilated.py).  The shifts are free-fusing relayouts and
    each matmul is full-width MXU work.  Same SAME-padding semantics and
    the exact parameter tree of ``nn.Conv(features, (3, 3), use_bias=
    False)`` (param ``kernel``, shape (3, 3, Cin, Cout)), so trained /
    converted weights load unchanged.
    """

    features: int
    dilation: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, cin = x.shape
        kernel = self.param("kernel", initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        ry, rx = self.dilation
        xp = jnp.pad(x, ((0, 0), (ry, ry), (rx, rx), (0, 0)))
        kb = kernel.astype(self.dtype)
        y = None
        for dy in range(3):
            for dx in range(3):
                tap = xp[:, dy * ry:dy * ry + h, dx * rx:dx * rx + w, :]
                t = tap.reshape(n * h * w, cin).astype(self.dtype) @ kb[dy, dx]
                y = t if y is None else y + t
        return y.reshape(n, h, w, self.features)


class DepthwiseConv3x3Shift(nn.Module):
    """Depthwise 3x3 conv as nine per-channel-scaled shifts.

    Drop-in for ``nn.Conv(C, (3, 3), strides, kernel_dilation=(r, r),
    padding='SAME', feature_group_count=C, use_bias=False)`` — the
    depthwise step of Xception separable convs (models/xception.py
    SepConvBN, rebuilding reference models.py:98-113's backbone) and
    MobileNetV2 inverted residuals (models/deeplab.py).  Same param
    tree (``kernel`` (3, 3, 1, C)).

    TPU rationale: a grouped conv has contraction dim 1 — zero MXU
    work, all data movement — and XLA's grouped lowering pads groups
    onto the systolic array.  The identical math is nine VPU
    fused-multiply-adds over statically shifted views:

        y = sum_{dy,dx}  shift(x, ((dy-1)r, (dx-1)r)) * k[dy, dx, :]

    Stride 2 (even dims, dilation 1) runs in phase form: one
    space-to-depth, then the nine taps address the four phase maps at
    static offsets 0/+1 — every op at output resolution, no strided
    windows (cf. FastDownConv2x's derivation above).
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        if c != self.features:
            raise ValueError(f"depthwise needs features == Cin, got "
                             f"{self.features} != {c}")
        kernel = self.param("kernel", initializers.lecun_normal(),
                            (3, 3, 1, self.features), jnp.float32)
        kb = kernel[:, :, 0, :].astype(self.dtype)          # (3, 3, C)
        xb = x.astype(self.dtype)
        ry, rx = self.dilation

        if self.strides == (1, 1):
            xp = jnp.pad(xb, ((0, 0), (ry, ry), (rx, rx), (0, 0)))
            y = None
            for dy in range(3):
                for dx in range(3):
                    t = (xp[:, dy * ry:dy * ry + h, dx * rx:dx * rx + w, :]
                         * kb[dy, dx])
                    y = t if y is None else y + t
            return y

        if (self.strides != (2, 2) or self.dilation != (1, 1)
                or h % 2 or w % 2):
            raise ValueError(
                f"shift depthwise supports stride 1 (any dilation) or "
                f"stride 2 (dilation 1, even dims); got strides="
                f"{self.strides} dilation={self.dilation} map {(h, w)}")
        # SAME stride-2 over even dims pads (0, 1): output o reads input
        # rows 2o+t, t in {0,1,2} -> phase (t&1) at offset (t>>1).  Pad
        # to 2*o+2 so the +1-shifted phase rows exist (the extra row is
        # never multiplied in; it only squares up the reshape).
        oh, ow = h // 2, w // 2
        xp = jnp.pad(xb, ((0, 0), (0, 2), (0, 2), (0, 0)))
        p = space_to_depth(xp).reshape(n, oh + 1, ow + 1, 2, 2, c)
        y = None
        for ty in range(3):
            pr, sy = ty & 1, ty >> 1
            for tx in range(3):
                pc, sx = tx & 1, tx >> 1
                t = (p[:, sy:sy + oh, sx:sx + ow, pr, pc, :]
                     * kb[ty, tx])
                y = t if y is None else y + t
        return y


__all__ = ["FastConvTranspose2x", "FastDownConv2x", "FastStemConv2x",
           "FastStemConv4x", "S2d4StemConv2x", "ShiftMatmulConv3x3",
           "DepthwiseConv3x3Shift", "space_to_depth", "space_to_depth4",
           "depth_to_space"]
