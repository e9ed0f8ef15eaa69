"""Fused separable-conv (dw3x3 → BN → ReLU → pw1x1 → BN [→ ReLU]) kernels.

The Modified-Aligned-Xception sepconv (models/xception.py SepConvBN,
rebuilding the reference's deeplab.pb backbone — reference
models.py:98-136) is the entry/middle-flow workhorse, and XLA lowers it
as two convs with an HBM round-trip of the depthwise intermediate in
between: at entry-flow resolutions that intermediate is a 16-32 MB map
written and re-read per sepconv, and PERF.md round 4b measured the
entry flow at ~7x its input/output traffic bound.  VERDICT r4 #1 asked
for one honest fused attempt.

Here one sepconv = ONE Pallas kernel over row bands: the depthwise 3x3
runs as nine statically-shifted scaled adds out of a zero-padded VMEM
slab (halo rows ride in as precomputed thin edge arrays — Pallas blocks
cannot overlap), the folded depthwise-BN affine + ReLU apply in
registers, and the pointwise 1x1 is an MXU matmul with the folded
pointwise-BN affine (+ optional ReLU) as epilogue.  The depthwise
intermediate never leaves VMEM; HBM traffic drops to one read of x and
one write of the output per band.

Stride support matches the entry flow: (1, 1) and the SAME-padded
(2, 2) of each block's closing sepconv (pad 0 top/left, 1 bottom/right
— the Flax/XLA convention for even H, W; strided slab taps verified on
Mosaic by scripts/probe_mosaic.py).  Dilation is NOT supported (exit
flow keeps the XLA path; ASPP already has ShiftMatmulConv3x3).

BatchNorm is consumed pre-folded (scale, bias) like
ops/pallas/bottleneck.py; matmuls accumulate f32 on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _mm(a: jax.Array, b: jax.Array, dt) -> jax.Array:
    return jax.lax.dot_general(a.astype(dt), b.astype(dt),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _sepconv_kernel_s1(x_ref, top_ref, bot_ref, wdw_ref, s1_ref, b1_ref,
                       wpw_ref, s2_ref, b2_ref, o_ref, slab,
                       *, hb: int, w: int, act_out: bool):
    c = x_ref.shape[-1]
    dt = x_ref.dtype
    slab[:] = jnp.zeros_like(slab)
    slab[1:hb + 1, 1:w + 1, :] = x_ref[:]
    slab[0:1, 1:w + 1, :] = top_ref[:]
    slab[hb + 1:hb + 2, 1:w + 1, :] = bot_ref[:]

    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = slab[dy:dy + hb, dx:dx + w, :].astype(jnp.float32)
            part = tap * wdw_ref[dy * 3 + dx, :]
            acc = part if acc is None else acc + part
    y1 = jnp.maximum(acc * s1_ref[:] + b1_ref[:], 0.0)

    y2 = _mm(y1.reshape(hb * w, c), wpw_ref[:], dt)
    y2 = y2 * s2_ref[:] + b2_ref[:]
    if act_out:
        y2 = jnp.maximum(y2, 0.0)
    o_ref[:] = y2.reshape(hb, w, wpw_ref.shape[1]).astype(o_ref.dtype)


def _sepconv_kernel_s2(x_ref, bot_ref, wdw_ref, s1_ref, b1_ref,
                       wpw_ref, s2_ref, b2_ref, o_ref, slab,
                       *, hb: int, w: int, act_out: bool):
    # hb OUTPUT rows per band; the input block is 2*hb rows.  SAME
    # padding for k=3, s=2 on even H, W pads 0 top/left and 1
    # bottom/right, so output (r, c) reads input rows/cols
    # 2r..2r+2 / 2c..2c+2 — no top halo, one bottom halo row.
    c = x_ref.shape[-1]
    dt = x_ref.dtype
    wo = w // 2
    # The slab is f32 here: Mosaic's strided_load (the 9 stride-2 taps
    # below) compiles for f32 but not bf16 at these shapes — measured
    # by scripts/probe_mosaic.py's dtype sweep, not assumed.
    slab[:] = jnp.zeros_like(slab)
    slab[0:2 * hb, 0:w, :] = x_ref[:].astype(slab.dtype)
    slab[2 * hb:2 * hb + 1, 0:w, :] = bot_ref[:].astype(slab.dtype)

    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = slab[dy:dy + 2 * hb:2, dx:dx + w:2, :]
            part = tap * wdw_ref[dy * 3 + dx, :]
            acc = part if acc is None else acc + part
    y1 = jnp.maximum(acc * s1_ref[:] + b1_ref[:], 0.0)

    y2 = _mm(y1.reshape(hb * wo, c), wpw_ref[:], dt)
    y2 = y2 * s2_ref[:] + b2_ref[:]
    if act_out:
        y2 = jnp.maximum(y2, 0.0)
    o_ref[:] = y2.reshape(hb, wo, wpw_ref.shape[1]).astype(o_ref.dtype)


def _pick_band(h_out: int) -> int:
    """Output rows per band: small enough to keep the slab + f32
    accumulator + pipelined blocks well under VMEM, large enough to
    amortize; 8 divides every entry/middle-flow height in the zoo."""
    for hb in (8, 4, 2, 1):
        if h_out % hb == 0:
            return hb
    return 1


@functools.partial(jax.jit, static_argnames=("strides", "act_out",
                                             "interpret"))
def fused_sepconv(x: jax.Array,
                  wdw: jax.Array,
                  s1: jax.Array, b1: jax.Array,
                  wpw: jax.Array,
                  s2: jax.Array, b2: jax.Array,
                  *, strides: int = 1, act_out: bool = True,
                  interpret: Optional[bool] = None) -> jax.Array:
    """One SepConvBN (inference) as a banded Pallas kernel.

    Args:
      x: (N, H, W, C) bf16/f32, H even and W even for strides=2.
      wdw: (3, 3, 1, C) Flax depthwise kernel (HWIO, groups=C).
      s1/b1: folded depthwise-BN scale/bias (C,) f32
        (ops/pallas/bottleneck.fold_bn).
      wpw: (C, F) squeezed pointwise kernel.
      s2/b2: folded pointwise-BN scale/bias (F,) f32.
      strides: 1 or 2 (both SAME-padded, matching nn.Conv).
      act_out: trailing ReLU (blocks' sep2 omits it).

    Returns (N, H/strides, W/strides, F) in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pltpu is None:  # pragma: no cover
        raise RuntimeError(
            "jax.experimental.pallas.tpu unavailable — fused_sepconv "
            "requires it even in interpret mode")
    if strides not in (1, 2):
        raise ValueError(f"strides must be 1 or 2, got {strides}")
    n, h, w, c = x.shape
    f = wpw.shape[-1]
    if strides == 2 and (h % 2 or w % 2):
        raise ValueError(f"strides=2 needs even H, W; got {(h, w)}")
    h_out = h // strides
    w_out = w // strides
    hb = _pick_band(h_out)
    nb = h_out // hb

    taps = wdw.reshape(9, c).astype(jnp.float32)
    vec = lambda v: v.reshape(1, -1).astype(jnp.float32)
    weight_specs = [
        pl.BlockSpec((9, c), lambda i: (0, 0)),          # taps
        pl.BlockSpec((1, c), lambda i: (0, 0)),          # s1
        pl.BlockSpec((1, c), lambda i: (0, 0)),          # b1
        pl.BlockSpec((c, f), lambda i: (0, 0)),          # wpw
        pl.BlockSpec((1, f), lambda i: (0, 0)),          # s2
        pl.BlockSpec((1, f), lambda i: (0, 0)),          # b2
    ]
    weights = (taps, vec(s1), vec(b1), wpw, vec(s2), vec(b2))

    if strides == 1:
        # Halo rows as thin precomputed arrays (blocks cannot overlap):
        # top[i] = x[i*hb - 1] (zeros for the first band),
        # bot[i] = x[(i+1)*hb] (zeros for the last).  Extracted via
        # reshape + static slice, NOT a strided slice — XLA lowers
        # x[hb-1:h-1:hb] as a gather plus layout transposes (seen in
        # the compiled HLO), while the banded reshape is free.
        def one(img):
            zrow = jnp.zeros((1, w, c), img.dtype)
            bands = img.reshape(nb, hb, w, c)
            top = jnp.concatenate([zrow, bands[:nb - 1, hb - 1]], axis=0)
            bot = jnp.concatenate([bands[1:, 0], zrow], axis=0)
            kernel = functools.partial(_sepconv_kernel_s1, hb=hb, w=w,
                                       act_out=act_out)
            return pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((hb, w, c), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, w, c), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, w, c), lambda i: (i, 0, 0)),
                    *weight_specs,
                ],
                out_specs=pl.BlockSpec((hb, w, f), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((h, w, f), x.dtype),
                scratch_shapes=[
                    pltpu.VMEM((hb + 2, w + 2, c), x.dtype)],
                interpret=interpret,
            )(img, top, bot, *weights)
    else:
        def one(img):
            zrow = jnp.zeros((1, w, c), img.dtype)
            # band i consumes input rows [2*i*hb, 2*(i+1)*hb) plus one
            # bottom halo row 2*(i+1)*hb (zeros past the last row);
            # reshape-extracted for the same no-gather reason as above.
            bands = img.reshape(nb, 2 * hb, w, c)
            bot = jnp.concatenate([bands[1:, 0], zrow], axis=0)
            kernel = functools.partial(_sepconv_kernel_s2, hb=hb, w=w,
                                       act_out=act_out)
            return pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((2 * hb, w, c), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, w, c), lambda i: (i, 0, 0)),
                    *weight_specs,
                ],
                out_specs=pl.BlockSpec((hb, w_out, f),
                                       lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((h_out, w_out, f), x.dtype),
                scratch_shapes=[
                    pltpu.VMEM((2 * hb + 2, w + 2, c), jnp.float32)],
                interpret=interpret,
            )(img, bot, *weights)

    # Serving is N=1: call the kernel directly rather than through a
    # size-1 vmap (the batching pass rewrites the edge extraction into
    # gather/transpose chains — seen in the compiled HLO).
    if n == 1:
        return one(x[0])[None]
    return jax.vmap(one)(x)


__all__ = ["fused_sepconv"]
