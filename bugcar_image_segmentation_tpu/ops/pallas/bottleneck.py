"""Whole-ENet-bottleneck fusion as single Pallas TPU kernels.

Why: the ENet forward (reference models.py:14-95 rebuilt in
models/enet.py) is NOT conv-arithmetic-bound on TPU — PERF.md round 2
measured ~2% MFU with the time going to per-op fixed costs and HBM
round-trips across ~80 small convs (channel counts 16–128 against the
128-wide MXU/VPU).  XLA fuses elementwise chains into convs but never
conv→conv, so each bottleneck costs 5–8 kernel launches, each reading
and writing the full activation map.

Here one bottleneck = ONE kernel: 1x1 projection → core conv (3x3,
dilated 3x3, or 5x1+1x5 asymmetric) → 1x1 expansion → residual add, with
folded-BatchNorm affines and PReLUs applied in-register.  The activation
map never leaves VMEM between the three matmuls; HBM traffic drops to
one read of x and one write of the output.

Mechanics:
- Activations live as (H*W, C) matrices; 1x1 convs are plain MXU
  matmuls.
- The spatial conv materializes the projected map into a zero-padded
  (H+2d, W+2d, mid) VMEM scratch, then accumulates one matmul per tap
  over STATIC shifted slices — no gathers, no dynamic indexing, so the
  same code runs compiled on Mosaic and interpreted on CPU (tests).
- BatchNorm is consumed as pre-folded (scale, bias) f32 vectors
  (scale = gamma/sqrt(var+eps), bias = beta - mean*scale); all matmuls
  accumulate in f32 on the MXU, activations stay bf16.

Scope: the free-resolution "regular" / "dilated" / "asymmetric" kinds —
21 of ENet's 26 bottlenecks, including all 16 of the stage-2/3 trunk
where most of the forward time goes.  "down"/"up" keep the XLA path
(pool-indices bookkeeping, 4 blocks total).  Used by
models/enet_fused.py; parity-tested against the Flax module in
tests/test_enet_fused.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _affine_prelu(y: jax.Array, scale, bias, alpha,
                  prelu: bool = True) -> jax.Array:
    y = y * scale + bias
    if prelu:
        y = jnp.where(y >= 0, y, alpha * y)
    return y


def _mm(a: jax.Array, b: jax.Array, dt) -> jax.Array:
    """Matmul in the model's compute dtype (bf16 on TPU, f32 in the f32
    parity mode), always accumulating f32 on the MXU."""
    return jax.lax.dot_general(a.astype(dt), b.astype(dt),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _core_taps(yp_ref, w_ref, h: int, w: int, mid: int,
               taps, tap_mid: int, dt) -> jax.Array:
    """Σ_t shifted-slice(yp) @ w[t] over static (dy, dx) tap offsets."""
    acc = None
    for t, (dy, dx) in enumerate(taps):
        tap = yp_ref[dy:dy + h, dx:dx + w, :].reshape(h * w, mid)
        part = _mm(tap, w_ref[t * tap_mid:(t + 1) * tap_mid, :], dt)
        acc = part if acc is None else acc + part
    return acc


def _regular_kernel(x_ref, wp_ref, s1_ref, b1_ref, a1_ref, wc_ref,
                    s2_ref, b2_ref, a2_ref, we_ref, s3_ref, b3_ref,
                    ao_ref, o_ref, yp_ref, *, h: int, w: int, d: int):
    mid = wp_ref.shape[1]
    dt = x_ref.dtype
    x = x_ref[:]                                           # (HW, C)

    # 1x1 projection -> folded BN -> PReLU
    y1 = _affine_prelu(_mm(x, wp_ref[:], dt), s1_ref[:], b1_ref[:],
                       a1_ref[:])

    # core 3x3 (dilation d) as 9 shifted-slice matmuls out of VMEM scratch
    yp_ref[:] = jnp.zeros_like(yp_ref)
    yp_ref[d:d + h, d:d + w, :] = y1.astype(yp_ref.dtype).reshape(h, w, mid)
    taps = [(ky * d, kx * d) for ky in range(3) for kx in range(3)]
    acc = _core_taps(yp_ref, wc_ref, h, w, mid, taps, mid, dt)
    y2 = _affine_prelu(acc, s2_ref[:], b2_ref[:], a2_ref[:])

    # 1x1 expansion -> folded BN (no act) -> residual -> PReLU
    y3 = _mm(y2.astype(dt), we_ref[:], dt) * s3_ref[:] + b3_ref[:]
    out = y3 + x.astype(jnp.float32)
    out = jnp.where(out >= 0, out, ao_ref[:] * out)
    o_ref[:] = out.astype(o_ref.dtype)


def _asym_kernel(x_ref, wp_ref, s1_ref, b1_ref, a1_ref, w51_ref, w15_ref,
                 s2_ref, b2_ref, a2_ref, we_ref, s3_ref, b3_ref,
                 ao_ref, o_ref, yp_ref, *, h: int, w: int):
    mid = wp_ref.shape[1]
    dt = x_ref.dtype
    x = x_ref[:]

    y1 = _affine_prelu(_mm(x, wp_ref[:], dt), s1_ref[:], b1_ref[:],
                       a1_ref[:])

    # 5x1 conv (plain, models/enet.py:173-175): taps along H only
    yp_ref[:] = jnp.zeros_like(yp_ref)
    yp_ref[2:2 + h, 2:2 + w, :] = y1.astype(yp_ref.dtype).reshape(h, w, mid)
    taps_h = [(ky, 2) for ky in range(5)]
    z = _core_taps(yp_ref, w51_ref, h, w, mid, taps_h, mid, dt)

    # 1x5 conv -> folded BN -> PReLU: taps along W of the 5x1 result
    yp_ref[:] = jnp.zeros_like(yp_ref)
    yp_ref[2:2 + h, 2:2 + w, :] = z.astype(yp_ref.dtype).reshape(h, w, mid)
    taps_w = [(2, kx) for kx in range(5)]
    acc = _core_taps(yp_ref, w15_ref, h, w, mid, taps_w, mid, dt)
    y2 = _affine_prelu(acc, s2_ref[:], b2_ref[:], a2_ref[:])

    y3 = _mm(y2.astype(dt), we_ref[:], dt) * s3_ref[:] + b3_ref[:]
    out = y3 + x.astype(jnp.float32)
    out = jnp.where(out >= 0, out, ao_ref[:] * out)
    o_ref[:] = out.astype(o_ref.dtype)


def fold_bn(bn_params: dict, bn_stats: dict,
            eps: float = 1e-3) -> tuple[jax.Array, jax.Array]:
    """FusedBatchNorm → (scale, bias): y = x*scale + bias (f32)."""
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    bias = bn_params["bias"] - bn_stats["mean"] * scale
    return scale.astype(jnp.float32), bias.astype(jnp.float32)


def _vec(v: jax.Array) -> jax.Array:
    return v.reshape(1, -1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("kind", "dilation",
                                             "interpret"))
def fused_bottleneck(x: jax.Array,
                     wp: jax.Array, s1: jax.Array, b1: jax.Array,
                     a1: jax.Array,
                     wcore,
                     s2: jax.Array, b2: jax.Array, a2: jax.Array,
                     we: jax.Array, s3: jax.Array, b3: jax.Array,
                     ao: jax.Array,
                     *, kind: str = "regular", dilation: int = 1,
                     interpret: Optional[bool] = None) -> jax.Array:
    """One ENet bottleneck (models/enet.py:140-220, inference) fused.

    Args:
      x: (N, H, W, C) bf16/f32 input.
      wp/we: (C, mid) / (mid, C) 1x1 conv kernels (squeezed HWIO).
      wcore: (3, 3, mid, mid) for regular/dilated, or a tuple
        ((5, 1, mid, mid), (1, 5, mid, mid)) for asymmetric.
      s*/b*: folded BN scale/bias vectors (see :func:`fold_bn`);
        a1/a2/ao: PReLU alphas (projection / core / output).
      kind: "regular" | "dilated" | "asymmetric".
      dilation: core conv dilation (regular/dilated kinds).

    Returns (N, H, W, C), x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    mid = wp.shape[-1]
    d = dilation if kind != "asymmetric" else 2
    x2 = x.reshape(n, h * w, c)

    scratch_shape = (h + 2 * d, w + 2 * d, mid)
    scratch_dt = x.dtype
    # pltpu is importable on CPU-only installs too (interpret mode uses
    # it for the VMEM scratch spec); a missing import means a broken JAX
    # install, not a supported configuration (ADVICE r2: the old
    # MemorySpace.ANY fallback was never exercised and version-fragile).
    if pltpu is None:  # pragma: no cover
        raise RuntimeError(
            "jax.experimental.pallas.tpu unavailable — fused_bottleneck "
            "requires it even in interpret mode")
    scratch = [pltpu.VMEM(scratch_shape, scratch_dt)]

    vecs1 = (_vec(s1), _vec(b1), _vec(a1))
    vecs2 = (_vec(s2), _vec(b2), _vec(a2))
    vecs3 = (_vec(s3), _vec(b3), _vec(ao))

    if kind == "asymmetric":
        w51 = wcore[0].reshape(5 * mid, mid)
        w15 = wcore[1].reshape(5 * mid, mid)
        kernel = functools.partial(_asym_kernel, h=h, w=w)
        operands = (wp, *vecs1, w51, w15, *vecs2, we, *vecs3)
    else:
        wc = jnp.asarray(wcore).reshape(9 * mid, mid)
        kernel = functools.partial(_regular_kernel, h=h, w=w, d=d)
        operands = (wp, *vecs1, wc, *vecs2, we, *vecs3)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h * w, c), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )

    def one(img):
        return call(img, *operands)

    out = jax.vmap(one)(x2)
    return out.reshape(n, h, w, c)


__all__ = ["fused_bottleneck", "fold_bn"]
