"""Blockwise (Flash-style) attention as a Pallas TPU kernel.

The reference is conv-only, but BASELINE.json config 5 adds a SegFormer/ViT
backbone at 1024x1024 — image tokens are the "sequence" (SURVEY.md §5
long-context note).  Materializing the (N, N) score matrix at 64k tokens is
16 GB in f32; the blockwise kernel keeps attention memory O(block²) and the
running softmax in VMEM, so attention stays compute-bound on the MXU.

Kernel shape: grid = (batch*heads, q_blocks, kv_blocks), kv innermost.
Scratch carries the running max/denominator/accumulator across kv steps
(the standard online-softmax recurrence); the output block is written once,
on the final kv step.  All matmuls accumulate in float32 on the MXU.

On CPU (tests, virtual meshes) the kernel runs in Pallas interpret mode —
same code path, bit-identical math, no TPU required.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                 *, scale: float, kv_blocks: int):
    kv_step = pl.program_id(2)

    @pl.when(kv_step == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale          # (bq, d)
    k = k_ref[0].astype(jnp.float32)                  # (bkv, d)
    v = v_ref[0].astype(jnp.float32)                  # (bkv, d)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq, bkv)

    m_prev = m_ref[:]                                  # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                             # (bq, bkv)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kv_step == kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pick_block(n: int, preferred: int) -> int:
    if n % preferred == 0:
        return preferred
    b = math.gcd(n, preferred)
    # Fall back to the largest divisor of n that is <= preferred.
    for cand in range(min(preferred, n), 0, -1):
        if n % cand == 0:
            return cand
    return b


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv",
                                             "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = 256, block_kv: int = 256,
                    interpret: Optional[bool] = None) -> jax.Array:
    """Softmax(q kᵀ / sqrt(d)) v, blockwise, no (N, N) materialization.

    Args:
      q: (B, H, Nq, d).
      k/v: (B, H, Nkv, d).
      block_q/block_kv: VMEM tile sizes (clipped to divisors of N).
      interpret: force Pallas interpret mode; default = auto (True off-TPU).

    Returns:
      (B, H, Nq, d) in q's dtype.
    """
    b, h, nq, d = q.shape
    nkv = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bq = _pick_block(nq, block_q)
    bkv = _pick_block(nkv, block_kv)
    scale = 1.0 / math.sqrt(d)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nkv, d)
    vf = v.reshape(b * h, nkv, d)
    grid = (b * h, nq // bq, nkv // bkv)

    # pltpu is importable on CPU-only installs (interpret mode uses it
    # for the VMEM scratch specs); see the same note in bottleneck.py.
    if pltpu is None:  # pragma: no cover
        raise RuntimeError(
            "jax.experimental.pallas.tpu unavailable — flash_attention "
            "requires it even in interpret mode")
    scratch = [
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, d), jnp.float32),
    ]

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_blocks=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, nq, d)


def _attn_kernel_t(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                   *, scale: float, kv_blocks: int):
    """Transposed-operand twin of :func:`_attn_kernel`.

    Operands arrive channels-on-sublanes / tokens-on-lanes: q (d, bq),
    k/v (d, bkv).  The whole recurrence mirrors: scores live as
    (bkv, bq) = kᵀq, the softmax max/denominator reduce over axis 0
    (sublanes — cheaper than the standard kernel's lane reductions),
    and the PV accumulation is a STRAIGHT matmul v @ p with no operand
    transpose.  Output (d, bq) — so a (C, pixels)-layout caller (the
    CHW SegFormer stage, models/segformer.py) never relayouts the
    65k-token activation on the way in or out."""
    kv_step = pl.program_id(2)

    @pl.when(kv_step == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale          # (d, bq)
    k = k_ref[0].astype(jnp.float32)                  # (d, bkv)
    v = v_ref[0].astype(jnp.float32)                  # (d, bkv)

    s = jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bkv, bq)

    m_prev = m_ref[:]                                  # (1, bq)
    m_cur = jnp.max(s, axis=0, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                             # (bkv, bq)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kv_step == kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _attn_kernel_t_single(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One-shot transposed kernel for the whole-KV-in-one-block case.

    Every SegFormer stage at 1024² reduces its KV to ≤1024 tokens (the
    SR conv), so the (d, nkv) K/V tiles fit VMEM outright and the
    online-softmax recurrence of :func:`_attn_kernel_t` — scratch
    init/rescale per kv step plus the final divide — collapses to one
    straight softmax between two matmuls.  Measured vs the blocked
    kernel on the stage shapes in PERF.md round 3b."""
    q = q_ref[0].astype(jnp.float32) * scale          # (d, bq)
    k = k_ref[0].astype(jnp.float32)                  # (d, nkv)
    v = v_ref[0].astype(jnp.float32)                  # (d, nkv)
    s = jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (nkv, bq)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)                                 # (nkv, bq)
    l = jnp.sum(p, axis=0, keepdims=True)
    o = jax.lax.dot_general(v, p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (d, bq)
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv",
                                             "interpret"))
def flash_attention_t(q: jax.Array, k: jax.Array, v: jax.Array,
                      block_q: Optional[int] = None,
                      block_kv: Optional[int] = None,
                      interpret: Optional[bool] = None) -> jax.Array:
    """:func:`flash_attention` over TRANSPOSED operands.

    Args:
      q: (B, H, d, Nq) — head channels on the sublane dim, tokens on the
        lane dim (the (C, pixels) orientation; PERF.md round 2b).
      k/v: (B, H, d, Nkv).
      block_q/block_kv: VMEM tile sizes; None = auto.  The auto pick is
        from the measured v5e sweep (PERF.md round 3b): whole KV in one
        block whenever it fits VMEM (single-pass kernel, no recurrence)
        and the largest q block the score tile leaves room for — on the
        SegFormer stage shapes (Nkv=1024 post-SR) that beat the old
        (512, 256) default 2.05x at stage 0.

    Returns:
      (B, H, d, Nq) in q's dtype.  Same math as ``flash_attention`` on
      the transposed inputs (tested against it bit-for-bit on CPU).
    """
    b, h, d, nq = q.shape
    nkv = k.shape[3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if block_kv is None:
        # Whole KV in one block up to 2048 tokens (k+v tiles stay <1 MB
        # for d<=64) -> single-pass kernel; blocked at 256 beyond.
        block_kv = nkv if nkv <= 2048 else 256
    if block_q is None:
        # Bound the f32 score tile (block_kv x block_q) to ~8 MB of the
        # 16 MB VMEM, capped at 2048 (the sweep's winner at every Nq).
        block_q = max(256, min(2048, (8 * 1024 * 1024 // 4) // block_kv))

    bq = _pick_block(nq, block_q)
    bkv = _pick_block(nkv, block_kv)
    scale = 1.0 / math.sqrt(d)

    qf = q.reshape(b * h, d, nq)
    kf = k.reshape(b * h, d, nkv)
    vf = v.reshape(b * h, d, nkv)
    grid = (b * h, nq // bq, nkv // bkv)

    if pltpu is None:  # pragma: no cover
        raise RuntimeError(
            "jax.experimental.pallas.tpu unavailable — flash_attention_t "
            "requires it even in interpret mode")

    if bkv == nkv:
        # Whole KV in one block: single-pass kernel, no scratch, no
        # online-softmax recurrence (see _attn_kernel_t_single).
        out = pl.pallas_call(
            functools.partial(_attn_kernel_t_single, scale=scale),
            grid=(b * h, nq // bq),
            in_specs=[
                pl.BlockSpec((1, d, bq), lambda bh, i: (bh, 0, i)),
                pl.BlockSpec((1, d, nkv), lambda bh, i: (bh, 0, 0)),
                pl.BlockSpec((1, d, nkv), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, d, bq), lambda bh, i: (bh, 0, i)),
            out_shape=jax.ShapeDtypeStruct((b * h, d, nq), q.dtype),
            interpret=interpret,
        )(qf, kf, vf)
        return out.reshape(b, h, d, nq)

    scratch = [
        pltpu.VMEM((1, bq), jnp.float32),
        pltpu.VMEM((1, bq), jnp.float32),
        pltpu.VMEM((d, bq), jnp.float32),
    ]

    out = pl.pallas_call(
        functools.partial(_attn_kernel_t, scale=scale, kv_blocks=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, bq), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, d, bkv), lambda bh, i, j: (bh, 0, j)),
            pl.BlockSpec((1, d, bkv), lambda bh, i, j: (bh, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, d, bq), lambda bh, i, j: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, nq), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, d, nq)


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array
                        ) -> jax.Array:
    """Naive O(N²)-memory attention — the test oracle for the kernel."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


__all__ = ["flash_attention", "flash_attention_t", "attention_reference"]
