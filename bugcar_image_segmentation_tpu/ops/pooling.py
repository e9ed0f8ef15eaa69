"""Fast pooling primitives.

``lax.reduce_window`` lowers pathologically on TPU for small windows over
narrow-channel NHWC tensors (measured 0.41 ms for a 2x2/2 max pool on
(256, 512, 3) bf16 — 27x slower than the same reduction expressed as a
reshape + axis-max, which is bit-identical).  Every pool in the framework
goes through these reshape/shift formulations instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool over (..., H, W, C), H and W even.

    Bit-identical to ``flax.linen.max_pool(x, (2, 2), (2, 2))``.

    Form matters enormously here: reducing the two strided window axes
    in place (``max(axis=(-4, -2))``) measured 191 us on a (256, 512, 3)
    bf16 frame — XLA keeps the 3-wide channel minor dim and the VPU runs
    at 3/128 lane occupancy.  Transposing the window elements next to the
    channels first (the space-to-depth phase layout) and reducing one
    contiguous axis is the same reduction at 3 us (60x, measured on the
    bench v5e; see PERF.md round 2b).
    """
    shape = x.shape
    h, w, c = shape[-3], shape[-2], shape[-1]
    lead = shape[:-3]
    y = x.reshape((-1, h // 2, 2, w // 2, 2, c))
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h // 2, w // 2, 4, c)
    return y.max(axis=-2).reshape(lead + (h // 2, w // 2, c))


def max_pool(x: jax.Array, window: Tuple[int, int],
             strides: Tuple[int, int]) -> jax.Array:
    """General max pool via shifted strided slices (window == strides or
    window <= strides supported exactly; falls back to shift-max chain)."""
    wh, ww = window
    sh, sw = strides
    if (wh, ww) == (2, 2) and (sh, sw) == (2, 2):
        return max_pool_2x2(x)
    # shift-max over the window, then stride.
    out = None
    for dy in range(wh):
        for dx in range(ww):
            v = x[..., dy:x.shape[-3] - wh + dy + 1,
                  dx:x.shape[-2] - ww + dx + 1, :]
            out = v if out is None else jnp.maximum(out, v)
    return out[..., ::sh, ::sw, :]


__all__ = ["max_pool_2x2", "max_pool"]
