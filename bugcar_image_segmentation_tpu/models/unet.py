"""U-Net style encoder-decoder in Flax — the ``model.h5`` configuration.

The reference's third backbone is a Keras-format ``model.h5``
(reference .MISSING_LARGE_BLOBS:3) whose loading code did not survive the
snapshot; BASELINE.json config 3 keeps it in scope as the "Keras model.h5
streaming video, batch-8" configuration.  A Keras segmentation ``model.h5``
of that era is overwhelmingly a U-Net/SegNet-style encoder-decoder, so
that is the architecture provided here; convert/keras_h5.py maps actual
``.h5`` weight files onto it when one is available.

NHWC, bfloat16 activations, grouped into conv-conv-pool encoder stages and
upsample-concat-conv decoder stages.  Batch-8 streaming is just a leading
batch axis on the jitted engine (models/api.py) — no separate code path.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Optional

from ..ops import pooling
from .enet import ChwBatchNorm, ChwConv
from .fastconv import (FastConvTranspose2x, FoldedBNParams, KernelParam,
                       phase_conv3x3, phase_max_pool, space_to_depth,
                       depth_to_space)


class DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 nhw: Optional[Tuple[int, int, int]] = None,
                 packed: bool = False) -> jax.Array:
        if packed:
            # 2x2 phase-space inference path (UNet.phase_full_res): x is
            # the space_to_depth tensor (N, H/2, W/2, 4Cin); both convs
            # run as dense 2x2 convs over 4x channels — full MXU lanes
            # where the stock NHWC form idles at Cout/128 (PERF.md round
            # 5e).  Identical variable tree via the param twins.
            cin = x.shape[-1] // 4
            for i in range(2):
                wk = KernelParam((3, 3, cin, self.features),
                                 name=f"conv{i}")()
                k, b = FoldedBNParams(self.features, name=f"bn{i}")()
                x = phase_conv3x3(x, wk, self.dtype)
                x = nn.relu(x * jnp.tile(k, 4).astype(x.dtype)
                            + jnp.tile(b, 4).astype(x.dtype))
                cin = self.features
            return x
        if nhw is not None:
            # Transposed (C, pixels) inference path — the ENet layout
            # doctrine (PERF.md round 2b) applied to UNet's narrow
            # high-res stages; identical variable tree.
            for i in range(2):
                x = ChwConv(self.features, (3, 3), dtype=self.dtype,
                            name=f"conv{i}")(x, nhw)
                x = ChwBatchNorm(self.features, epsilon=1e-3,
                                 dtype=self.dtype, name=f"bn{i}")(x)
                x = nn.relu(x)
            return x
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Input (N, H, W, 3) float NHWC (H, W divisible by 16);
    output (N, H, W, num_classes) float32 logits."""

    num_classes: int = 15
    widths: Sequence[int] = (32, 64, 128, 256)
    bottleneck_width: int = 512
    dtype: Any = jnp.bfloat16
    # 2x2/2 transposed convs as 1x1 conv + depth-to-space (fastconv.py);
    # same params & math, denser MXU work.
    fast: bool = True
    # Inference layout gate: DoubleConvs at width <= chw_max_width run
    # in the transposed (C, pixels) orientation (ENet layout doctrine,
    # PERF.md round 2b/3).  Default OFF — measured SLOWER on the bench
    # v5e (1.90 -> 3.12/3.62 ms at gate 32/64, PERF.md round 3): the
    # CHW 3x3 materializes a 9-tap concat, which at UNet's full-res
    # 131k-pixel maps is a 75-150 MB HBM working set; ENet's CHW
    # regulars live on 8k-pixel maps where the taps stay cached.  The
    # layout doctrine has a map-size ceiling, same lesson as the
    # DeepLab stem (PERF.md round 2b #3).
    chw_max_width: int = 0
    # Inference-only phase gate: encoder/decoder stages with width <=
    # phase_max_width run in 2x2 phase space — 4x channels at quarter
    # pixels fill the 128-lane MXU that narrow NHWC convs leave mostly
    # idle (fastconv.phase_conv3x3), the 2x2 pool becomes a free phase
    # max, the up-transposes stay packed (FastConvTranspose2x
    # phase_out), skips are saved packed, and when the LAST decoder
    # stage is packed the classifier applies per phase with one final
    # depth-to-space on the logits.  Measured on the bench v5e (round
    # 5e): gate 32 (full-res pair) x1.26 whole-model; engine name
    # "unet_ph" uses the measured-best gate.  Same variable tree; float
    # sums reorder (budgeted, not bit-equal).  Requires ``fast``.
    # Unlike the CHW attempt above, no 9-tap concat materializes — the
    # phase conv is ONE dense 2x2 conv.
    phase_max_width: int = 0

    def _dconv(self, x: jax.Array, w: int, name: str, train: bool,
               dt) -> jax.Array:
        chw = (not train) and self.fast and w <= self.chw_max_width
        if chw:
            n_, h_, w_, c_ = x.shape
            xt = x.reshape(n_ * h_ * w_, c_).T.astype(dt)
            yt = DoubleConv(w, dtype=dt, name=name)(xt, train,
                                                    nhw=(n_, h_, w_))
            return yt.T.reshape(n_, h_, w_, w)
        return DoubleConv(w, dtype=dt, name=name)(x, train)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        div = 2 ** len(self.widths)
        if x.ndim != 4 or x.shape[1] % div or x.shape[2] % div:
            raise ValueError(
                f"UNet needs NHWC input with H, W divisible by {div}; "
                f"got {x.shape}")
        dt = self.dtype
        x = x.astype(dt)
        gate = (self.phase_max_width
                if (not train) and self.fast else 0)

        skips = []            # (is_packed, tensor) per encoder stage
        for i, w in enumerate(self.widths):
            if w <= gate:
                xp = DoubleConv(w, dtype=dt, name=f"enc{i}")(
                    space_to_depth(x), train, packed=True)
                skips.append((True, xp))  # saved PACKED for the decoder
                x = phase_max_pool(xp)    # == max_pool_2x2, bit-exact
            else:
                x = self._dconv(x, w, f"enc{i}", train, dt)
                skips.append((False, x))
                x = pooling.max_pool_2x2(x)

        x = DoubleConv(self.bottleneck_width, dtype=dt,
                       name="bottleneck")(x, train)

        last = len(self.widths) - 1
        for i, (w, (sk_packed, skip)) in enumerate(
                zip(reversed(self.widths), reversed(skips))):
            if w <= gate:
                up_p = FastConvTranspose2x(w, kernel=2, use_bias=True,
                                           dtype=dt, name=f"up{i}")(
                    x, phase_out=True)
                # canonical packed concat: interleave channels per phase
                n_, h2, w2, _ = up_p.shape
                skp = skip if sk_packed else space_to_depth(skip)
                cat = jnp.concatenate(
                    [up_p.reshape(n_, h2, w2, 4, w),
                     skp.astype(up_p.dtype).reshape(n_, h2, w2, 4, w)],
                    axis=-1).reshape(n_, h2, w2, 8 * w)
                xp = DoubleConv(w, dtype=dt, name=f"dec{i}")(
                    cat, train, packed=True)
                if i == last:
                    # classifier per phase, one depth-to-space on logits
                    ck, cb = KernelParam((1, 1, w, self.num_classes),
                                         use_bias=True,
                                         name="classifier")()
                    xg = xp.reshape(n_, h2, w2, 4, w)
                    y = (jnp.einsum("nhwpc,co->nhwpo", xg,
                                    ck[0, 0].astype(dt))
                         + cb.astype(dt))
                    y = depth_to_space(
                        y.reshape(n_, h2, w2, 4 * self.num_classes))
                    return y.astype(jnp.float32)
                x = depth_to_space(xp)    # next up wants the NHWC map
                continue
            if self.fast:
                x = FastConvTranspose2x(w, kernel=2, use_bias=True,
                                        dtype=dt, name=f"up{i}")(x)
            else:
                x = nn.ConvTranspose(w, (2, 2), strides=(2, 2), dtype=dt,
                                     param_dtype=jnp.float32,
                                     name=f"up{i}")(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = self._dconv(x, w, f"dec{i}", train, dt)

        x = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                    param_dtype=jnp.float32, name="classifier")(x)
        return x.astype(jnp.float32)


__all__ = ["UNet", "DoubleConv"]
