"""Micro-A/B the Xception entry-flow stem lowerings (TPU).

Round-3e left the entry flow at 1.41 ms with the stem (conv1_1 3->32
stride-2 @1024x512 + conv1_2 32->64 3x3) measured at ~0.65 ms — few-
channel convs XLA pads onto the MXU (reference models.py:98-113's
backbone entry).  This harness slope-measures the candidate lowerings
in isolation so the winner (if any) gets wired into ConvBN:

  conv1_1:  stock XLA conv  vs  FastStemConv2x NHWC (s2d + 2x2 dense)
            vs FastStemConv2x chw_out (+transpose back)
  conv1_2:  stock XLA conv  vs  ShiftMatmulConv3x3 (nine (px,32)@(32,64))
  stem pair fused: NHWC-packed conv1_1 + shift-matmul conv1_2, and the
            all-CHW chain (chw stem -> CHW shift-matmul -> transpose).

Usage:  python scripts/bench_entry.py [--iters 8 24] [--res 512 1024]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(8, 24))
    ap.add_argument("--res", type=int, nargs=2, default=(512, 1024))
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.deeplab import ConvBN
    from bugcar_image_segmentation_tpu.models.enet import ChwBatchNorm
    from bugcar_image_segmentation_tpu.models.fastconv import (
        FastStemConv2x, ShiftMatmulConv3x3)

    print(f"[bench_entry] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters
    h, w = args.res
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def scan_slope(fn, x0):
        def prog(x, n):
            def step(c, _):
                return fn(c), None
            y, _ = jax.lax.scan(step, x, None, length=n)
            return y
        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda x, n=n: prog(x, n))
            jax.block_until_ready(f(x0))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(x0))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt = ts[1] - ts[0]
        return float("nan") if dt <= 0 else dt / (n_hi - n_lo) * 1e3

    fold = lambda x, y: x + jnp.mean(y).astype(x.dtype)

    def bench(label, module, in_shape, method=None):
        x0 = jnp.asarray(rng.uniform(-1, 1, in_shape), jnp.bfloat16)
        variables = jax.jit(module.init)(key, x0)

        def fn(x):
            y = module.apply(variables, x)
            return fold(x, y)
        ms = scan_slope(fn, x0)
        print(f"{label:44s} {ms:7.3f} ms")
        return ms

    rgb = (1, h, w, 3)
    half = (1, h // 2, w // 2, 32)

    # --- conv1_1 (3 -> 32, stride 2) ---------------------------------
    class StockStem(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvBN(32, (3, 3), strides=(2, 2), relu6=False,
                          name="c")(x)

    class PackedStem(nn.Module):
        """FastStemConv2x staying NHWC (no transpose) + BN + ReLU."""

        @nn.compact
        def __call__(self, x):
            y = FastStemConv2x(32, name="c")(x)
            y = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.bfloat16,
                             param_dtype=jnp.float32, name="bn")(y)
            return nn.relu(y)

    class ChwStem(nn.Module):
        """FastStemConv2x chw_out + ChwBatchNorm + transpose back."""

        @nn.compact
        def __call__(self, x):
            n, hh, ww, _ = x.shape
            y = FastStemConv2x(32, name="c")(x, chw_out=True)
            y = ChwBatchNorm(32, epsilon=1e-3, name="bn")(y)
            y = jnp.maximum(y, 0)
            return y.T.reshape(n, hh // 2, ww // 2, 32)

    bench("conv1_1 stock (3->32 s2 + BN + ReLU)", StockStem(), rgb)
    bench("conv1_1 packed-NHWC (s2d + 2x2 dense)", PackedStem(), rgb)
    bench("conv1_1 CHW (+transpose back)", ChwStem(), rgb)

    # --- conv1_2 (32 -> 64, 3x3 stride 1) ----------------------------
    class StockC2(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvBN(64, (3, 3), relu6=False, name="c")(x)

    class ShiftC2(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = ShiftMatmulConv3x3(64, name="c")(x)
            y = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.bfloat16,
                             param_dtype=jnp.float32, name="bn")(y)
            return nn.relu(y)

    bench("conv1_2 stock (32->64 3x3 + BN + ReLU)", StockC2(), half)
    bench("conv1_2 shift-matmul", ShiftC2(), half)

    # --- the pair, fused candidates ----------------------------------
    class StockPair(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = ConvBN(32, (3, 3), strides=(2, 2), relu6=False,
                       name="c1")(x)
            return ConvBN(64, (3, 3), relu6=False, name="c2")(y)

    class FastPair(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = PackedStem(name="s")(x)
            return ShiftC2(name="c2")(y)

    class ChwPair(nn.Module):
        """Whole stem in CHW: chw stem conv, CHW BN+ReLU, conv1_2 as nine
        CHW matmuls (64,32)@(32,px) over shifted views, transpose back."""

        @nn.compact
        def __call__(self, x):
            n, hh, ww, _ = x.shape
            h2, w2 = hh // 2, ww // 2
            y = FastStemConv2x(32, name="c1")(x, chw_out=True)
            y = ChwBatchNorm(32, epsilon=1e-3, name="bn1")(y)
            y = jnp.maximum(y, 0)                      # (32, n*h2*w2)
            k = self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, 32, 64), jnp.float32)
            kb = k.astype(jnp.bfloat16)
            ychw = y.reshape(32, n, h2, w2)
            yp = jnp.pad(ychw, ((0, 0), (0, 0), (1, 1), (1, 1)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    tap = yp[:, :, dy:dy + h2, dx:dx + w2]
                    t = lax.dot(kb[dy, dx].T,
                                tap.reshape(32, n * h2 * w2),
                                preferred_element_type=jnp.float32)
                    out = t if out is None else out + t
            z = out.astype(jnp.bfloat16)
            z = ChwBatchNorm(64, epsilon=1e-3, name="bn2")(z)
            z = jnp.maximum(z, 0)
            return z.T.reshape(n, h2, w2, 64)

    bench("stem pair stock", StockPair(), rgb)
    bench("stem pair packed+shift (NHWC)", FastPair(), rgb)
    bench("stem pair all-CHW (+transpose back)", ChwPair(), rgb)


if __name__ == "__main__":
    main()
