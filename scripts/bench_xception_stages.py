"""Stage ablation for the Xception-65 DeepLab twin (BASELINE config 2).

The full forward slope-measures 5.05 ms @ 1024x512 (PERF.md round 3d)
against a ~1.2 ms bf16 roofline (~230 GFLOP) — this harness times each
stage alone (entry flow / 16-block middle flow / exit flow / ASPP /
decoder / head upsample) with the serial-scan slope methodology so the
round-4 optimization effort lands where the time actually goes.

Rebuilds nothing; instantiates the stages of models/xception.py
(reference models.py:98-113's real-blob architecture) directly.

Usage:  python scripts/bench_xception_stages.py [--iters 8 24]
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

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.deeplab import (
        ASPP, ConvBN, _upsample)
    from bugcar_image_segmentation_tpu.models.xception import (
        SepConvBN, XceptionBlock)

    print(f"[bench_xception_stages] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters
    h, w = args.res
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def scan_slope(fn, x0):
        """fn: array -> array of the SAME shape (serially chained)."""
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

    def bench(label, module, in_shape, chain=None, extra=None):
        """Time module.apply on random input; chain folds the output back
        into an input-shaped carry so the scan is serially dependent."""
        x0 = jnp.asarray(rng.uniform(-1, 1, in_shape), jnp.bfloat16)
        variables = module.init(key, x0)

        def fn(x):
            y = module.apply(variables, x)
            if isinstance(y, tuple):
                y = y[0]
            if chain is not None:
                return chain(x, y)
            return y
        ms = scan_slope(fn, x0)
        print(f"{label:34s} {ms:7.3f} ms" + (f"  ({extra})" if extra else ""))
        return ms

    # Stage input shapes at output stride 16 (models/xception.py).
    s16 = (1, h // 16, w // 16, 728)

    class Entry(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = ConvBN(32, (3, 3), strides=(2, 2), relu6=False,
                       name="conv1_1")(x)
            y = ConvBN(64, (3, 3), relu6=False, name="conv1_2")(y)
            y, _ = XceptionBlock((128,) * 3, strides=(2, 2),
                                 name="block1")(y)
            y, low = XceptionBlock((256,) * 3, strides=(2, 2),
                                   name="block2")(y)
            y, _ = XceptionBlock((728,) * 3, strides=(2, 2),
                                 name="block3")(y)
            return y

    class Middle(nn.Module):
        n: int = 16

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                x, _ = XceptionBlock((728,) * 3, skip="sum",
                                     name=f"m{i}")(x)
            return x

    class Exit(nn.Module):
        @nn.compact
        def __call__(self, x):
            y, _ = XceptionBlock((728, 1024, 1024), dilation=2,
                                 name="exit1")(x)
            y = SepConvBN(1536, dilation=(2, 2), name="e0")(y)
            y = SepConvBN(1536, dilation=(2, 2), name="e1")(y)
            y = SepConvBN(2048, dilation=(2, 2), name="e2")(y)
            return y

    class Decoder(nn.Module):
        """ASPP output + low-level tap -> 1/4-res logits (synth low tap)."""

        @nn.compact
        def __call__(self, x):
            low = jnp.tile(x.astype(jnp.bfloat16),
                           (1, 4, 4, 1))[..., :256]      # (1/4 res, 256ch)
            y = _upsample(x, (low.shape[1], low.shape[2]))
            ll = ConvBN(48, (1, 1), relu6=False, name="low_proj")(low)
            y = jnp.concatenate([y, ll.astype(y.dtype)], axis=-1)
            y = ConvBN(256, (3, 3), relu6=False, name="dec0")(y)
            y = ConvBN(256, (3, 3), relu6=False, name="dec1")(y)
            return nn.Conv(15, (1, 1), param_dtype=jnp.float32,
                           name="cls")(y)

    total = 0.0
    total += bench("entry flow (3->728, /16)",
                   Entry(), (1, h, w, 3),
                   chain=lambda x, y: x + jnp.mean(y).astype(x.dtype))
    total += bench("middle flow (16 blocks @728)", Middle(), s16)
    for n in (1, 4):
        bench(f"  middle flow ({n} block{'s' if n > 1 else ''})",
              Middle(n=n), s16)
    total += bench("exit flow (728->2048)", Exit(), s16,
                   chain=lambda x, y: x + jnp.mean(y).astype(x.dtype))
    total += bench("ASPP (2048->256)",
                   ASPP(relu6=False), (1, h // 16, w // 16, 2048),
                   chain=lambda x, y: x + jnp.mean(y).astype(x.dtype))
    total += bench("decoder (x4 up + 2x conv3x3@256)",
                   Decoder(), (1, h // 16, w // 16, 256),
                   chain=lambda x, y: x + jnp.mean(y).astype(x.dtype))

    # Sub-ablations inside a middle block: depthwise vs pointwise.
    class DWOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            y = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                        use_bias=False, dtype=jnp.bfloat16,
                        param_dtype=jnp.float32, name="dw")(x)
            y = nn.BatchNorm(use_running_average=True, dtype=jnp.bfloat16,
                             param_dtype=jnp.float32, name="bn")(y)
            return nn.relu(y)

    class PWOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(x.shape[-1], (1, 1), use_bias=False,
                        dtype=jnp.bfloat16, param_dtype=jnp.float32,
                        name="pw")(x)
            y = nn.BatchNorm(use_running_average=True, dtype=jnp.bfloat16,
                             param_dtype=jnp.float32, name="bn")(y)
            return nn.relu(y)

    bench("  one dw3x3+BN+ReLU @728 (of 48)", DWOnly(), s16)
    bench("  one pw1x1+BN+ReLU @728 (of 48)", PWOnly(), s16)

    # Entry-flow sub-ablation (round 3f): the flow is 1.41 ms post-ASPP
    # fix — locate it.  Stem convs and the three strided blocks, each at
    # its real input shape, plus dw/pw singles at the entry shapes.
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = ConvBN(32, (3, 3), strides=(2, 2), relu6=False,
                       name="conv1_1")(x)
            return ConvBN(64, (3, 3), relu6=False, name="conv1_2")(y)

    def block(feats, name):
        class B(nn.Module):
            @nn.compact
            def __call__(self, x):
                y, _ = XceptionBlock(feats, strides=(2, 2), name=name)(x)
                return y
        return B()

    fold = lambda x, y: x + jnp.mean(y).astype(x.dtype)
    bench("  stem conv1+conv2 (3->64 @/2)", Stem(), (1, h, w, 3),
          chain=fold)
    bench("  block1 (64->128, /4)", block((128,) * 3, "b1"),
          (1, h // 2, w // 2, 64), chain=fold)
    bench("  block2 (128->256, /8)", block((256,) * 3, "b2"),
          (1, h // 4, w // 4, 128), chain=fold)
    bench("  block3 (256->728, /16)", block((728,) * 3, "b3"),
          (1, h // 8, w // 8, 256), chain=fold)
    bench("  one dw3x3+BN+ReLU @128 /4", DWOnly(),
          (1, h // 4, w // 4, 128))
    bench("  one pw1x1+BN+ReLU @128 /4", PWOnly(),
          (1, h // 4, w // 4, 128))

    print(f"{'stage sum':34s} {total:7.3f} ms  (full forward 4.02 PERF)")


if __name__ == "__main__":
    main()
