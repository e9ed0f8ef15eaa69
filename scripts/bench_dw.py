"""A/B the depthwise-as-shifts lowering on the Xception twin (TPU).

``fastconv.DepthwiseConv3x3Shift`` replaces the grouped-conv depthwise
step of every separable conv (models/xception.py SepConvBN
``dw_shift``) with nine per-channel scaled shifts (stride 2 in phase
form).  Grouped convs do zero MXU work — whether XLA's grouped lowering
or the explicit VPU form wins is an empirical question per toolchain;
this harness answers it with the serial-scan slope (device time; the
lowering change is inside the loop, so the scan sees it).

Usage:  python scripts/bench_dw.py [--iters 8 24] [--res 512 1024]
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

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.xception import (
        SepConvBN, Xception65DeepLab)

    print(f"[bench_dw] on {jax.devices()[0].device_kind}", file=sys.stderr)
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

    # Isolated separable convs at the entry/middle shapes.
    for label, c, feats, strides, shape in [
        ("sep @728 s16 (middle)", 728, 728, (1, 1), (1, h // 16, w // 16, 728)),
        ("sep @128 /4 (entry)", 128, 128, (1, 1), (1, h // 4, w // 4, 128)),
        ("sep @256 /8 s2 (entry dn)", 256, 256, (2, 2), (1, h // 8, w // 8, 256)),
    ]:
        x0 = jnp.asarray(rng.uniform(-1, 1, shape), jnp.bfloat16)
        base = SepConvBN(feats, strides=strides, dw_shift=False)
        v = jax.jit(base.init)(key, x0)
        for dws in (False, True):
            m = SepConvBN(feats, strides=strides, dw_shift=dws)

            def fn(x, m=m):
                y = m.apply(v, x)
                if y.shape != x.shape:
                    y = jnp.mean(y) + x
                return y.astype(x.dtype)

            t = scan_slope(fn, x0)
            print(f"{label:28s} dw_shift={int(dws)}: {t:7.3f} ms")

    # Whole model.
    x0 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    base = Xception65DeepLab(dw_shift=False)
    v = jax.jit(lambda k, x: base.init(k, x, train=False))(
        key, x0[:, :64, :64, :])
    for dws in (False, True):
        m = Xception65DeepLab(dw_shift=dws)

        def fn(x, m=m):
            y = m.apply(v, x, train=False)
            p = (jnp.mean(y[..., 0]) * 1e-3).astype(x.dtype)
            return jnp.clip(x + p, 0.0, 1.0)

        t = scan_slope(fn, x0)
        print(f"xception65 forward @ {w}x{h} dw_shift={int(dws)}: "
              f"{t:7.3f} ms ({1e3 / t:.0f} fps)")


if __name__ == "__main__":
    main()
