#!/usr/bin/env python3
"""A/B one fused sepconv Pallas kernel vs XLA's two-conv lowering.

Scan slopes (args harness: weights as jit arguments, host-read fence)
at the Xception entry/middle-flow shapes (models/xception.py @1024x512
input).  VERDICT r4 #1's honest attempt, measured per shape before any
model wiring.

Usage:  python scripts/bench_sepconv.py [--iters 40 120]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(40, 120))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from bugcar_image_segmentation_tpu.ops.pallas.sepconv import fused_sepconv

    print(f"[bench_sepconv] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def scan_slope(fn, weights, x0):
        def prog(wts, x, n):
            def body(c, _):
                y = fn(wts, c)
                # keep shapes chained: fold output back into the input
                p = (jnp.mean(y[..., :1].astype(jnp.float32))
                     * 1e-3).astype(c.dtype)
                return c + p, None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y
        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda w_, x_, n=n: prog(w_, x_, n))
            float(jnp.sum(f(weights, x0).astype(jnp.float32)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(f(weights, x0).astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt_ = ts[1] - ts[0]
        return float("nan") if dt_ <= 0 else dt_ / (n_hi - n_lo) * 1e3

    # (label, H, W, C, F, strides)
    shapes = [
        ("block1 sep0/1 (256x512, 128)", 256, 512, 128, 128, 1),
        ("block1 sep2 s2", 256, 512, 128, 128, 2),
        ("block2 sep0/1 (128x256, 256)", 128, 256, 256, 256, 1),
        ("block3 sep0/1 (64x128, 728)", 64, 128, 728, 728, 1),
        ("middle sep (32x64, 728)", 32, 64, 728, 728, 1),
    ]
    for label, h, w, c, f, s in shapes:
        x = jnp.asarray(rng.normal(size=(1, h, w, c)), dt)
        wts = dict(
            wdw=jnp.asarray(rng.normal(size=(3, 3, 1, c)) * 0.1,
                            jnp.float32),
            wpw=jnp.asarray(rng.normal(size=(c, f)) * 0.05, jnp.float32),
            s1=jnp.ones((c,), jnp.float32),
            b1=jnp.zeros((c,), jnp.float32),
            s2=jnp.ones((f,), jnp.float32),
            b2=jnp.zeros((f,), jnp.float32),
        )

        def xla(wts, x, s=s):
            dw = jax.lax.conv_general_dilated(
                x, wts["wdw"].astype(dt), window_strides=(s, s),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            y1 = jnp.maximum(dw.astype(jnp.float32) * wts["s1"]
                             + wts["b1"], 0.0)
            y2 = jax.lax.dot_general(
                y1.astype(dt), wts["wpw"].astype(dt),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y2 * wts["s2"] + wts["b2"], 0.0).astype(dt)

        def fused(wts, x, s=s):
            return fused_sepconv(x, wts["wdw"], wts["s1"], wts["b1"],
                                 wts["wpw"], wts["s2"], wts["b2"],
                                 strides=s, act_out=True)

        # parity first (bf16 tolerance)
        a = np.asarray(xla(wts, x).astype(jnp.float32))
        b = np.asarray(fused(wts, x).astype(jnp.float32))
        err = float(np.max(np.abs(a - b)))
        t_x = scan_slope(xla, wts, x)
        t_f = scan_slope(fused, wts, x)
        print(f"{label:32s}: xla {t_x:7.3f} ms  fused {t_f:7.3f} ms  "
              f"(x{t_x / t_f:.2f}, maxerr {err:.1e})")


if __name__ == "__main__":
    main()
