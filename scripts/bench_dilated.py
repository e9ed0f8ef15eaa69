"""Micro A/B: XLA's dilated 3x3 conv vs a shift+matmul decomposition.

The Xception stage ablation (scripts/bench_xception_stages.py) put
2.11 ms of the 5.05 ms forward in ASPP (models/deeplab.py:103-128) —
~62 GFLOP, 6.8x off the bf16 roofline.  ASPP's three atrous branches are
3x3 convs with kernel_dilation 6/12/18 on a (32, 64, 2048) map; this
harness times that conv against an algebraically identical lowering:

    y = sum_{dy,dx in 3x3} shift(x, (dy*r, dx*r)) @ W[dy, dx]

nine zero-padded shifts (cheap VPU relayouts that fuse) each feeding a
(pixels, Cin) x (Cin, Cout) matmul — the MXU-native form, no dilated
window machinery.  Also times rate-1 and a plain 1x1 for orientation.

Usage:  python scripts/bench_dilated.py [--res 32 64] [--cin 2048]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(16, 48))
    ap.add_argument("--res", type=int, nargs=2, default=(32, 64))
    ap.add_argument("--cin", type=int, default=2048)
    ap.add_argument("--cout", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    print(f"[bench_dilated] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    h, w = args.res
    cin, cout = args.cin, args.cout
    n_lo, n_hi = args.iters
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (1, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.uniform(-0.05, 0.05, (3, 3, cin, cout)),
                    jnp.float32)
    proj = jnp.asarray(rng.uniform(-0.05, 0.05, (cout, cin)), jnp.float32)

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

    def chain(y, x):
        # fold (1,h,w,cout) output back into an input-shaped carry
        return x + (y @ proj.astype(y.dtype)).astype(x.dtype)

    def conv_dilated(x, rate):
        y = jax.lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 1), "SAME",
            rhs_dilation=(rate, rate),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return chain(y, x)

    def conv_shifted(x, rate):
        # zero-pad once by rate on every side, then 9 slices + matmuls
        xp = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate), (0, 0)))
        y = None
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.dynamic_slice(
                    xp, (0, dy * rate, dx * rate, 0), x.shape)
                t = tap.reshape(h * w, cin) @ k[dy, dx].astype(jnp.bfloat16)
                y = t if y is None else y + t
        return chain(y.reshape(1, h, w, cout), x)

    def conv_1x1(x):
        y = x.reshape(h * w, cin) @ k[1, 1].astype(jnp.bfloat16)
        return chain(y.reshape(1, h, w, cout), x)

    gflop = 9 * h * w * cin * cout * 2 / 1e9
    print(f"shape (1,{h},{w},{cin})->{cout}; 3x3 conv = {gflop:.1f} GFLOP")
    ms = scan_slope(conv_1x1, x0)
    print(f"1x1 matmul                 {ms:7.3f} ms "
          f"({gflop / 9 / max(ms, 1e-9):6.1f} TF/s)")
    for rate in (1, 6, 12, 18):
        ms = scan_slope(functools.partial(conv_dilated, rate=rate), x0)
        print(f"XLA conv, dilation {rate:2d}      {ms:7.3f} ms "
              f"({gflop / max(ms, 1e-9) / 1e3 * 1e3:6.1f} TF/s)")
        ms = scan_slope(functools.partial(conv_shifted, rate=rate), x0)
        print(f"shift+matmul, dilation {rate:2d}  {ms:7.3f} ms "
              f"({gflop / max(ms, 1e-9) / 1e3 * 1e3:6.1f} TF/s)")


if __name__ == "__main__":
    main()
