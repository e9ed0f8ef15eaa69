#!/usr/bin/env python3
"""Per-stage scan slopes for UNet @512x256 (BASELINE config 3).

Round-5 instrument: the 2.31 ms forward is ~8x above a naive
FLOP+traffic roofline, and UNet never had the stage campaign ENet /
Xception / SegFormer got (PERF.md rounds 2-4).  Times each encoder /
bottleneck / up / decoder stage as a standalone jitted program at its
real input shape (args harness: params as jit arguments, host-read
fence), so the gap has an address before any lever is tried.

Usage:  python scripts/bench_unet_stages.py [--iters 60 180]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(60, 180))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from bugcar_image_segmentation_tpu.models.unet import (DoubleConv, UNet)
    from bugcar_image_segmentation_tpu.models.fastconv import (
        FastConvTranspose2x)
    from bugcar_image_segmentation_tpu.ops import pooling

    print(f"[bench_unet_stages] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    model = UNet(num_classes=15)
    h, w = 256, 512
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32),
                           train=False)
    params, bs = variables["params"], variables["batch_stats"]

    def sub(name):
        v = {"params": params[name]}
        if name in bs:
            v["batch_stats"] = bs[name]
        return v

    def slope(fn, v, x0):
        def prog(v, x, n):
            def step(c, _):
                y = fn(v, c)
                p = (jnp.mean(y[..., :1].astype(jnp.float32))
                     * 1e-3).astype(c.dtype)
                return c + p, None
            y, _ = jax.lax.scan(step, x, None, length=n)
            return y
        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda v, x, n=n: prog(v, x, n))
            float(jnp.sum(f(v, x0).astype(jnp.float32)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(f(v, x0).astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        d = ts[1] - ts[0]
        return float("nan") if d <= 0 else d / (n_hi - n_lo) * 1e3

    widths = model.widths
    total = 0.0
    # encoder DoubleConvs (pool included with each stage's exit)
    hw = (h, w)
    cin = 3
    for i, wd in enumerate(widths):
        x0 = jnp.asarray(rng.normal(size=(1, *hw, cin)), dt)
        dc = DoubleConv(wd, dtype=dt)
        fn = lambda v, c, dc=dc: pooling.max_pool_2x2(
            dc.apply(v, c, False))
        t = slope(fn, sub(f"enc{i}"), x0)
        total += t
        print(f"enc{i} ({hw[0]}x{hw[1]}x{cin}->{wd}) + pool: {t:.3f} ms")
        hw = (hw[0] // 2, hw[1] // 2)
        cin = wd

    x0 = jnp.asarray(rng.normal(size=(1, *hw, cin)), dt)
    dc = DoubleConv(model.bottleneck_width, dtype=dt)
    t = slope(lambda v, c: dc.apply(v, c, False), sub("bottleneck"), x0)
    total += t
    print(f"bottleneck ({hw[0]}x{hw[1]}x{cin}->512): {t:.3f} ms")
    cin = model.bottleneck_width

    for i, wd in enumerate(reversed(widths)):
        x0 = jnp.asarray(rng.normal(size=(1, *hw, cin)), dt)
        up = FastConvTranspose2x(wd, kernel=2, use_bias=True, dtype=dt)
        t_up = slope(lambda v, c, up=up: up.apply(v, c), sub(f"up{i}"), x0)
        hw = (hw[0] * 2, hw[1] * 2)
        # decoder DoubleConv sees concat(up, skip) = 2*wd channels
        x1 = jnp.asarray(rng.normal(size=(1, *hw, 2 * wd)), dt)
        dc = DoubleConv(wd, dtype=dt)
        t_dc = slope(lambda v, c, dc=dc: dc.apply(v, c, False),
                     sub(f"dec{i}"), x1)
        total += t_up + t_dc
        print(f"up{i} (->{hw[0]}x{hw[1]}x{wd}): {t_up:.3f} ms   "
              f"dec{i} ({hw[0]}x{hw[1]}x{2 * wd}->{wd}): {t_dc:.3f} ms")
        cin = wd

    print(f"sum of stages: {total:.3f} ms (whole-model slope for "
          f"comparison: scripts/bench_unet.py)")


if __name__ == "__main__":
    main()
