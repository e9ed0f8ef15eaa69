#!/usr/bin/env python3
"""Slope-measure SegFormer engine variants by name (round-4 harness).

Serial-scan slope over the full engine forward (preprocess included),
with the two round-4 harness rules applied: the weight tree rides as a
jit ARGUMENT (a closed-over tree lets XLA fold the f32→bf16 weight
converts differently per variant — it skewed w16 A/Bs, PERF.md round
4c) and the fence is a host READ (block_until_ready returns early
through the tunnel).  Used for the `_hc` / `_q` / `_int8` / size
A/Bs (PERF.md rounds 4e+).

Usage:  python scripts/bench_segformer_variants.py b2 b2_hc [--res 1024]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+",
                    help="segformer suffixes (b0, b2_hc, b0_q_hc, ...)")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--iters", type=int, nargs=2, default=(6, 18))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from bugcar_image_segmentation_tpu.configs import ModelConfig
    from bugcar_image_segmentation_tpu.models.api import build_engine

    print(f"[bench_segformer_variants] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters

    def scan_slope(engine, x0):
        def prog(v, x, n):
            def step(c, _):
                y = engine._forward(v, c)
                p = (jnp.mean(y[..., 0].astype(jnp.float32))
                     * 1e-3).astype(c.dtype)
                return jnp.clip(c + p, 0.0, 1.0), None
            y, _ = jax.lax.scan(step, x, None, length=n)
            return y
        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda v, x, n=n: prog(v, x, n))
            float(jnp.sum(f(engine.variables, x0).astype(jnp.float32)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(f(engine.variables, x0).astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt = ts[1] - ts[0]
        return float("nan") if dt <= 0 else dt / (n_hi - n_lo) * 1e3

    rng = np.random.default_rng(0)
    r = args.res
    x0 = jnp.asarray(rng.uniform(0, 1, (1, r, r, 3)).astype(np.float32))
    for v in args.variants:
        name = f"segformer_{v}"
        cfg = ModelConfig(name=name, input_width=r, input_height=r,
                          num_classes=15)
        eng = build_engine(name, cfg)
        t = scan_slope(eng, x0)
        print(f"{name:22s} forward @{r}x{r}: {t:.3f} ms ({1e3 / t:.0f} fps)")


if __name__ == "__main__":
    main()
