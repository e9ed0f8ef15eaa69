#!/usr/bin/env python3
"""enet vs enet_fused forward A/B with the round-3 serving machinery.

VERDICT r3 weak #5 / next-step #6: the Pallas fused-bottleneck trunk
(models/enet_fused.py) was frozen on a round-2 A/B taken before packed
weights, bf16 weight caches, and the auto block-size lessons existed.
This harness re-runs the honest comparison under the current stack:
serial-scan slope (device time only — dispatch marshaling, which
packing addresses, is hoisted out of the loop and identical for both),
plus the w16 weight-cache variant of each.

Usage:  python scripts/bench_enet_fused.py [--iters 30 90]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(30, 90))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from bugcar_image_segmentation_tpu.configs import ModelConfig
    from bugcar_image_segmentation_tpu.models.api import build_engine

    print(f"[bench_enet_fused] on {jax.devices()[0].device_kind}",
          file=sys.stderr)

    n_lo, n_hi = args.iters

    def scan_slope(apply_fn, variables, x0):
        # Weights ride as a jit ARGUMENT (never a trace-time closure —
        # CLAUDE.md rule): a closed-over tree would let XLA
        # constant-fold the per-leaf f32→bf16 weight converts that the
        # w16 cache exists to remove, biasing this exact A/B.
        def prog(v, x, n):
            def step(c, i):
                f = c + (i.astype(c.dtype) * 1e-6)   # defeat LICM
                y = apply_fn(v, f, train=False)
                # feed a scalar of the output back into the carry so the
                # scan is serially dependent
                return c + y[0, 0, 0, :3].astype(c.dtype) * 1e-9, None
            y, _ = jax.lax.scan(step, x, jnp.arange(n, dtype=jnp.int32))
            return y
        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda v, x, n=n: prog(v, x, n))
            float(jnp.sum(f(variables, x0).astype(jnp.float32)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                # Host READ as the fence: block_until_ready returns
                # EARLY through the tunnel (CLAUDE.md / PERF.md round
                # 3f) and can time a dispatch as ~nothing.
                float(jnp.sum(f(variables, x0).astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt = ts[1] - ts[0]
        return float("nan") if dt <= 0 else dt / (n_hi - n_lo)

    cfg = ModelConfig()  # ENet 512x256 bf16
    x0 = jnp.zeros((1, cfg.input_height, cfg.input_width, 3), jnp.bfloat16)

    rows = []
    for name in ("enet", "enet_fused", "enet_w16", "enet_fused_w16"):
        eng = build_engine(name, ModelConfig())
        dt = scan_slope(eng.apply_fn, eng.variables, x0)
        rows.append((name, dt * 1e3))
        print(f"{name:16s} forward {dt * 1e3:7.3f} ms "
              f"({1.0 / dt:6.0f} fps)")
    base = rows[0][1]
    for name, ms in rows[1:]:
        print(f"{name:16s} vs enet: x{base / ms:.2f}")


if __name__ == "__main__":
    main()
