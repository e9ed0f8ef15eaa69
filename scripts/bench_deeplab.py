"""Slope-measure BASELINE config 2: DeepLabV3+ @ 1024x512.

The PERF.md config-2 row is still the round-1 measurement (4.43 ms
full pipeline, old biased timing); this harness refreshes it with the
round-2+ methodology (serially chained ``lax.scan`` slopes): the bare
forward for both DeepLab backbones (MobileNetV2 rebuild and the
architecture-faithful Xception-65 twin of the real ``deeplab.pb``,
reference models.py:98-113), the serving predict path (argmax+remap,
optionally at the head's native 1/4 res), and the full fused
frame->grid pipeline in both grid interpolation modes.

Usage:  python scripts/bench_deeplab.py [--iters 8 24] \
            [--models deeplab xception] [--head full quarter]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(8, 24))
    ap.add_argument("--models", nargs="+",
                    default=("deeplab", "xception"))
    ap.add_argument("--head", nargs="+", default=("full",),
                    choices=("full", "quarter"))
    ap.add_argument("--skip-pipeline", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from __graft_entry__ import _toy_calibration
    from bugcar_image_segmentation_tpu.configs import GridConfig
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.pipeline import Pipeline

    print(f"[bench_deeplab] on {jax.devices()[0].device_kind}",
          file=sys.stderr)

    def scan_slope(body, variables, x0, n_lo, n_hi):
        # Weights ride as a jit ARGUMENT and the fence is a host READ
        # (round-4 harness corrections: a closed-over tree lets XLA
        # fold the f32->bf16 weight converts differently per variant —
        # it skewed the w16 A/Bs — and block_until_ready returns early
        # through the tunnel).
        def prog(v, x, n):
            def step(c, _):
                return body(v, c), None
            y, _ = jax.lax.scan(step, x, None, length=n)
            return y
        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda v, x, n=n: prog(v, x, n))
            float(jnp.sum(f(variables, x0).astype(jnp.float32)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(f(variables, x0).astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt = ts[1] - ts[0]
        return float("nan") if dt <= 0 else dt / (n_hi - n_lo) * 1e3

    rng = np.random.default_rng(0)

    for name in args.models:
        for head in args.head:
            eng_name = name if head == "full" else name + "_q"
            try:
                engine = build_engine(eng_name)
            except ValueError as e:
                print(f"{eng_name}: skipped ({e})")
                continue
            cfg = engine.cfg
            h, w = cfg.input_height, cfg.input_width
            x0 = jnp.asarray(
                rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))

            def fbody(v, x, engine=engine):
                y = engine._forward(v, x)
                p = (jnp.mean(y[..., 0].astype(jnp.float32))
                     * 1e-3).astype(x.dtype)
                return jnp.clip(x + p, 0.0, 1.0)

            t = scan_slope(fbody, engine.variables, x0, *args.iters)
            print(f"{eng_name:12s} forward @ {w}x{h}: {t:.3f} ms "
                  f"({1e3 / t:.0f} fps)")

            if args.skip_pipeline:
                continue
            cal = _toy_calibration((h, w))
            gc = GridConfig(8.0, 8.0, 0.1)
            frame0 = jnp.asarray(
                rng.integers(0, 256, (h, w, 3), np.uint8))
            for interp in ("cv2_linear", "native"):
                pipe = Pipeline(engine, cal, gc, interpolation=interp)

                def pbody(v, fr, pipe=pipe):
                    g, _ = pipe._run_impl(v, fr)
                    p = (jnp.sum(g.astype(jnp.int32)) % 2).astype(jnp.uint8)
                    return fr ^ p

                t = scan_slope(pbody, engine.variables, frame0,
                               *args.iters)
                print(f"{eng_name:12s} frame->grid [{interp:10s}]: "
                      f"{t:.3f} ms ({1e3 / t:.0f} fps)")


if __name__ == "__main__":
    main()
