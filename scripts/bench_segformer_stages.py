"""Per-stage cost breakdown of the (transposed) SegFormer forward.

Times B0@1024² with block depths cumulatively enabled —
(0,0,0,0) → (2,0,0,0) → … → (2,2,2,2) — so consecutive differences
isolate each stage's block cost; the (0,0,0,0) run is embeds + norms +
decode head.  Host-chained slope (see bench_segformer.py).

Usage:  python scripts/bench_segformer_stages.py [--size b0]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="b0")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--iters", type=int, nargs=2, default=(6, 18))
    ap.add_argument("--chw", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.segformer import (
        SEGFORMER_PRESETS, SegFormer)

    r = args.res
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (1, r, r, 3),
                            jnp.float32)
    preset = SEGFORMER_PRESETS[args.size]
    full_depths = preset["depths"]

    def slope(module, variables):
        @jax.jit
        def step(v, x):
            y = module.apply(v, x, train=False)
            p = jnp.tanh(jnp.mean(y, axis=-1, keepdims=True)) * 0.01
            return jnp.clip(x + p, 0.0, 1.0)

        def run(n):
            c = step(variables, x0)
            float(jnp.sum(c))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                c = x0
                for _ in range(n):
                    c = step(variables, c)
                float(jnp.sum(c))
                best = min(best, time.perf_counter() - t0)
            return best

        ts = [run(n) for n in args.iters]
        return (ts[1] - ts[0]) / (args.iters[1] - args.iters[0]) * 1e3

    print(f"[stages] {args.size} @ {r}² chw_stages={args.chw} on "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)
    prev = None
    for k in range(5):
        depths = tuple(full_depths[s] if s < k else 0 for s in range(4))
        m = SegFormer(**{**preset, "depths": depths},
                      chw_stages=args.chw)
        v = jax.jit(lambda key, x, m=m: m.init(key, x, train=False))(
            jax.random.PRNGKey(1), x0[:, :64, :64, :])
        t = slope(m, v)
        delta = "" if prev is None else f"  (Δ stage{k - 1} blocks: " \
                                        f"{t - prev:+.2f} ms)"
        label = "embeds+norms+head" if k == 0 else f"+stage{k - 1} blocks"
        print(f"depths={depths}: {t:.2f} ms  [{label}]{delta}")
        prev = t


if __name__ == "__main__":
    main()
