"""A/B the UNet transposed narrow-stage layout on the attached TPU.

BASELINE config 3's model.  Host-chained slope (see bench_segformer.py)
of the full forward at 512x256 for a sweep of ``chw_max_width`` gates
(0 = stock NHWC everywhere).

Usage:  python scripts/bench_unet.py [--gates 0 32 64] [--iters 10 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gates", type=int, nargs="+", default=(0, 32, 64))
    ap.add_argument("--res", type=int, nargs=2, default=(256, 512))
    ap.add_argument("--iters", type=int, nargs=2, default=(10, 30))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.unet import UNet

    h, w = args.res
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (1, h, w, 3),
                            jnp.float32)
    base = UNet()
    v = jax.jit(lambda k, x: base.init(k, x, train=False))(
        jax.random.PRNGKey(1), x0[:, :64, :64, :])
    print(f"[bench_unet] @ {h}x{w} on {jax.devices()[0].device_kind}",
          file=sys.stderr)

    def slope(module):
        @jax.jit
        def step(variables, x):
            y = module.apply(variables, x, train=False)
            p = jnp.tanh(jnp.mean(y, axis=-1, keepdims=True)) * 0.01
            return jnp.clip(x + p, 0.0, 1.0)

        def run(n):
            c = step(v, x0)
            float(jnp.sum(c))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                c = x0
                for _ in range(n):
                    c = step(v, c)
                float(jnp.sum(c))
                best = min(best, time.perf_counter() - t0)
            return best

        ts = [run(n) for n in args.iters]
        return (ts[1] - ts[0]) / (args.iters[1] - args.iters[0]) * 1e3

    for g in args.gates:
        t = slope(UNet(chw_max_width=g))
        print(f"chw_max_width={g}: {t:.3f} ms/frame ({1e3 / t:.1f} fps)")


if __name__ == "__main__":
    main()
