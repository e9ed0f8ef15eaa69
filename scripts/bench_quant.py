"""A/B the SegFormer float vs int8 (W8A8) forward on the attached TPU.

The reference has no quantization capability; this measures the TPU-native
int8 addition (ops/quant.py) on BASELINE config 5's model family.  Uses
the serial-scan-slope methodology from PERF.md (single-dispatch walls are
meaningless through the tunnel): the model's logits perturb the next
iteration's input, so no iteration can be elided, and per-frame time is
the slope between two iteration counts.

Usage:  python scripts/bench_quant.py [--size b0] [--res 1024] \
            [--iters 8 24]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="b0")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--iters", type=int, nargs=2, default=(8, 24))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.segformer import SegFormer

    r = args.res
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (1, r, r, 3),
                            jnp.float32)

    mf = SegFormer.preset(args.size)
    mq = SegFormer.preset(args.size, quant=True)
    # Jitted init — see bench_segformer.py (eager init through the
    # tunnel costs minutes; this was the round-2 B3 A/B "compile
    # timeout").
    v = jax.jit(lambda k, x: mf.init(k, x, train=False))(
        jax.random.PRNGKey(1), x0[:, :64, :64, :])
    # init on a small input (SegFormer is fully convolutional /
    # shape-agnostic in params), then run at full res
    print(f"[bench_quant] {args.size} @ {r}x{r} on "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)

    def slope(module):
        # ONE compiled program per variant (scan-in-jit would need a
        # separate compile per iteration count — too slow at 1024²);
        # serial dependence comes from chaining at the host: each step's
        # input is the previous step's output device array, and all
        # logits fold into the next input so nothing is dead.  Dispatches
        # pipeline asynchronously, so tunnel RPC overhead overlaps device
        # compute; the residual fixed cost cancels in the slope.
        @jax.jit
        def step(variables, x):
            y = module.apply(variables, x, train=False)
            p = jnp.tanh(jnp.mean(y, axis=-1, keepdims=True)) * 0.01
            return jnp.clip(x + p, 0.0, 1.0)

        def run(n):
            c = step(v, x0)
            float(jnp.sum(c))  # warm + force
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

    tf_ = slope(mf)
    tq = slope(mq)
    print(f"float ({mf.dtype.__name__ if hasattr(mf.dtype, '__name__') else mf.dtype}): "
          f"{tf_:.2f} ms/frame ({1e3 / tf_:.1f} fps)")
    print(f"int8 W8A8: {tq:.2f} ms/frame ({1e3 / tq:.1f} fps)  "
          f"speedup x{tf_ / tq:.2f}")


if __name__ == "__main__":
    main()
