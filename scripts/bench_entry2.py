"""Floor-cost probes for the entry stem (TPU): what does merely
CARRYING an (H, W, 3) NHWC tensor cost, and does a CHW-resident frame
(pixels on lanes, 3 channels on sublanes) change the stem economics?

Companion to scripts/bench_entry.py; informs whether the pipeline
should keep the frame transposed from preprocess onward.

Usage:  python scripts/bench_entry2.py [--iters 8 24] [--res 512 1024]
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
    from jax import lax

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.fastconv import FastStemConv2x

    print(f"[bench_entry2] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
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

    def run(label, fn, x0):
        ms = scan_slope(fn, x0)
        print(f"{label:52s} {ms:7.3f} ms")
        return ms

    nhwc = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)), jnp.bfloat16)
    chw = jnp.asarray(rng.uniform(-1, 1, (3, h * w)), jnp.bfloat16)
    big = jnp.asarray(rng.uniform(-1, 1, (1, h // 2, w // 2, 64)),
                      jnp.bfloat16)

    # Floors: carry-only chains.
    run("identity+1 on (512,1024,3) NHWC", lambda x: x + 1, nhwc)
    run("identity+1 on (3, 512*1024) CHW", lambda x: x + 1, chw)
    run("identity+1 on (256,512,64) NHWC", lambda x: x + 1, big)

    # Bare conv1_1 without BN (stock XLA).
    kern = jnp.asarray(rng.uniform(-1, 1, (3, 3, 3, 32)), jnp.bfloat16)

    def conv_s2(x):
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), kern, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + jnp.mean(y).astype(x.dtype)

    run("bare conv1_1 stock (no BN)", conv_s2, nhwc)

    # Bare conv1_1 from a CHW-resident frame: FastStemConv2x chw_in_nhw
    # (pure reshapes + one (32, 16*3)@(48, px/4) matmul), output CHW.
    stem = FastStemConv2x(32)
    v = jax.jit(lambda k, x: stem.init(
        k, x, chw_in_nhw=(1, h, w)))(key, chw.reshape(3, h * w))

    def chw_stem(x):
        y = stem.apply(v, x, chw_in_nhw=(1, h, w))
        return x + jnp.mean(y).astype(x.dtype)

    run("conv1_1 from CHW frame (chw_in_nhw, CHW out)", chw_stem, chw)

    # And with the transpose back to NHWC included.
    def chw_stem_back(x):
        y = stem.apply(v, x, chw_in_nhw=(1, h, w))
        y = y.T.reshape(1, h // 2, w // 2, 32)
        return x + jnp.mean(y).astype(x.dtype)

    run("conv1_1 from CHW frame + transpose to NHWC", chw_stem_back, chw)

    # f32 input vs bf16 (the serving path feeds f32 from preprocess).
    nhwc32 = nhwc.astype(jnp.float32)
    run("bare conv1_1 stock, f32 input", conv_s2, nhwc32)


if __name__ == "__main__":
    main()
