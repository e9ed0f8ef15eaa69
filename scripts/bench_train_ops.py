"""Micro A/B of TRAINING-mode (fwd+bwd) conv lowerings on the chip.

Round 3 closed the inference layout campaign (PERF.md); the train step
still uses textbook ``nn.Conv`` everywhere "by design".  But two of the
inference lowerings are plain differentiable jnp (pad + static slices +
matmuls / scaled adds) whose VJPs are themselves matmuls + pad-adds —
no custom VJP needed — so they may pay in training too:

- ``fastconv.ShiftMatmulConv3x3``: XLA's atrous conv lowering ran ASPP's
  dilated branches at ~30 TF/s forward (scripts/bench_dilated.py);
  training triples the FLOPs (fwd + dgrad + wgrad) through the same
  lowering.
- ``fastconv.DepthwiseConv3x3Shift``: grouped convs have contraction
  dim 1 (zero MXU work); their BACKWARD (a grouped conv transpose +
  per-group wgrad) is another candidate for the shifted elementwise
  form.

This harness slope-measures value_and_grad (wrt x AND k) of each
lowering pair at training-representative shapes, chained through a
serial ``lax.scan`` (grads perturb the carry so nothing constant-folds;
two iteration counts, slope — PERF.md round-2 methodology).

Usage:  python scripts/bench_train_ops.py [--batch 8] [--iters 6 18]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(6, 18))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cases", nargs="+", default=("dilated", "depthwise"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    print(f"[bench_train_ops] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters
    b = args.batch
    rng = np.random.default_rng(0)

    def scan_slope(loss_fn, x0, k0):
        """Slope of value_and_grad(loss_fn) chained through lax.scan."""
        vg = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def prog(carry, n):
            def body(c, _):
                x, k = c
                _, (gx, gk) = vg(x, k)
                return (x + 1e-6 * gx.astype(x.dtype),
                        k + 1e-6 * gk.astype(k.dtype)), None
            out, _ = jax.lax.scan(body, carry, None, length=n)
            return out

        def run(f):
            # block_until_ready returns EARLY through the tunnel; a host
            # READ of the result is the only reliable fence (CLAUDE.md).
            out = f((x0, k0))
            return float(jnp.sum(out[1].astype(jnp.float32)))

        ts = []
        for n in (n_lo, n_hi):
            f = jax.jit(lambda c, n=n: prog(c, n))
            run(f)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                run(f)
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt = ts[1] - ts[0]
        return float("nan") if dt <= 0 else dt / (n_hi - n_lo) * 1e3

    if "dilated" in args.cases:
        # MNv2 ASPP shape at 1024x512 training res: (b, 32, 64, 320)->256.
        for h, w, cin, cout in ((32, 64, 320, 256), (32, 64, 2048, 256)):
            x0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, cin)),
                             jnp.bfloat16)
            k0 = jnp.asarray(rng.uniform(-0.05, 0.05, (3, 3, cin, cout)),
                             jnp.float32)
            gflop = 3 * b * 9 * h * w * cin * cout * 2 / 1e9  # fwd+dgrad+wgrad
            print(f"-- dilated 3x3 ({b},{h},{w},{cin})->{cout} "
                  f"train ~{gflop:.1f} GFLOP --")

            for rate in (6, 12, 18):
                def loss_conv(x, k, rate=rate):
                    y = jax.lax.conv_general_dilated(
                        x, k.astype(jnp.bfloat16), (1, 1), "SAME",
                        rhs_dilation=(rate, rate),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

                def loss_shift(x, k, rate=rate):
                    xp = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate),
                                     (0, 0)))
                    kb = k.astype(jnp.bfloat16)
                    y = None
                    for dy in range(3):
                        for dx in range(3):
                            tap = xp[:, dy * rate:dy * rate + h,
                                     dx * rate:dx * rate + w, :]
                            t = tap.reshape(b * h * w, cin) @ kb[dy, dx]
                            y = t if y is None else y + t
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

                ms_c = scan_slope(loss_conv, x0, k0)
                ms_s = scan_slope(loss_shift, x0, k0)
                print(f"rate {rate:2d}: XLA conv {ms_c:7.3f} ms "
                      f"({gflop / max(ms_c, 1e-9):6.1f} TF/s)   "
                      f"shift+matmul {ms_s:7.3f} ms "
                      f"({gflop / max(ms_s, 1e-9):6.1f} TF/s)")

    if "depthwise" in args.cases:
        # Representative depthwise shapes: MNv2 ir-block @ 1024x512 train
        # res (dilation 1 and 2) and Xception middle flow @ 512x256.
        for h, w, c, rate in ((64, 128, 192, 1), (32, 64, 960, 2),
                              (16, 32, 728, 1)):
            x0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), jnp.bfloat16)
            k0 = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 1, c)),
                             jnp.float32)
            print(f"-- depthwise 3x3 ({b},{h},{w},{c}) rate {rate} --")

            def loss_grouped(x, k, rate=rate, c=c):
                y = jax.lax.conv_general_dilated(
                    x, k.astype(jnp.bfloat16), (1, 1), "SAME",
                    rhs_dilation=(rate, rate), feature_group_count=c,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

            def loss_shifted(x, k, rate=rate, h=h, w=w):
                kb = k[:, :, 0, :].astype(jnp.bfloat16)
                xp = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate),
                                 (0, 0)))
                y = None
                for dy in range(3):
                    for dx in range(3):
                        t = (xp[:, dy * rate:dy * rate + h,
                                dx * rate:dx * rate + w, :] * kb[dy, dx])
                        y = t if y is None else y + t
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

            ms_g = scan_slope(loss_grouped, x0, k0)
            ms_s = scan_slope(loss_shifted, x0, k0)
            print(f"XLA grouped {ms_g:7.3f} ms   "
                  f"shifted-FMA {ms_s:7.3f} ms")


if __name__ == "__main__":
    main()
