"""Last stem candidates: im2col-matmul conv1_2 and s2d4 conv1_1 (TPU).

bench_entry.py showed every transposed/packed lowering LOSES to XLA's
stock conv at the Xception stem scale (512,1024,3).  Two remaining
shapes of attack, both staying NHWC (no lane-starved relayouts):

  conv1_2 (32->64 3x3 @ (256,512)):  nine-tap concat on the CHANNEL dim
      -> one (131k, 288) @ (288, 64) matmul (75 MB im2col, HBM-bound
      but a single clean MXU op vs XLA's 15 TF/s conv).
  conv1_1 (3->32 s2 @ (512,1024)):   4x4 space-to-depth -> (128,256,48)
      -> 2x2 conv emitting 4 output phases (128 ch) -> depth-to-space.
      The only touch of the 3-channel tensor is the one s2d4 reshape.

Usage:  python scripts/bench_entry3.py [--iters 40 200]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(40, 200))
    ap.add_argument("--res", type=int, nargs=2, default=(512, 1024))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.fastconv import (
        depth_to_space, space_to_depth4)

    print(f"[bench_entry3] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters
    h, w = args.res
    rng = np.random.default_rng(0)

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

    h2, w2 = h // 2, w // 2
    half = jnp.asarray(rng.uniform(-1, 1, (1, h2, w2, 32)), jnp.bfloat16)
    rgb = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)), jnp.bfloat16)
    k12 = jnp.asarray(rng.uniform(-1, 1, (3, 3, 32, 64)), jnp.bfloat16)
    k11 = jnp.asarray(rng.uniform(-1, 1, (3, 3, 3, 32)), jnp.bfloat16)

    # --- conv1_2 stock vs im2col ------------------------------------
    def c2_stock(x):
        y = lax.conv_general_dilated(
            x, k12, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + jnp.mean(y).astype(x.dtype)

    def c2_im2col(x):
        n = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, dy:dy + h2, dx:dx + w2, :]
                for dy in range(3) for dx in range(3)]
        xc = jnp.concatenate(taps, axis=-1).reshape(n * h2 * w2, 9 * 32)
        wm = k12.reshape(9 * 32, 64)
        y = lax.dot(xc, wm, preferred_element_type=jnp.float32)
        return x + jnp.mean(y).astype(x.dtype)

    run("conv1_2 stock XLA conv", c2_stock, half)
    run("conv1_2 im2col (131k,288)@(288,64)", c2_im2col, half)

    # --- conv1_1 stock vs s2d4 two-phase ------------------------------
    def c1_stock(x):
        y = lax.conv_general_dilated(
            x, k11, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + jnp.mean(y).astype(x.dtype)

    # Derivation: with X[q, t] = x[4q + t] (s2d4 phases t in 0..3) and
    # SAME pad lo 0 (even dims), output o = 2(2q + u) + r', i.e. output
    # phase u in {0,1} per axis reads rows {4q+2u+i : i=0..2}; for u=1
    # row 4q+4 = X[q+1, 0].  So a 2-tap conv over q with per-(u,i) taps:
    #   y[q, u] = sum_i W[i] . X[q + ((2u+i)>>2), (2u+i)&3]
    def c1_s2d4(x):
        n = x.shape[0]
        xp4 = space_to_depth4(x)                 # (n, h/4, w/4, 48)
        hq, wq = h // 4, w // 4
        xpp = jnp.pad(xp4, ((0, 0), (0, 1), (0, 1), (0, 0)))
        # Build the 2x2-tap im2col: taps (a, b) in {0,1}^2 of 48ch each.
        taps = [xpp[:, a:a + hq, b:b + wq, :] for a in (0, 1)
                for b in (0, 1)]
        xc = jnp.concatenate(taps, axis=-1)      # (n, hq, wq, 192)
        xm = xc.reshape(n * hq * wq, 192)
        # Weight (192, 4*32): rows ordered (a, b, ry, rx, ci); cols
        # (uy, ux, co) to match depth_to_space's (row-phase, col-phase).
        wrows = []
        for a in (0, 1):
            for b in (0, 1):
                for ry in range(4):
                    for rx in range(4):
                        cols = []
                        for uy in (0, 1):
                            for ux in (0, 1):
                                iy = 4 * a + ry - 2 * uy
                                ix = 4 * b + rx - 2 * ux
                                if 0 <= iy < 3 and 0 <= ix < 3:
                                    cols.append(k11[iy, ix])     # (3, 32)
                                else:
                                    cols.append(jnp.zeros((3, 32),
                                                          k11.dtype))
                        wrows.append(jnp.concatenate(
                            [c for c in cols], axis=-1))         # (3, 128)
        wm = jnp.stack(wrows, 0).reshape(16 * 4, 3, 128)
        wm = wm.transpose(0, 1, 2).reshape(192, 128)
        y = lax.dot(xm, wm.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        y = depth_to_space(y.reshape(n, hq, wq, 128).astype(x.dtype))
        return x + jnp.mean(y).astype(x.dtype)

    r_stock = run("conv1_1 stock XLA conv", c1_stock, rgb)

    # Parity check once before timing the variant.
    import numpy as onp
    y_ref = lax.conv_general_dilated(
        rgb, k11, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def c1_s2d4_raw(x):
        n = x.shape[0]
        xp4 = space_to_depth4(x)
        hq, wq = h // 4, w // 4
        xpp = jnp.pad(xp4, ((0, 0), (0, 1), (0, 1), (0, 0)))
        taps = [xpp[:, a:a + hq, b:b + wq, :] for a in (0, 1)
                for b in (0, 1)]
        xc = jnp.concatenate(taps, axis=-1)
        xm = xc.reshape(n * hq * wq, 192)
        wrows = []
        for a in (0, 1):
            for b in (0, 1):
                for ry in range(4):
                    for rx in range(4):
                        cols = []
                        for uy in (0, 1):
                            for ux in (0, 1):
                                iy = 4 * a + ry - 2 * uy
                                ix = 4 * b + rx - 2 * ux
                                if 0 <= iy < 3 and 0 <= ix < 3:
                                    cols.append(k11[iy, ix])
                                else:
                                    cols.append(jnp.zeros((3, 32),
                                                          k11.dtype))
                        wrows.append(jnp.concatenate(cols, axis=-1))
        wm = jnp.stack(wrows, 0).reshape(192, 128)
        y = lax.dot(xm, wm.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return depth_to_space(y.reshape(n, hq, wq, 128).astype(x.dtype))

    y_new = jax.jit(c1_s2d4_raw)(rgb)
    err = float(jnp.max(jnp.abs(y_new.astype(jnp.float32)
                                - y_ref.astype(jnp.float32))))
    print(f"  s2d4 parity max|err| = {err:.4f} "
          f"(bf16 accum differences expected ~0.1)")
    run("conv1_1 s2d4 (32k,192)@(192,128) + d2s", c1_s2d4, rgb)


if __name__ == "__main__":
    main()
