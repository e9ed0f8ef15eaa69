"""Phase-resident conv1_2 prototype (TPU).

If the stem emits 2x2 space-to-depth phases (bench_entry3's s2d4
conv1_1 already wins 26% and can stop before depth-to-space), the
32->64 3x3 conv can run ON the phase tensor: for output phase u and
input phase v (per axis), the valid kernel taps are i = 2a + v - u + 1
with block offset a — six (v, a) terms per axis, 36 exact
(32k, 32) @ (32, 64) matmuls in 2D, zero wasted FLOPs, every tensor
(128, 256, 128/256) lane-healthy.

Parity-checked against the stock conv on the unpacked map; timed
phase-in/phase-out (the regime where the whole stem chain stays
packed).

Usage:  python scripts/bench_entry4.py [--iters 40 200]
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
        depth_to_space, space_to_depth)

    print(f"[bench_entry4] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    n_lo, n_hi = args.iters
    h, w = args.res
    h2, w2 = h // 2, w // 2      # conv1_2's real resolution
    hq, wq = h // 4, w // 4      # phase-map resolution
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

    cin, cout = 32, 64
    k12 = jnp.asarray(rng.uniform(-1, 1, (3, 3, cin, cout)), jnp.bfloat16)
    xreal = jnp.asarray(rng.uniform(-1, 1, (1, h2, w2, cin)), jnp.bfloat16)
    xphase = space_to_depth(xreal)            # (1, hq, wq, 4*cin)

    def phase_conv3x3(z, kernel, cin, cout):
        """z: (n, hq, wq, 4*cin) 2x2-phase tensor (channel order
        (ry, rx, c)); returns (n, hq, wq, 4*cout) phases of the
        SAME-padded stride-1 3x3 conv at the unpacked resolution."""
        n = z.shape[0]
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        kb = kernel.astype(z.dtype)
        px = n * hq * wq

        def vslice(vy, vx, ay, ax):
            t = lax.dynamic_slice(
                zp, (0, 1 + ay, 1 + ax, (2 * vy + vx) * cin),
                (n, hq, wq, cin))
            return t.reshape(px, cin)

        outs = []
        for uy in (0, 1):
            for ux in (0, 1):
                acc = None
                for vy in (0, 1):
                    for ay in (-1, 0, 1):
                        iy = 2 * ay + vy - uy + 1
                        if not 0 <= iy < 3:
                            continue
                        for vx in (0, 1):
                            for ax in (-1, 0, 1):
                                ix = 2 * ax + vx - ux + 1
                                if not 0 <= ix < 3:
                                    continue
                                t = lax.dot(
                                    vslice(vy, vx, ay, ax), kb[iy, ix],
                                    preferred_element_type=jnp.float32)
                                acc = t if acc is None else acc + t
                outs.append(acc.astype(z.dtype))
        y = jnp.stack(outs, axis=1)           # (px, 4, cout)
        return y.transpose(0, 1, 2).reshape(n, hq, wq, 4 * cout)

    # Parity vs the stock conv.
    y_ref = lax.conv_general_dilated(
        xreal, k12, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_phase = jax.jit(
        lambda z: phase_conv3x3(z, k12, cin, cout))(xphase)
    y_unpacked = depth_to_space(y_phase)
    err = float(jnp.max(jnp.abs(y_unpacked.astype(jnp.float32)
                                - y_ref.astype(jnp.float32))))
    print(f"  phase conv parity max|err| = {err:.4f}")

    # Timings: stock conv (real res) vs phase-resident conv.
    def stock(x):
        y = lax.conv_general_dilated(
            x, k12, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + jnp.mean(y).astype(x.dtype)

    def phased(z):
        y = phase_conv3x3(z, k12, cin, cout)
        return z + jnp.mean(y).astype(z.dtype)

    run("conv1_2 stock XLA conv (real res)", stock, xreal)
    run("conv1_2 phase-resident (36 matmuls)", phased, xphase)

    # Same structure at block1's shapes: 64->128 and 128->128.
    for ci, co in ((64, 128), (128, 128)):
        kk = jnp.asarray(rng.uniform(-1, 1, (3, 3, ci, co)), jnp.bfloat16)
        xr = jnp.asarray(rng.uniform(-1, 1, (1, h2, w2, ci)), jnp.bfloat16)
        zp0 = space_to_depth(xr)

        def stock2(x, kk=kk):
            y = lax.conv_general_dilated(
                x, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return x + jnp.mean(y).astype(x.dtype)

        def phased2(z, kk=kk, ci=ci, co=co):
            y = phase_conv3x3(z, kk, ci, co)
            return z + jnp.mean(y).astype(z.dtype)

        run(f"3x3 {ci}->{co} stock (256,512)", stock2, xr)
        run(f"3x3 {ci}->{co} phase-resident", phased2, zp0)


if __name__ == "__main__":
    main()
