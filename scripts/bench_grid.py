"""A/B the occupancy-grid build: parity warp vs cell-resolution native.

Slope-measures (lax.scan, serially chained) the standalone grid build
and the full fused frame→grid pipeline in both modes on the attached
TPU.  VERDICT r2 item 3: the 400² warp gather is ~0.43 ms of the
0.50 ms grid build because gathers pay per index; the native mode
gathers at the 80² cells only.

Usage:  python scripts/bench_grid.py [--iters 50 150]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(50, 150))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from __graft_entry__ import _toy_calibration
    from bugcar_image_segmentation_tpu.configs import GridConfig, ModelConfig
    from bugcar_image_segmentation_tpu.grid import OccupancyGridBuilder
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.pipeline import Pipeline

    cfg = ModelConfig()
    cal = _toy_calibration((cfg.input_height, cfg.input_width))
    gc = GridConfig(8.0, 8.0, 0.1)
    print(f"[bench_grid] on {jax.devices()[0].device_kind}",
          file=sys.stderr)

    def scan_slope(body, x0, n_lo, n_hi):
        def prog(x, n):
            def step(c, _):
                return body(c), None
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

    rng = np.random.default_rng(0)
    seg0 = jnp.asarray(rng.integers(0, 3, (cfg.input_height,
                                           cfg.input_width), np.uint8))

    for interp in ("cv2_linear", "native"):
        b = OccupancyGridBuilder(cal, gc, interpolation=interp)

        def gbody(seg, b=b):
            g = b.build(seg)
            # chain: fold the grid back into the segmap so nothing is dead
            p = (jnp.sum(g.astype(jnp.int32)) % 3).astype(jnp.uint8)
            return (seg + p) % 3

        t = scan_slope(gbody, seg0, *args.iters)
        print(f"grid build [{interp:10s}]: {t:.3f} ms")

    engine = build_engine("enet", cfg)
    frame0 = jnp.asarray(rng.integers(0, 256, (cfg.input_height,
                                               cfg.input_width, 3),
                                      np.uint8))
    for interp in ("cv2_linear", "native"):
        pipe = Pipeline(engine, cal, gc, interpolation=interp)

        def pbody(fr, pipe=pipe):
            g, _ = pipe._run_impl(engine.variables, fr)
            p = (jnp.sum(g.astype(jnp.int32)) % 2).astype(jnp.uint8)
            return fr ^ p

        t = scan_slope(pbody, frame0, *args.iters)
        print(f"frame->grid [{interp:10s}]: {t:.3f} ms ({1e3/t:.0f} fps)")

    # BASELINE config 4: the 4-camera rig + max-merge stitch.
    from bugcar_image_segmentation_tpu.pipeline import MultiCameraPipeline
    cals = [_toy_calibration((cfg.input_height, cfg.input_width))
            for _ in range(4)]
    frames0 = jnp.asarray(rng.integers(
        0, 256, (4, cfg.input_height, cfg.input_width, 3), np.uint8))
    for interp in ("cv2_linear", "native"):
        rig = MultiCameraPipeline(engine, cals, gc, interpolation=interp)

        def rbody(fr, rig=rig):
            logits = engine._forward(engine.variables, fr)
            from bugcar_image_segmentation_tpu.models import remap
            from bugcar_image_segmentation_tpu.pipeline import stitch_grids
            segs = remap.logits_to_drivability(logits, engine.remap_table)
            grids = [b.build(segs[k]) for k, b in enumerate(rig.builders)]
            g = stitch_grids(jnp.stack(grids))
            p = (jnp.sum(g.astype(jnp.int32)) % 2).astype(jnp.uint8)
            return fr ^ p

        t = scan_slope(rbody, frames0, args.iters[0] // 2,
                       args.iters[1] // 2)
        print(f"4-cam rig   [{interp:10s}]: {t:.3f} ms/rig "
              f"({1e3/t:.0f} rig-fps)")


if __name__ == "__main__":
    main()
