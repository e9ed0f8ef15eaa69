"""A/B the batched pipeline's VMEM chunking on the attached TPU.

PERF.md round 2: the ENet fused pipeline at batch 8 ran 2x slower per
frame than batch 1/4 — the packed warp sources + stem activations
overflow VMEM and the program turns HBM-bound.  pipeline.py now chunks
batches >4 through a ``lax.map`` of 4-frame vmapped chunks.  This
script slope-measures ms/frame at batch 1/4/8 through the chunked
program (and the old monolithic vmap for reference).

Usage:  python scripts/bench_batch.py [--iters 20 60]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs=2, default=(20, 60))
    ap.add_argument("--model", default="enet",
                    help="engine name (enet, unet = BASELINE config 3, …)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from __graft_entry__ import _toy_calibration
    from bugcar_image_segmentation_tpu.configs import GridConfig, ModelConfig
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.pipeline import Pipeline

    if args.model == "enet":
        cfg = ModelConfig()
    else:
        cfg = ModelConfig(name=args.model, input_width=512,
                          input_height=256, num_classes=15)
    engine = build_engine(args.model, cfg)
    cal = _toy_calibration((cfg.input_height, cfg.input_width))
    pipe = Pipeline(engine, cal, GridConfig(8.0, 8.0, 0.1))
    print(f"[bench_batch] {args.model} on {jax.devices()[0].device_kind}",
          file=sys.stderr)

    frame = np.random.default_rng(0).integers(
        0, 256, (cfg.input_height, cfg.input_width, 3), np.uint8)

    def slope(fn, x, n_lo, n_hi, per_iter):
        @jax.jit
        def step(v, x):
            g = fn(v, x)
            # feed the grids back into the frame so iterations chain
            perturb = (jnp.sum(g.astype(jnp.int32)) % 2).astype(jnp.uint8)
            return x ^ perturb
        ts = []
        for n in (n_lo, n_hi):
            c = step(engine.variables, x)
            jax.block_until_ready(c)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                c = x
                for _ in range(n):
                    c = step(engine.variables, c)
                jax.block_until_ready(c)
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[1] - ts[0]) / ((n_hi - n_lo) * per_iter) * 1e3

    run_one = lambda v, f: pipe._run_impl(v, f)[0]

    def chunked(v, f):
        k = f.shape[0]
        fr = f.reshape((k // 4, 4) + f.shape[1:])
        g = jax.lax.map(
            lambda c: jax.vmap(run_one, in_axes=(None, 0))(v, c), fr)
        return g.reshape((k,) + g.shape[2:])

    def monolith(v, f):
        return jax.vmap(run_one, in_axes=(None, 0))(v, f)

    x1 = jnp.asarray(frame)
    t1 = slope(run_one, x1, *args.iters, 1)
    print(f"batch 1:           {t1:.3f} ms/frame")

    for k in (4, 8, 16):
        xk = jnp.asarray(np.stack([frame] * k))
        fn = monolith if k <= 4 else chunked
        tk = slope(fn, xk, *args.iters, k)
        tag = "vmap   " if k <= 4 else "chunked"
        print(f"batch {k} {tag}: {tk:.3f} ms/frame")
        if k > 4:
            tm = slope(monolith, xk, *args.iters, k)
            print(f"batch {k} monolith: {tm:.3f} ms/frame")


if __name__ == "__main__":
    main()
