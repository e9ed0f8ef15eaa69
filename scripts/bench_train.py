"""Slope-measure training throughput (img/s) for the backbone zoo.

The reference ships only frozen graphs (its one train→deploy tool is
``freeze_session``, reference utils.py:49-83); the rebuild's training
direction (training/trainer.py) had no measured numbers.  This harness
chains REAL optimizer steps through a ``lax.scan`` (the carried
TrainState feeds the next step, and the loss perturbs the next batch so
nothing constant-folds) at two iteration counts and reports the slope —
the same tunnel-immune methodology as the inference benches (PERF.md
round-2 notes).

Usage:  python scripts/bench_train.py [--models enet unet] \
            [--batches 8 16] [--iters 4 12]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=("enet", "unet", "deeplab", "segformer_b0"))
    ap.add_argument("--batches", type=int, nargs="+", default=(8,))
    ap.add_argument("--iters", type=int, nargs=2, default=(4, 12))
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the forward (trade FLOPs for HBM)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.training.trainer import (
        TrainState, make_train_step)

    print(f"[bench_train] on {jax.devices()[0].device_kind}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    # Training resolutions: the models' serving resolutions, except the
    # 1024-class where batch x res x grads would spill HBM pointlessly.
    shapes = {"enet": (256, 512), "unet": (256, 512),
              "deeplab": (512, 1024), "segformer_b0": (512, 512),
              "segformer_b2": (512, 512)}

    for name in args.models:
        h, w = shapes.get(name, (256, 512))
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        cfg = ModelConfig(name=name, input_width=w, input_height=h,
                          num_classes=15)
        engine = build_engine(name, cfg)   # jitted init (api.py)
        model = engine.module
        state = TrainState.create(
            apply_fn=model.apply,
            params=engine.variables["params"],
            batch_stats=engine.variables.get("batch_stats"),
            tx=optax.adamw(1e-3),
        )
        step = make_train_step(model, remat=args.remat)

        for batch in args.batches:
            images = jnp.asarray(
                rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32))
            labels = jnp.asarray(
                rng.integers(0, 15, (batch, h, w), np.int32))
            key = jax.random.PRNGKey(0)

            def prog(carry, n):
                def body(c, _):
                    st, img = c
                    st2, loss = step(st, img, labels, key)
                    img2 = img + (loss * 1e-6).astype(img.dtype)
                    return (st2, img2), None
                out, _ = jax.lax.scan(body, carry, None, length=n)
                return out

            ts = []
            ok = True
            for n in args.iters:
                f = jax.jit(lambda c, n=n: prog(c, n))
                try:
                    jax.block_until_ready(f((state, images)))
                except Exception as e:   # OOM at this batch: report, move on
                    print(f"{name:13s} batch {batch:3d}: failed ({e})"
                          [:120])
                    ok = False
                    break
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(f((state, images)))
                    best = min(best, time.perf_counter() - t0)
                ts.append(best)
            if not ok:
                continue
            dt = ts[1] - ts[0]
            if dt <= 0:
                print(f"{name:13s} batch {batch:3d}: slope non-positive "
                      f"(noise); rerun")
                continue
            ms = dt / (args.iters[1] - args.iters[0]) * 1e3
            print(f"{name:13s} batch {batch:3d} @ {w}x{h}: "
                  f"{ms:8.2f} ms/step  {batch / ms * 1e3:7.1f} img/s")


if __name__ == "__main__":
    main()
