#!/usr/bin/env python3
"""Train a backbone on procedural road scenes and save a demo checkpoint.

Produces ``checkpoints/<model>_synthetic.msgpack`` — real learned weights
so demos/evals exercise meaningful drivability maps instead of random
ones (the reference's weights never shipped: .MISSING_LARGE_BLOBS).
Works for every backbone in the zoo (--model), proving the training
direction end to end: synthetic data -> AdamW steps on chip ->
msgpack checkpoint -> Engine eval (3-class drivability IoU).

  python scripts/make_demo_checkpoint.py [--model enet] [--steps 600]
      [--batch 8] [--width 512 --height 256] [--out auto]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="enet",
                   help="any build_engine name: enet, deeplab, "
                        "deeplab_xception, unet, segformer_b0, ...")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--out", default="auto",
                   help="msgpack path; 'auto' = checkpoints/<model>_synthetic.msgpack")
    p.add_argument("--save-dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="checkpoint float dtype; bfloat16 halves the "
                        "artifact (used for the 110 MB Xception twin so "
                        "a reproducible checkpoint fits the repo — "
                        "serving-grade, not an optimizer-resume master; "
                        "see Engine.cache_weights numerics notes)")
    p.add_argument("--log-every", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bugcar_image_segmentation_tpu import synthetic
    from bugcar_image_segmentation_tpu.configs import ModelConfig
    from bugcar_image_segmentation_tpu.evaluation import evaluate_model
    from bugcar_image_segmentation_tpu.models import preprocess as pre
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.training import make_train_step
    from bugcar_image_segmentation_tpu.training.trainer import TrainState
    from bugcar_image_segmentation_tpu.utils import get_logger
    from bugcar_image_segmentation_tpu.utils.checkpoint import save_variables

    import optax

    log = get_logger("make_demo_checkpoint")
    shape = (args.height, args.width)
    if args.out == "auto":
        args.out = f"checkpoints/{args.model}_synthetic.msgpack"
    cfg = ModelConfig(name=args.model, input_width=args.width,
                      input_height=args.height, dtype="bfloat16")
    # build_engine JIT-compiles the init (eager flax init through the
    # tunnel costs one compile per param op — PERF.md round 3).
    engine = build_engine(args.model, cfg)
    model = engine.module
    state = TrainState.create(
        apply_fn=model.apply,
        params=engine.variables["params"],
        batch_stats=engine.variables.get("batch_stats"),
        tx=optax.adamw(args.lr),
    )
    train_step = jax.jit(make_train_step(model))
    preprocess = jax.jit(lambda f: pre.preprocess_for_config(f, cfg))

    def batch(i):
        rng = np.random.default_rng(i)
        pairs = [synthetic.road_scene(np.random.default_rng(i * 1000 + k),
                                      shape) for k in range(args.batch)]
        frames = np.stack([p[0] for p in pairs])
        labels = np.stack([p[1] for p in pairs]).astype(np.int32)
        del rng
        return frames, labels

    log.info("training %s %dx%d for %d steps on %s ...", args.model,
             args.width, args.height, args.steps, jax.default_backend())
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(args.steps):
        frames, labels = batch(i)
        images = preprocess(jnp.asarray(frames))
        state, loss = train_step(state, images, jnp.asarray(labels),
                                 jax.random.fold_in(key, i))
        if i % args.log_every == 0:
            log.info("step %d loss %.4f (%.1fs)", i, float(loss),
                     time.time() - t0)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    if args.save_dtype == "bfloat16":
        from bugcar_image_segmentation_tpu.models.api import _cast_float_tree
        variables = _cast_float_tree(variables, jnp.bfloat16)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_variables(args.out, variables, cfg)
    log.info("saved %s", args.out)

    # Validation: drivability IoU on held-out scenes.
    engine = build_engine(args.model, cfg, variables=variables)
    val = synthetic.dataset(seed=777, num=16, shape=shape)
    metrics = evaluate_model(engine, val)
    log.info("validation (3-class drivability): %s", metrics.summary())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
