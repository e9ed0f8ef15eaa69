#!/usr/bin/env python3
"""Train / fine-tune a segmentation backbone on TPU.

The missing direction in the reference (it ships only frozen graphs; its
one train→deploy tool is ``freeze_session``, reference utils.py:49-83).
Data parallelism across chips comes from mesh shardings alone — pass
--devices N on a multi-chip host; add --spatial K to also shard each
image's rows over K chips (per-chip activation memory 1/K, for
resolutions that spill on a single chip).

  python scripts/train.py --model enet --images data/imgs --labels data/lbls \\
      --steps 1000 --batch 16 --lr 3e-4 --out ckpt.msgpack

Labels: PNGs of backbone class ids, paired to images by sorted filename.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="enet",
                   choices=["enet", "deeplab", "unet", "segformer"])
    p.add_argument("--images", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--num-classes", type=int, default=15)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--schedule", choices=["constant", "cosine"],
                   default="constant",
                   help="LR schedule (cosine = linear warmup + cosine decay "
                        "to 0 over --steps)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--augment", action="store_true",
                   help="on-device augmentation: flip / zoom / color jitter "
                        "(training/augment.py)")
    p.add_argument("--devices", type=int, default=None,
                   help="mesh size for data parallelism (default: all)")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard each image's ROWS over this many chips "
                        "(spatial partitioning, parallel/spatial.py): "
                        "per-chip activation memory scales as 1/N, for "
                        "resolutions that spill on one chip; the mesh "
                        "becomes (devices/N) data x N space")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--out", required=True, help="msgpack checkpoint path")
    p.add_argument("--resume", help="msgpack checkpoint to start from")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import optax
    from bugcar_image_segmentation_tpu.configs import ModelConfig
    from bugcar_image_segmentation_tpu.models import preprocess as pre
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.parallel import (make_mesh, replicate,
                                                        shard_batch)
    from bugcar_image_segmentation_tpu.training import (create_train_state,
                                                        make_train_step)
    from bugcar_image_segmentation_tpu.utils import get_logger
    from bugcar_image_segmentation_tpu.utils.checkpoint import (
        load_variables, save_variables)

    log = get_logger("train")
    cfg = ModelConfig(name=args.model, input_width=args.width,
                      input_height=args.height,
                      num_classes=args.num_classes, dtype="bfloat16")
    engine = build_engine(args.model, cfg)
    model = engine.module

    img_files = sorted(os.listdir(args.images))
    lbl_files = sorted(os.listdir(args.labels))
    assert len(img_files) == len(lbl_files) > 0, "dataset empty/mismatched"

    def load_pair(i):
        frame = cv2.imread(os.path.join(args.images, img_files[i]))
        label = cv2.imread(os.path.join(args.labels, lbl_files[i]),
                           cv2.IMREAD_GRAYSCALE)
        label = cv2.resize(label, (args.width, args.height),
                           interpolation=cv2.INTER_NEAREST)
        return frame, label

    rng = np.random.default_rng(0)

    def batches():
        while True:
            idx = rng.integers(0, len(img_files), size=args.batch)
            pairs = [load_pair(i) for i in idx]
            frames = np.stack([p[0] for p in pairs])
            labels = np.stack([p[1] for p in pairs]).astype(np.int32)
            yield frames, labels

    n_dev = args.devices if args.devices else len(jax.devices())
    if args.spatial > 1:
        if n_dev % args.spatial:
            p.error(f"--spatial {args.spatial} does not divide the "
                    f"{n_dev}-device mesh")
        if args.height % args.spatial:
            p.error(f"--spatial {args.spatial} does not divide the image "
                    f"height {args.height}")
        from bugcar_image_segmentation_tpu.parallel import shard_batch_spatial
        mesh = make_mesh(n_dev, axes=("data", "space"),
                         shape=(n_dev // args.spatial, args.spatial))
        place_batch = lambda b: shard_batch_spatial(b, mesh)  # noqa: E731
    else:
        mesh = make_mesh(args.devices)
        place_batch = lambda b: shard_batch(b, mesh)  # noqa: E731
    log.info("mesh: %s over %d devices", dict(mesh.shape),
             mesh.devices.size)

    if args.schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(args.warmup_steps, 1), args.steps)
    else:
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, args.lr,
                                   max(args.warmup_steps, 1)),
             optax.constant_schedule(args.lr)],
            [max(args.warmup_steps, 1)]) if args.warmup_steps else args.lr
    state = create_train_state(
        model, (1, args.height, args.width, 3),
        optimizer=optax.adamw(lr))
    if args.resume:
        variables, _ = load_variables(args.resume)
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats"))
    state = replicate(state, mesh)
    # Donate the carried state: params + AdamW moments update in place
    # instead of allocating a second copy of every buffer each step
    # (halves the optimizer-state HBM high-water mark; the loop never
    # reuses the old state).
    train_step = jax.jit(make_train_step(model), donate_argnums=(0,))

    if args.augment:
        from bugcar_image_segmentation_tpu.training.augment import (
            AugmentConfig, augment_batch)
        acfg = AugmentConfig(ignore_label=255)

        @jax.jit
        def preprocess(frames, labels, akey):
            # resize + BGR→RGB + /256 to [0,1] float, augment there
            # (photometric knobs assume [0,1]), then normalize.
            x = pre.preprocess_frame(
                frames, (args.height, args.width),
                mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                dtype=jnp.float32)
            x, labels = augment_batch(akey, x, labels, acfg)
            x = (x - jnp.asarray(cfg.image_mean, jnp.float32)) \
                / jnp.asarray(cfg.image_std, jnp.float32)
            return x.astype(jnp.dtype(cfg.dtype)), labels
    else:
        @jax.jit
        def preprocess(frames, labels, akey):
            del akey
            return pre.preprocess_for_config(frames, cfg), labels

    # Disjoint root keys per consumer: folding ONE key by step for both
    # would make step t's dropout key collide with some step's
    # augmentation key (fold_in(k, i) is the same function either way).
    aug_key, step_key = jax.random.split(jax.random.PRNGKey(0))
    for step, (frames, labels) in enumerate(batches()):
        if step >= args.steps:
            break
        images, labels = preprocess(jnp.asarray(frames),
                                    jnp.asarray(labels),
                                    jax.random.fold_in(aug_key, step))
        images, labels = place_batch((images, labels))
        state, loss = train_step(state, images, labels,
                                 jax.random.fold_in(step_key, step))
        if step % args.log_every == 0:
            log.info("step %d loss %.4f", step, float(loss))

    variables = {"params": jax.device_get(state.params)}
    if state.batch_stats is not None:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    save_variables(args.out, variables, cfg)
    log.info("saved %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
