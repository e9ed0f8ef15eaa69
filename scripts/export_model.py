#!/usr/bin/env python3
"""Freeze an engine or a full frame→grid pipeline into an AOT artifact.

The TPU-native counterpart of the reference's frozen-graph export flow
(reference utils.py:49-83 ``freeze_session``, which produced the shipped
``pretrained_models/*.pb``): weights baked in as constants, serialized
StableHLO (jax.export), loadable with only jax installed — see deploy.py.

  # freeze a model endpoint (symbolic batch dim by default)
  python scripts/export_model.py --model enet --out enet.bcseg \\
      [--checkpoint ckpt.msgpack] [--fn predict|predict_binary|logits] \\
      [--batch N] [--platforms tpu,cpu]

  # freeze the fused frame→grid pipeline for one calibration
  python scripts/export_model.py --model enet --out pipe.bcseg \\
      --calibration cal.json [--mode multiclass|binary] \\
      [--interpolation cv2_linear|native]

  # inspect / smoke-run an artifact
  python scripts/export_model.py --load pipe.bcseg [--smoke]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="enet")
    p.add_argument("--checkpoint")
    p.add_argument("--out")
    p.add_argument("--fn", default="predict",
                   choices=["predict", "predict_binary", "logits"])
    p.add_argument("--batch", type=int, default=None,
                   help="static batch size (default: symbolic)")
    p.add_argument("--platforms",
                   help="comma-separated lowering platforms, e.g. tpu,cpu "
                        "(default: this process's backend)")
    p.add_argument("--calibration",
                   help="calibration JSON — exports the fused frame→grid "
                        "pipeline instead of a bare engine endpoint")
    p.add_argument("--mode", default="multiclass",
                   choices=["multiclass", "binary"])
    p.add_argument("--interpolation", default="cv2_linear")
    p.add_argument("--grid-size", type=float, nargs=2, default=(20.0, 20.0),
                   metavar=("W_M", "H_M"))
    p.add_argument("--cell", type=float, default=0.1)
    p.add_argument("--spatial", type=int, default=1,
                   help="export a SPATIALLY PARTITIONED program for this "
                        "many chips: one frame's rows sharded, halo "
                        "exchanges baked into the StableHLO "
                        "(parallel/spatial.py); run it on an equal-sized "
                        "mesh via Deployed.call_sharded")
    p.add_argument("--load", help="inspect an existing artifact and exit")
    p.add_argument("--smoke", action="store_true",
                   help="with --load: run one zero frame through it")
    args = p.parse_args()

    from bugcar_image_segmentation_tpu import deploy

    if args.load:
        dep = deploy.load_artifact(args.load)
        print(json.dumps(dep.meta, indent=2))
        if args.smoke:
            import numpy as np
            shapes = [a.shape for a in dep.exported.in_avals]
            xs = [np.zeros([d if isinstance(d, int) else 1 for d in s],
                           np.uint8) for s in shapes]
            if dep.nr_devices > 1:
                from bugcar_image_segmentation_tpu.parallel import make_mesh
                out = dep.call_sharded(make_mesh(dep.nr_devices), *xs)
            else:
                out = dep(*xs)
            out = out if isinstance(out, tuple) else (out,)
            print("smoke outputs:",
                  [(tuple(o.shape), str(o.dtype)) for o in out])
        return 0

    if not args.out:
        p.error("--out is required when exporting")

    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.utils.checkpoint import load_variables

    variables, cfg = None, None
    if args.checkpoint:
        # Keep the checkpoint's own ModelConfig: a checkpoint trained at
        # a non-default resolution must freeze at THAT resolution, not
        # the model name's default (ENet is fully convolutional, so the
        # mismatch would export "successfully" and deploy wrong).
        variables, cfg = load_variables(args.checkpoint)
    engine = build_engine(args.model, cfg=cfg, variables=variables)
    if args.spatial > 1:
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)
        shard_engine_spatial(
            engine, make_mesh(args.spatial, axes=("space",)))
    platforms = args.platforms.split(",") if args.platforms else None

    if args.calibration:
        from bugcar_image_segmentation_tpu.configs import (CalibrationConfig,
                                                           GridConfig)
        from bugcar_image_segmentation_tpu.pipeline import Pipeline
        cal = CalibrationConfig.load_json(args.calibration)
        grid_cfg = GridConfig(width_m=args.grid_size[0],
                              height_m=args.grid_size[1], cell_m=args.cell)
        pipe = Pipeline(engine, cal, grid_cfg, mode=args.mode,
                        interpolation=args.interpolation)
        deploy.export_pipeline_to(args.out, pipe, platforms=platforms)
    else:
        deploy.export_engine_to(args.out, engine, fn=args.fn,
                                batch=args.batch, platforms=platforms)
    dep = deploy.load_artifact(args.out)
    print(json.dumps(dep.meta, indent=2))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
