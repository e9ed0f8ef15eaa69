#!/usr/bin/env python3
"""Accuracy / IoU evaluation of a segmentation backbone.

Rebuilds the reference's missing ``evaluate_model.py`` (reference
README.md:14; SURVEY.md §3.4): runs the engine over (frame, label) pairs
and reports drivability-class accuracy and IoU.

  python scripts/evaluate_model.py --model enet \\
      --images data/imgs --labels data/labels [--raw-classes]

Images and labels pair by sorted filename; labels are PNGs of backbone
class ids (note_label order) unless --raw-classes is given with 3-class
labels already.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="enet",
                   choices=["enet", "deeplab", "unet", "segformer"])
    p.add_argument("--checkpoint")
    p.add_argument("--images", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--raw-classes", action="store_true",
                   help="labels are already 3-class drivability maps")
    args = p.parse_args()

    import cv2
    from bugcar_image_segmentation_tpu.evaluation import evaluate_model
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.utils.checkpoint import load_variables

    variables = None
    if args.checkpoint:
        variables, _ = load_variables(args.checkpoint)
    engine = build_engine(args.model, variables=variables)

    img_files = sorted(os.listdir(args.images))
    lbl_files = sorted(os.listdir(args.labels))
    if len(img_files) != len(lbl_files):
        print(f"count mismatch: {len(img_files)} images vs "
              f"{len(lbl_files)} labels", file=sys.stderr)
        return 1

    def dataset():
        for fi, fl in zip(img_files, lbl_files):
            frame = cv2.imread(os.path.join(args.images, fi),
                               cv2.IMREAD_COLOR)
            label = cv2.imread(os.path.join(args.labels, fl),
                               cv2.IMREAD_GRAYSCALE)
            if frame is None or label is None:
                continue
            # predictions come out at model resolution; match labels to it
            label = cv2.resize(
                label, (engine.cfg.input_width, engine.cfg.input_height),
                interpolation=cv2.INTER_NEAREST)
            yield frame, label

    metrics = evaluate_model(engine, dataset(),
                             remap_labels=not args.raw_classes)
    print(json.dumps(metrics.summary(), indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
