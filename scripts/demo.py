#!/usr/bin/env python3
"""Visual demo: synthetic road scene → segmentation → occupancy grid.

Renders a side-by-side PNG (camera frame | drivability map | BEV
occupancy grid) using the trained demo checkpoint, so the whole
camera→grid story is visible in one image.

  python scripts/demo.py [--checkpoint checkpoints/enet_synthetic.msgpack]
      [--seed 4] [--out demo.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint",
                   default="checkpoints/enet_synthetic.msgpack")
    p.add_argument("--seed", type=int, default=4)
    p.add_argument("--out", default="demo.png")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from bugcar_image_segmentation_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bugcar_image_segmentation_tpu import synthetic
    from bugcar_image_segmentation_tpu.configs import GridConfig
    from bugcar_image_segmentation_tpu.models.api import Engine
    from bugcar_image_segmentation_tpu.models.enet import ENet
    from bugcar_image_segmentation_tpu.pipeline import Pipeline
    from bugcar_image_segmentation_tpu.utils.checkpoint import load_variables
    from __graft_entry__ import _toy_calibration

    variables, cfg = load_variables(args.checkpoint)
    engine = Engine(ENet(num_classes=cfg.num_classes,
                         dtype=jnp.dtype(cfg.dtype)), cfg,
                    variables=variables)
    cal = _toy_calibration((cfg.input_height, cfg.input_width))
    pipe = Pipeline(engine, cal, GridConfig(8.0, 8.0, 0.1))

    frame, _ = synthetic.road_scene(
        np.random.default_rng(args.seed),
        (cfg.input_height, cfg.input_width))
    grid_arr, seg = pipe.segment_and_grid(frame)
    seg = np.asarray(seg)
    grid = np.asarray(grid_arr)

    # colorize: drivability (green road / yellow flat / red obstacle)
    seg_vis = np.zeros(seg.shape + (3,), np.uint8)
    seg_vis[seg == 1] = (80, 200, 80)
    seg_vis[seg == 0] = (60, 200, 230)
    seg_vis[seg == 2] = (60, 60, 220)
    # grid: unknown gray / free white / occupied black, upscaled
    g = np.full(grid.shape + (3,), 128, np.uint8)
    g[grid == 0] = 255
    g[grid == 100] = 0
    h = frame.shape[0]
    g = cv2.resize(g, (h, h), interpolation=cv2.INTER_NEAREST)

    canvas = np.zeros((h, frame.shape[1] + seg_vis.shape[1] + h + 20, 3),
                      np.uint8)
    canvas[:, :frame.shape[1]] = frame
    x = frame.shape[1] + 10
    canvas[:, x:x + seg_vis.shape[1]] = seg_vis
    x += seg_vis.shape[1] + 10
    canvas[:, x:x + h] = g
    cv2.imwrite(args.out, canvas)
    occ = {int(v): int((grid == v).sum()) for v in np.unique(grid)}
    print(f"wrote {args.out}; grid cells {occ}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
