#!/usr/bin/env python3
"""Regenerate the recorded-video regression fixture.

Runs the shipped demo checkpoint over the deterministic synthetic driving
sequence (synthetic.video) through the fused frame→grid pipeline plus
ego-motion-compensated temporal fusion, and stores the resulting grids in
``tests/fixtures/video_regression.npz``.  tests/test_video_regression.py
replays the same sequence and compares against this file — a whole-stack
regression net over preprocess→ENet→argmax/remap→warp→grid→fusion
(the reference's inference_video.py hot loop, SURVEY.md §3.1, which had
no recorded-output regression at all).

Run from the repo root after any *intentional* output-changing change:

    python scripts/make_video_fixture.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = 11
NUM_FRAMES = 8
FIXTURE = os.path.join(REPO, "tests", "fixtures", "video_regression.npz")


def generate():
    import jax

    # CPU for cross-run determinism (the TPU tier has its own budgets).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _toy_calibration
    from bugcar_image_segmentation_tpu import synthetic
    from bugcar_image_segmentation_tpu.configs import GridConfig
    from bugcar_image_segmentation_tpu.fusion import TemporalGridFusion
    from bugcar_image_segmentation_tpu.models.api import Engine
    from bugcar_image_segmentation_tpu.models.enet import ENet
    from bugcar_image_segmentation_tpu.pipeline import Pipeline
    from bugcar_image_segmentation_tpu.utils.checkpoint import load_variables

    ckpt = os.path.join(REPO, "checkpoints", "enet_synthetic.msgpack")
    variables, cfg = load_variables(ckpt)
    engine = Engine(ENet(num_classes=cfg.num_classes,
                         dtype=jnp.dtype(cfg.dtype)), cfg,
                    variables=variables)
    cal = _toy_calibration((cfg.input_height, cfg.input_width))
    grid_cfg = GridConfig(8.0, 8.0, 0.1)
    pipe = Pipeline(engine, cal, grid_cfg)

    grids, segs = [], []
    fusion = TemporalGridFusion((grid_cfg.cells_h, grid_cfg.cells_w),
                                cell_m=grid_cfg.cell_m)
    fused = None
    for frame, _, (fwd, left, _yaw) in synthetic.video(
            seed=SEED, num_frames=NUM_FRAMES,
            shape=(cfg.input_height, cfg.input_width)):
        grid, seg = pipe.segment_and_grid(frame)
        grid = np.asarray(grid)
        grids.append(grid)
        segs.append(np.asarray(seg))
        fused = fusion.update(grid, motion_m=(fwd, left))

    return (np.stack(grids).astype(np.int8),
            np.stack(segs).astype(np.uint8),
            np.asarray(fused).astype(np.int8))


def main():
    grids, segs, fused = generate()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, seed=SEED, num_frames=NUM_FRAMES,
                        grids=grids, segs=segs, fused=fused)
    occ = (grids == 100).mean()
    print(f"wrote {FIXTURE}: grids {grids.shape}, "
          f"occupied fraction {occ:.3f}")


if __name__ == "__main__":
    main()
