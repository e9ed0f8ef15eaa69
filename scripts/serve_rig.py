#!/usr/bin/env python3
"""Multi-camera rig serving: N cameras → one stitched occupancy grid.

The missing multi-view deployment loop implied by the reference's
multi-camera calibration JSONs (reference bev.py:20-41 stores per-camera
homographies; SURVEY.md §3.3): each camera has its own calibration into
the shared vehicle BEV frame, frames run the backbone as ONE batch, the
per-camera grids max-merge on device (pipeline.MultiCameraPipeline,
BASELINE config 4), and the stitched grid publishes as a single
nav_msgs/OccupancyGrid.

  python scripts/serve_rig.py --calibs front.json left.json right.json \\
      [--cameras 0 1 2 | --synthetic N] [--model enet] [--checkpoint ck]
      [--temporal-fusion] [--grid 8x8x0.1]

Offline (--synthetic) runs every tick in lockstep; live cameras always
process the freshest frame from each ring (older frames drop, counted).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--calibs", nargs="+", required=True,
                   help="one calibration JSON per camera, same order as "
                        "--cameras")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--cameras", type=int, nargs="+",
                     help="cv2 device indices, one per calibration")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="N synthetic ticks (smoke/benchmark mode)")
    # enet_w16: the measured rig recommendation (docs/SERVING.md) — the
    # bf16 weight cache removes ~0.12 ms of per-dispatch convert+marshal
    # in the one-dispatch-per-rig streaming regime (PERF.md round 3f).
    p.add_argument("--model", default="enet_w16")
    p.add_argument("--checkpoint")
    p.add_argument("--grid", default="8x8x0.1",
                   help="WIDTHxHEIGHTxCELL in meters")
    p.add_argument("--interpolation", default="cv2_linear",
                   choices=["cv2_linear", "nearest", "native"])
    p.add_argument("--temporal-fusion", action="store_true")
    p.add_argument("--fusion-decay", type=float, default=0.9)
    p.add_argument("--topic", default="/occupancy_grid")
    p.add_argument("--frame-id", default="base_link")
    args = p.parse_args()

    from bugcar_image_segmentation_tpu.calibration import BEVTransform
    from bugcar_image_segmentation_tpu.configs import GridConfig
    from bugcar_image_segmentation_tpu.fusion import TemporalGridFusion
    from bugcar_image_segmentation_tpu.io import (DropCounter, OpenCVSource,
                                                  StallWatchdog,
                                                  SyntheticSource,
                                                  ThreadedCapture)
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.msg import (GridPublisher,
                                                   to_occupancy_grid_msg)
    from bugcar_image_segmentation_tpu.pipeline import MultiCameraPipeline
    from bugcar_image_segmentation_tpu.utils import FPSMeter, get_logger
    from bugcar_image_segmentation_tpu.utils.checkpoint import load_variables

    log = get_logger("serve_rig")
    if args.cameras and len(args.cameras) != len(args.calibs):
        p.error(f"{len(args.cameras)} cameras vs {len(args.calibs)} "
                f"calibrations")
    gw, gh, cell = (float(v) for v in args.grid.split("x"))

    variables, ckpt_cfg = None, None
    if args.checkpoint:
        variables, ckpt_cfg = load_variables(args.checkpoint)
    engine = build_engine(args.model, cfg=ckpt_cfg, variables=variables)
    cals = [BEVTransform.from_json(c).config for c in args.calibs]
    rig = MultiCameraPipeline(engine, cals, GridConfig(gw, gh, cell),
                              interpolation=args.interpolation)
    n_cam = len(cals)
    mh, mw = engine.cfg.input_height, engine.cfg.input_width

    def prep(frames):
        """Host-resize each camera frame to model res before the
        transfer (the rig ships n_cam frames per tick — link bytes
        matter even more than single-camera, PERF.md).  cv2 is only
        touched when a frame actually needs resizing, so the synthetic
        smoke mode (model-res frames) has no cv2 dependency."""
        out = np.empty((n_cam, mh, mw, 3), np.uint8)
        for i, f in enumerate(frames):
            if f.shape[:2] == (mh, mw):
                out[i] = f
            else:
                import cv2
                out[i] = cv2.resize(f, (mw, mh),
                                    interpolation=cv2.INTER_LINEAR)
        return out

    publisher = GridPublisher(args.topic)
    meter = FPSMeter()
    drops = DropCounter()
    watchdog = StallWatchdog(stall_after_s=2.0).start()
    fusion = (TemporalGridFusion((int(gh / cell), int(gw / cell)),
                                 decay=args.fusion_decay, backend="numpy")
              if args.temporal_fusion else None)

    ticks = 0
    t_start = time.time()

    def handle(grid: np.ndarray) -> None:
        nonlocal ticks
        if fusion is not None:
            grid = fusion.update(grid)
        publisher.publish(to_occupancy_grid_msg(
            grid, cell, gw, gh, time_stamp=time.time(),
            frame_id=args.frame_id))
        meter.tick()
        ticks += 1
        if ticks % 60 == 0:
            log.info("%d rig ticks, %.1f ticks/s, %d dropped frames",
                     ticks, meter.fps, drops.dropped)

    log.info("compiling fused %d-camera rig program ...", n_cam)
    t0 = time.time()
    np.asarray(rig(np.zeros((n_cam, mh, mw, 3), np.uint8)))
    log.info("compiled in %.1fs", time.time() - t0)

    if args.synthetic is not None:
        # Generate at model resolution: no host resize per tick (which
        # would pollute the measured ticks/s) and no cv2 dependency.
        sources = [SyntheticSource((mh, mw, 3), num_frames=args.synthetic,
                                   seed=k) for k in range(n_cam)]
        iters = [iter(s) for s in sources]
        try:
            while True:
                frames = [next(it) for it in iters]
                watchdog.tick()
                handle(np.asarray(rig(prep(frames))))
        except StopIteration:
            pass
    else:
        caps = []
        for cam in args.cameras:
            source = OpenCVSource(cam)
            f0 = next(iter(source))
            cap = ThreadedCapture(source, f0.shape,
                                  block_when_full=False).start()
            cap.ring.push(f0)
            caps.append(cap)
        try:
            while True:
                frames = []
                for cap in caps:
                    item = cap.latest(timeout_ms=500)
                    if item is None:
                        raise StopIteration
                    frames.append(item[0])
                    drops.record(item[1])
                watchdog.tick()
                handle(np.asarray(rig(prep(frames))))
        except (StopIteration, KeyboardInterrupt):
            pass
        finally:
            for cap in caps:
                cap.stop()
    watchdog.stop()
    dt = time.time() - t_start
    log.info("done: %d rig ticks in %.1fs (%.1f ticks/s, %d cameras), "
             "%d dropped frames", ticks, dt, ticks / max(dt, 1e-9),
             n_cam, drops.dropped)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
