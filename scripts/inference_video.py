#!/usr/bin/env python3
"""Streaming inference: camera/video → occupancy grids (→ ROS if present).

Rebuilds the reference's missing ``inference_video.py`` main loop
(reference README.md:16-20; call stack reconstructed in SURVEY.md §3.1)
on the fused TPU pipeline: capture thread → native frame ring →
one-XLA-program frame→grid → ROS-free message (published via rospy when
available).  Unlike the reference, the loop survives camera hiccups
(bounded retries in the source) and reports real FPS / drop counts.

  python scripts/inference_video.py --calib calib.json [--camera 0 |
      --video clip.mp4 | --synthetic N] [--model enet] [--clahe]
      [--contour-filter] [--display]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--camera", type=int)
    src.add_argument("--video", type=str)
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="N generated frames (benchmark/smoke mode)")
    p.add_argument("--calib", required=True)
    p.add_argument("--model", default="enet",
                   choices=["enet", "deeplab", "unet", "segformer"])
    p.add_argument("--checkpoint", help="msgpack variables from convert/")
    p.add_argument("--grid", default="8x8x0.1",
                   help="WIDTHxHEIGHTxCELL in meters")
    p.add_argument("--clahe", action="store_true",
                   help="CLAHE pre-enhancement")
    p.add_argument("--contour-filter", action="store_true",
                   help="footwell-connectivity road filtering")
    p.add_argument("--display", action="store_true")
    p.add_argument("--no-host-resize", action="store_true",
                   help="resize on device instead of before the transfer")
    p.add_argument("--temporal-fusion", action="store_true",
                   help="log-odds evidence accumulation across frames")
    p.add_argument("--fusion-decay", type=float, default=0.9)
    p.add_argument("--fusion-occupied-threshold", type=float, default=1.5)
    p.add_argument("--fusion-free-threshold", type=float, default=0.25)
    p.add_argument("--topic", default="/occupancy_grid")
    p.add_argument("--frame-id", default="base_link")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from bugcar_image_segmentation_tpu.calibration import BEVTransform
    from bugcar_image_segmentation_tpu.configs import GridConfig
    from bugcar_image_segmentation_tpu.io import (DropCounter, OpenCVSource,
                                                  StallWatchdog,
                                                  SyntheticSource,
                                                  ThreadedCapture)
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.msg import (GridPublisher,
                                                   to_occupancy_grid_msg)
    from bugcar_image_segmentation_tpu.fusion import TemporalGridFusion
    from bugcar_image_segmentation_tpu.pipeline import Pipeline
    from bugcar_image_segmentation_tpu.utils import FPSMeter, get_logger
    from bugcar_image_segmentation_tpu.utils.checkpoint import load_variables

    log = get_logger("inference_video")
    gw, gh, cell = (float(v) for v in args.grid.split("x"))

    variables = None
    if args.checkpoint:
        variables, _ = load_variables(args.checkpoint)
    engine = build_engine(args.model, variables=variables)
    bev = BEVTransform.from_json(args.calib)
    pipe = Pipeline(engine, bev.config, GridConfig(gw, gh, cell),
                    use_clahe=args.clahe, contour_filter=args.contour_filter,
                    host_resize=not args.no_host_resize)
    log.info("compiling fused pipeline ...")
    log.info("compiled in %.1fs", pipe.warmup((480, 640, 3)))

    if args.synthetic is not None:
        source = SyntheticSource((480, 640, 3), num_frames=args.synthetic)
    elif args.video is not None:
        source = OpenCVSource(args.video)
    else:
        source = OpenCVSource(args.camera)

    publisher = GridPublisher(args.topic)
    meter = FPSMeter()
    drops = DropCounter()
    watchdog = StallWatchdog(stall_after_s=2.0).start()
    # Live cameras: always process the freshest frame (older ones drop).
    # Offline sources (video file / synthetic): process every frame in
    # order with producer backpressure.
    live = args.camera is not None
    frame0 = next(iter(source))
    cap = ThreadedCapture(source, frame0.shape,
                          block_when_full=not live).start()
    cap.ring.push(frame0)

    frames = 0
    t_start = time.time()
    # Host-side (numpy) fusion: the grids are already host arrays here,
    # and a device round-trip per 80x80 elementwise update would cost more
    # than it computes on a remote TPU link.
    fusion = (TemporalGridFusion(
        (int(gh / cell), int(gw / cell)), decay=args.fusion_decay,
        occupied_threshold=args.fusion_occupied_threshold,
        free_threshold=args.fusion_free_threshold, backend="numpy")
        if args.temporal_fusion else None)

    def handle(grid: np.ndarray) -> bool:
        nonlocal frames
        if fusion is not None:
            grid = fusion.update(grid)
        msg = to_occupancy_grid_msg(grid, cell, gw, gh,
                                    time_stamp=time.time(),
                                    frame_id=args.frame_id)
        publisher.publish(msg)
        meter.tick()
        frames += 1
        if frames % 60 == 0:
            log.info("%d frames, %.1f fps, %d dropped",
                     frames, meter.fps, drops.dropped)
        if args.display:
            import cv2
            vis = ((grid.astype(np.int16) + 1) * 2).astype(np.uint8)
            cv2.imshow("occupancy", vis)
            return (cv2.waitKey(1) & 0xFF) != ord("q")
        return True

    if live:
        # Latency-first: freshest frame, blocking result each iteration.
        while True:
            item = cap.latest(timeout_ms=500)
            if item is None:
                break
            frame, dropped = item
            drops.record(dropped)
            watchdog.tick()
            # clahe / contour filtering run inside the fused program
            # (Pipeline flags above) — no host-side image passes.
            if not handle(np.asarray(pipe(jnp.asarray(frame)))):
                break
    else:
        # Throughput-first: every frame, deep async pipeline, chunked
        # result syncs (pipeline.stream).
        def frame_gen():
            while True:
                item = cap.next(timeout_ms=500)
                if item is None:
                    return
                watchdog.tick()
                yield item[0]

        for grid in pipe.stream(frame_gen(), depth=16, sync_chunk=16):
            if not handle(grid):
                break
    cap.stop()
    watchdog.stop()
    dt = time.time() - t_start
    log.info("done: %d frames in %.1fs (%.1f fps), %d dropped",
             frames, dt, frames / max(dt, 1e-9), drops.dropped)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
