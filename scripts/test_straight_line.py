#!/usr/bin/env python3
"""Visual BEV-matrix sanity check.

Rebuilds the reference's missing ``test_straight_line.py`` (reference
README.md:13: "see for yourself if the bev_matrix is functioning as
intended").  Renders a family of straight lines in camera space, warps
them through the calibrated homography, and writes a side-by-side PNG —
straight lines on the ground plane must stay straight in BEV, and lines
parallel on the ground must become parallel.

  python scripts/test_straight_line.py --calib calib.json --out check.png
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from bugcar_image_segmentation_tpu.calibration import BEVTransform
from bugcar_image_segmentation_tpu.geometry import apply_homography


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--calib", required=True)
    p.add_argument("--out", default="straight_line_check.png")
    p.add_argument("--n-lines", type=int, default=7)
    args = p.parse_args()

    import cv2

    bev = BEVTransform.from_json(args.calib)
    in_w, in_h = bev.input_shape
    out_w, out_h = bev.output_shape

    cam = np.zeros((in_h, in_w, 3), np.uint8)
    # Converging "lane" lines toward a vanishing point + horizontal rungs.
    vp = (in_w // 2, int(in_h * 0.35))
    max_straightness_err = 0.0
    for i in range(args.n_lines):
        x_bot = int(in_w * i / (args.n_lines - 1))
        cv2.line(cam, (x_bot, in_h - 1), vp, (0, 255, 0), 2)
        # straightness check: warp 3 collinear points, measure deviation
        pts = np.array([[x_bot, in_h - 1],
                        [(x_bot + vp[0]) / 2, (in_h - 1 + vp[1]) / 2],
                        vp], dtype=np.float64)
        w = apply_homography(bev.matrix, pts)
        d = np.abs(np.cross(w[2] - w[0], w[1] - w[0])
                   / max(np.linalg.norm(w[2] - w[0]), 1e-9))
        max_straightness_err = max(max_straightness_err, float(d))
    for j in range(1, 5):
        y = int(in_h * (0.45 + 0.13 * j))
        cv2.line(cam, (0, y), (in_w - 1, y), (255, 128, 0), 2)

    warped = cv2.warpPerspective(cam, bev.matrix, (out_w, out_h))
    canvas_h = max(in_h, out_h)
    canvas = np.zeros((canvas_h, in_w + out_w, 3), np.uint8)
    canvas[:in_h, :in_w] = cam
    canvas[:out_h, in_w:] = warped
    cv2.putText(canvas, "camera", (8, 24), cv2.FONT_HERSHEY_SIMPLEX,
                0.7, (255, 255, 255), 1)
    cv2.putText(canvas, "BEV", (in_w + 8, 24), cv2.FONT_HERSHEY_SIMPLEX,
                0.7, (255, 255, 255), 1)
    cv2.imwrite(args.out, canvas)
    print(f"wrote {args.out}; max straightness deviation "
          f"{max_straightness_err:.3e} px (0 = perfectly straight)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
