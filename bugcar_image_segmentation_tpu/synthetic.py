"""Procedural road scenes with ground-truth labels.

The reference's training data and test set never shipped ("test set not
included", reference README.md:14), so nothing in this repo could
demonstrate *learned* behaviour end to end.  This generator renders
simple but perspective-consistent driving scenes — a road wedge toward a
vanishing point, dashed lane markings, pavement shoulders, vegetation,
sky, box obstacles — with pixel-perfect labels in the ENet class
vocabulary (reference note_label:1-15: 0 road, 1 lane marking,
2 pavement, 9 vegetation, 10 sky, 12 vehicle), enabling:

- training/fine-tuning runs that actually converge to meaningful masks
  (scripts/make_demo_checkpoint.py);
- accuracy/IoU evaluation with real ground truth (evaluation.py);
- demos whose occupancy grids show a drivable corridor, not noise.

Pure numpy, deterministic per seed.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

# Class ids (reference note_label order).
ROAD, LANE, PAVEMENT, VEGETATION, SKY, CAR = 0, 1, 2, 9, 10, 12

_COLORS = {  # BGR base colors per class, jittered per scene
    ROAD: (90, 90, 95),
    LANE: (200, 220, 230),
    PAVEMENT: (150, 150, 160),
    VEGETATION: (60, 130, 70),
    SKY: (230, 190, 150),
    CAR: (40, 40, 180),
}


def road_scene(rng: np.random.Generator,
               shape: Tuple[int, int] = (256, 512),
               noise: float = 12.0) -> Tuple[np.ndarray, np.ndarray]:
    """One (bgr uint8 frame, int32 label map) pair.

    Geometry: horizon at 35-50% height; road is a wedge from a vanishing
    point on the horizon to a random base span; pavement borders it;
    vegetation fills the rest of the ground; 0-3 box obstacles sit on the
    road; a dashed center lane line runs toward the vanishing point.
    """
    h, w = shape
    label = np.full((h, w), VEGETATION, np.int32)

    horizon = int(h * rng.uniform(0.35, 0.5))
    label[:horizon] = SKY

    vp_x = w * rng.uniform(0.35, 0.65)           # vanishing point
    half_base = w * rng.uniform(0.25, 0.45)
    center_base = w * rng.uniform(0.35, 0.65)

    ys = np.arange(h)[:, None].astype(np.float32)
    xs = np.arange(w)[None, :].astype(np.float32)
    t = np.clip((ys - horizon) / max(h - 1 - horizon, 1), 0.0, 1.0)
    center = vp_x + (center_base - vp_x) * t     # road centerline per row
    half = half_base * t                          # widens toward the camera

    ground = ys >= horizon
    road = ground & (np.abs(xs - center) <= half)
    pavement = ground & ~road & (np.abs(xs - center) <= half
                                 + w * 0.06 * t + 2.0)
    label[pavement] = PAVEMENT
    label[road] = ROAD

    # dashed center lane marking
    lane_half = np.maximum(1.0, half * 0.04)
    dash = ((ys.astype(int) // max(h // 16, 1)) % 2 == 0)
    lane = road & dash & (np.abs(xs - center) <= lane_half)
    label[lane] = LANE

    # obstacles on the road
    for _ in range(rng.integers(0, 4)):
        oy = rng.integers(horizon + (h - horizon) // 4, h - 4)
        t_o = (oy - horizon) / max(h - 1 - horizon, 1)
        ow = max(4, int(w * rng.uniform(0.04, 0.10) * t_o * 2))
        oh = max(4, int(ow * rng.uniform(0.6, 1.0)))
        ox = int(np.clip(center[oy, 0] + rng.uniform(-0.8, 0.8)
                         * half[oy, 0], ow, w - ow))
        label[max(0, oy - oh):oy, max(0, ox - ow // 2):ox + ow // 2] = CAR

    # render: per-class base color + per-scene tint + pixel noise
    frame = np.empty((h, w, 3), np.float32)
    tint = rng.uniform(-20, 20, size=3)
    for cls, color in _COLORS.items():
        mask = label == cls
        frame[mask] = np.asarray(color, np.float32) + tint
    frame += rng.normal(0.0, noise, size=frame.shape)
    # simple shading: darker toward the bottom corners
    shade = 1.0 - 0.15 * t * np.abs(xs - w / 2) / (w / 2)
    frame *= shade[..., None]
    return (np.clip(frame, 0, 255).astype(np.uint8), label)


def dataset(seed: int = 0,
            num: int = 100,
            shape: Tuple[int, int] = (256, 512),
            ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic stream of (frame, label) pairs."""
    for i in range(num):
        yield road_scene(np.random.default_rng(seed * 100003 + i), shape)


__all__ = ["road_scene", "dataset", "ROAD", "LANE", "PAVEMENT",
           "VEGETATION", "SKY", "CAR"]
