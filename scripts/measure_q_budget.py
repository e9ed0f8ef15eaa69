#!/usr/bin/env python3
"""Measure the quarter-head (``_q``) semantic budget with TRAINED weights.

The ``_q`` engines skip the f32 ×4 logits upsample and argmax at the
decode head's native 1/4 resolution (models/segformer.py
``head_upsample``; models/api.py lifts the uint8 labels) — the
recommended serving configs' speed (PERF.md rounds 3c/3d) rests on the
assumption that the semantic delta vs the full head is small.  Random
-weight probes were measured unreliable in both directions (PERF.md
round 3c caveat); this script produces the real number: for each
committed trained checkpoint with a quarter-capable head, the label
disagreement (full vs ``_q`` predict) and the occupancy-grid cell delta
(full pipeline vs ``_q`` pipeline, default and native-grid modes) over
the deterministic synthetic driving sequence — the same sequence the
recorded-video regression pins (scripts/make_video_fixture.py).

tests/test_q_budget.py asserts the budgets this measured; rerun after
retraining a checkpoint:

    python scripts/measure_q_budget.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_FRAMES = 8
SEED = 11
MODELS = ("deeplab", "segformer_b0", "deeplab_xception")


def measure(name: str, force_cpu: bool = False,
            num_frames: int = NUM_FRAMES) -> dict:
    """Full-vs-quarter deltas for one checkpointed backbone."""
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _toy_calibration
    from bugcar_image_segmentation_tpu import synthetic
    from bugcar_image_segmentation_tpu.configs import GridConfig
    from bugcar_image_segmentation_tpu.models.api import build_engine
    from bugcar_image_segmentation_tpu.pipeline import Pipeline
    from bugcar_image_segmentation_tpu.utils.checkpoint import load_variables

    ckpt = os.path.join(REPO, "checkpoints", f"{name}_synthetic.msgpack")
    variables, cfg = load_variables(ckpt)
    full = build_engine(name, cfg, variables=variables)
    quarter = build_engine(f"{name}_q", cfg, variables=variables)

    cal = _toy_calibration((cfg.input_height, cfg.input_width))
    grid_cfg = GridConfig(8.0, 8.0, 0.1)
    pipe_full = Pipeline(full, cal, grid_cfg)
    pipe_q = Pipeline(quarter, cal, grid_cfg)
    # The shipping config (PERF.md round 3d): quarter head + native
    # cell-resolution grid tapping the QUARTER label map directly.
    pipe_qn = Pipeline(quarter, cal, grid_cfg, interpolation="native")
    pipe_fn = Pipeline(full, cal, grid_cfg, interpolation="native")

    seg_d, grid_d, grid_nd = [], [], []
    for frame, _, _motion in synthetic.video(
            seed=SEED, num_frames=num_frames,
            shape=(cfg.input_height, cfg.input_width)):
        s_full = np.asarray(full.predict(frame))
        s_q = np.asarray(quarter.predict(frame))
        seg_d.append(float((s_full != s_q).mean()))
        g_full = np.asarray(pipe_full(frame))
        g_q = np.asarray(pipe_q(frame))
        grid_d.append(float((g_full != g_q).mean()))
        g_fn = np.asarray(pipe_fn(frame))
        g_qn = np.asarray(pipe_qn(frame))
        grid_nd.append(float((g_fn != g_qn).mean()))

    return {
        "model": name,
        "frames": num_frames,
        "seg_disagreement_mean": float(np.mean(seg_d)),
        "seg_disagreement_max": float(np.max(seg_d)),
        "grid_delta_mean": float(np.mean(grid_d)),
        "grid_delta_max": float(np.max(grid_d)),
        "grid_native_delta_mean": float(np.mean(grid_nd)),
        "grid_native_delta_max": float(np.max(grid_nd)),
    }


def main() -> None:
    for name in MODELS:
        r = measure(name, force_cpu="--cpu" in sys.argv)
        print(json.dumps(r))
        print(f"[{name}] seg full-vs-q: mean {r['seg_disagreement_mean']:.3%}"
              f" max {r['seg_disagreement_max']:.3%} | grid: mean "
              f"{r['grid_delta_mean']:.3%} max {r['grid_delta_max']:.3%} | "
              f"native grid: mean {r['grid_native_delta_mean']:.3%} max "
              f"{r['grid_native_delta_max']:.3%}", file=sys.stderr)


if __name__ == "__main__":
    main()
