"""Temporal grid fusion: evidence semantics, safety, backend parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bugcar_image_segmentation_tpu.fusion import (FusionState,
                                                  TemporalGridFusion,
                                                  fuse_step)


def g(values):
    return jnp.asarray(np.asarray(values, np.int8))


class TestFuseStep:
    def test_unknown_everywhere_until_observed(self):
        state = FusionState.create((2, 2))
        state, fused = fuse_step(state, g([[-1, -1], [-1, 0]]))
        out = np.asarray(fused)
        assert out[0, 0] == -1 and out[0, 1] == -1 and out[1, 0] == -1
        assert out[1, 1] == 0

    def test_single_glitch_does_not_mark_occupied(self):
        """Default thresholds: one spurious occupied frame renders
        unknown, not occupied (the flicker the filter exists to stop)."""
        state = FusionState.create((1, 1))
        state, fused = fuse_step(state, g([[100]]))
        assert int(fused[0, 0]) == -1
        # a second consistent observation crosses the threshold
        state, fused = fuse_step(state, g([[100]]))
        assert int(fused[0, 0]) == 100

    def test_free_requires_evidence_not_mere_decay(self):
        """SAFETY: cells that leave the FOV must never drift to 'free' —
        odds decaying toward 0 renders unknown until fresh evidence."""
        state = FusionState.create((1, 1))
        for _ in range(6):                       # solid obstacle
            state, fused = fuse_step(state, g([[100]]))
        assert int(fused[0, 0]) == 100
        # camera pans away: belief decays through occupied → unknown,
        # NEVER through free
        seen_states = []
        for _ in range(60):
            state, fused = fuse_step(state, g([[-1]]))
            seen_states.append(int(fused[0, 0]))
        assert 0 not in seen_states
        assert seen_states[-1] == -1             # eventually stale/unknown
        assert seen_states[0] == 100             # short memory holds

    def test_consistent_free_flips_occupied(self):
        state = FusionState.create((1, 1))
        for _ in range(6):
            state, fused = fuse_step(state, g([[100]]))
        for _ in range(10):
            state, fused = fuse_step(state, g([[0]]))
        assert int(fused[0, 0]) == 0

    def test_scan_composability(self):
        """fuse_step threads through lax.scan (online filtering shape)."""
        frames = jnp.stack([g([[100, 0]]), g([[100, -1]]), g([[0, 0]])])

        def body(state, frame):
            return fuse_step(state, frame)

        state, fused_seq = jax.lax.scan(body, FusionState.create((1, 2)),
                                        frames)
        assert fused_seq.shape == (3, 1, 2)
        assert int(fused_seq[1, 0, 0]) == 100


class TestBackends:
    @pytest.mark.parametrize("frames", [
        [[[100]], [[100]], [[0]], [[-1]], [[0]], [[0]]],
        [[[0]], [[-1]], [[100]], [[100]], [[100]], [[-1]]],
    ])
    def test_numpy_matches_jax(self, frames):
        fj = TemporalGridFusion((1, 1), backend="jax")
        fn = TemporalGridFusion((1, 1), backend="numpy")
        for frame in frames:
            a = np.asarray(fj.update(g(frame)))
            b = np.asarray(fn.update(np.asarray(frame, np.int8)))
            np.testing.assert_array_equal(a, b)

    def test_reset(self):
        f = TemporalGridFusion((1, 1))
        f.update(np.asarray([[100]], np.int8))
        f.update(np.asarray([[100]], np.int8))
        f.reset()
        out = f.update(np.asarray([[100]], np.int8))
        assert int(out[0, 0]) == -1   # back below threshold after reset

    def test_unknown_backend_raises(self):
        with pytest.raises(ValueError, match="backend"):
            TemporalGridFusion((1, 1), backend="torch")


class TestEgoMotionCompensation:
    def test_translate_moves_evidence_and_invalidates_edges(self):
        from bugcar_image_segmentation_tpu.fusion import translate_state
        state = FusionState.create((4, 4))
        state = FusionState(odds=state.odds.at[1, 1].set(3.0),
                            observed=state.observed.at[1, 1].set(True))
        moved = translate_state(state, 2, 1)
        assert float(moved.odds[3, 2]) == 3.0
        assert bool(moved.observed[3, 2])
        # rows shifted in from outside are unobserved with zero odds
        assert not np.asarray(moved.observed[:2]).any()
        assert float(np.abs(np.asarray(moved.odds[:2])).max()) == 0.0

    def test_update_with_motion_keeps_world_alignment(self):
        """An obstacle at a fixed WORLD location stays fused while the
        robot advances one cell per frame.  The grid is vehicle-anchored
        with the robot at the BOTTOM, so forward motion brings a fixed
        obstacle DOWN the grid; compensation shifts old evidence down to
        match."""
        fusion = TemporalGridFusion((8, 4), decay=0.95, cell_m=0.1)
        for i in range(4):
            row = 2 + i   # obstacle one row closer (lower) each frame
            g = np.zeros((8, 4), np.int8)
            g[row, 2] = 100
            out = fusion.update(g, motion_m=(0.1, 0.0))
        # evidence accumulated at the obstacle's current row: occupied
        assert out[2 + 3, 2] == 100
        # without compensation the 4 single observations would each stay
        # below the occupied threshold (1 < 1.5)
        plain = TemporalGridFusion((8, 4), decay=0.95, cell_m=0.1)
        for i in range(4):
            g = np.zeros((8, 4), np.int8)
            g[2 + i, 2] = 100
            out_plain = plain.update(g)
        assert out_plain[2 + 3, 2] != 100

    def test_fractional_motion_accumulates(self):
        fusion = TemporalGridFusion((4, 4), cell_m=0.1)
        state0 = fusion._odds.copy()
        # 0.04 m per frame: shifts only after cumulative >= one 0.1 m cell
        fusion._odds[0, 0] = 2.0
        fusion.update(np.full((4, 4), -1, np.int8), motion_m=(0.04, 0.0))
        assert fusion._odds[0, 0] != 0.0 or state0[0, 0] == 2.0
        fusion.update(np.full((4, 4), -1, np.int8), motion_m=(0.04, 0.0))
        fusion.update(np.full((4, 4), -1, np.int8), motion_m=(0.04, 0.0))
        # 0.12 m total -> exactly one cell shift happened
        assert abs(fusion._residual[0] - 0.2) < 1e-9

    def test_jax_backend_motion_matches_numpy(self):
        fj = TemporalGridFusion((6, 6), backend="jax", cell_m=0.1)
        fn = TemporalGridFusion((6, 6), backend="numpy", cell_m=0.1)
        rng = np.random.default_rng(0)
        for _ in range(5):
            g = rng.choice(np.array([-1, 0, 100], np.int8), size=(6, 6))
            m = (float(rng.uniform(0, 0.25)), float(rng.uniform(-0.1, 0.1)))
            a = np.asarray(fj.update(g, motion_m=m))
            b = np.asarray(fn.update(g, motion_m=m))
            np.testing.assert_array_equal(a, b)
