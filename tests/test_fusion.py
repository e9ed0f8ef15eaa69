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
